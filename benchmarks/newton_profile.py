"""Per-kernel timing of the Newton hot path on the real chip.

    /opt/venv/bin/python -m benchmarks.newton_profile [--chains 256]

Times each kernel as the per-iteration cost of a jitted lax.scan that
chains the kernel's output back into its input (so nothing is dead-code
eliminated and the per-call axon RPC latency — ~25 ms/dispatch through the
tunnel — is amortized away). Scans: the fused MALA step kernel (baseline),
the fused Newton step kernel over a TG scan, and the vgh obs pass (the
ASIS eval side) over a TG scan.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timed_scan(step, init, scan_len=128, reps=3):
    import jax

    @jax.jit
    def run(c0):
        return jax.lax.scan(
            lambda c, _: (step(c), None), c0, None, length=scan_len
        )[0]

    out = run(init)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init)
        _sync(out)
        ts.append((time.perf_counter() - t0) / scan_len)
    return float(np.median(ts)) * 1e6  # us/iter


def _sync(tree):
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.ravel()[0])  # host read: axon block_until_ready lies


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--tgs", default="8,16,24")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nestmc.models import synth_logistic
    from nestmc.ops.loglik import logistic_logp_grad_hess_padded
    from nestmc.ops.pallas.loglik_logistic import (
        logistic_logp_grad_hess_pallas,
        logistic_logp_grad_pallas,
    )
    from nestmc.ops.pallas.mala_accept import fused_mala_logistic_step
    from nestmc.ops.pallas.newton_accept import fused_newton_logistic_step

    C, G, n, p = args.chains, 1000, 50, 4
    data, _ = synth_logistic(jax.random.key(2000), G=G, n=n, p=p)
    key = jax.random.key(0)
    beta = 0.3 * jax.random.normal(jax.random.key(1), (C, G, p))
    mu = 0.2 * jax.random.normal(jax.random.key(2), (C, p))
    log_tau = -0.5 + jnp.zeros((C, p))
    ls = jnp.zeros((C, G))
    v, g, h = jax.jit(logistic_logp_grad_hess_padded)(
        beta, data.x, data.y, data.mask
    )
    jax.block_until_ready((v, g, h))

    def mala_step(carry):
        b, vv, gg, k = carry
        k, k2 = jax.random.split(k)
        nb, nv, ng, _ = fused_mala_logistic_step(
            k2, b, vv, gg, ls - 1.5, mu, log_tau,
            data.x, data.y, data.mask, dense=True,
        )
        return nb, nv, ng, k

    t = _timed_scan(mala_step, (beta, v, g, key))
    print(f"mala_accept kernel: {t:.1f} us/iter", flush=True)

    def grad_step(carry):
        b, s = carry
        lv, lg = logistic_logp_grad_pallas(
            b, data.x, data.y, data.mask, dense=True
        )
        return b + 1e-6 * lg, s + jnp.sum(lv)

    t = _timed_scan(grad_step, (beta, 0.0))
    print(f"logp_grad kernel:   {t:.1f} us/iter", flush=True)

    for tg in [int(t) for t in args.tgs.split(",")]:
        def newton_step(carry, tg=tg):
            b, vv, gg, hh, k = carry
            k, k2 = jax.random.split(k)
            nb, nv, ng, nh, _ = fused_newton_logistic_step(
                k2, b, vv, gg, hh, ls, mu, log_tau,
                data.x, data.y, data.mask, dense=True, tg=tg,
            )
            return nb, nv, ng, nh, k

        try:
            t = _timed_scan(newton_step, (beta, v, g, h, key))
            print(f"newton_accept TG={tg}: {t:.1f} us/iter", flush=True)
        except Exception as e:
            print(f"newton_accept TG={tg}: FAILED {type(e).__name__}",
                  flush=True)

    for tg in [int(t) for t in args.tgs.split(",")]:
        def vgh_step(carry, tg=tg):
            b, s = carry
            lv, lg, lh = logistic_logp_grad_hess_pallas(
                b, data.x, data.y, data.mask, dense=True, tg=tg
            )
            return b + 1e-6 * lg, s + jnp.sum(lv) + jnp.sum(lh)

        try:
            t = _timed_scan(vgh_step, (beta, 0.0))
            print(f"logp_grad_hess TG={tg}: {t:.1f} us/iter", flush=True)
        except Exception as e:
            print(f"logp_grad_hess TG={tg}: FAILED {type(e).__name__}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
