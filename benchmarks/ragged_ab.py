"""A/B microbench: ragged logistic logp+grad impls at config-4 scale.

Times one jitted evaluation (post-compile, best-of repeats) of the fused
(loglik, grad) computation consumed by MALA's carried cache, for each
ragged implementation, plus a TG/TN tile scan of the Pallas segment
kernel. Run on the real chip:

    /opt/venv/bin/python -m benchmarks.ragged_ab [--chains 1024] [--G 10000]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


K_INNER = 16


def _chain(fn):
    """K_INNER dependency-chained evals inside ONE jit: the axon tunnel
    adds ~25 ms dispatch per call, which swamps per-eval time at small
    sizes; feeding a scalar function of the output back into beta forces
    sequential execution and defeats DCE/CSE."""
    def body(beta):
        def step(b, _):
            out = fn(b)
            ll = out[0] if isinstance(out, tuple) else out
            return b + 1e-30 * jnp.mean(ll), None
        b, _ = jax.lax.scan(step, beta, None, length=K_INNER)
        return b
    return jax.jit(body)


def _time(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / K_INNER


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--G", type=int, default=10_000)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--p", type=int, default=3)
    ap.add_argument("--tiles", default="16:256,32:256,32:512,64:256,8:256")
    ap.add_argument("--skip-jnp", action="store_true")
    args = ap.parse_args()

    from nestmc.models.hier_logistic import synth_logistic
    from nestmc.ops.bucket import (
        BucketLayout, bucketed_logistic_logp_grad,
    )
    from nestmc.ops.loglik import logistic_logp_grad_segment
    from nestmc.ops.pallas.loglik_segment import (
        TiledSegmentLayout, logistic_logp_grad_segment_pallas,
    )

    C, G, p = args.chains, args.G, args.p
    data, _ = synth_logistic(
        jax.random.key(4000), G=G, n=args.n, p=p, ragged=True
    )
    N = int(data.x.shape[0])
    seg_np = np.asarray(data.segment_ids)
    beta = 0.3 * jax.random.normal(jax.random.key(1), (C, G, p), jnp.float32)
    print(f"backend={jax.default_backend()} C={C} G={G} N={N} p={p}")

    results = {}
    if not args.skip_jnp:
        f = _chain(lambda b: logistic_logp_grad_segment(
            b, data.x, data.y, data.segment_ids, G))
        try:
            results["jnp-lean"] = _time(f, beta)
        except Exception as e:  # OOM expected at some scales
            results["jnp-lean"] = f"FAIL {type(e).__name__}"
        print("jnp-lean:", results["jnp-lean"], flush=True)

    layout_b = BucketLayout.build(seg_np, G)
    print("bucket caps:", [(b.cap, b.obs_index.shape[0])
                           for b in layout_b.buckets],
          "padded_obs:", layout_b.padded_obs(), flush=True)
    fb = _chain(lambda b: bucketed_logistic_logp_grad(
        b, data.x, data.y, layout_b, impl="pallas"))
    try:
        results["bucket-pallas"] = _time(fb, beta)
    except Exception as e:
        results["bucket-pallas"] = f"FAIL {type(e).__name__}: {e}"
    print("bucket-pallas:", results["bucket-pallas"], flush=True)

    ref = None
    for spec in args.tiles.split(","):
        tg, tn = (int(v) for v in spec.split(":"))
        lay = TiledSegmentLayout.build(seg_np, G, tile_groups=tg,
                                       chunk_obs=tn)
        fp = _chain(lambda b, lay=lay: logistic_logp_grad_segment_pallas(
            b, data.x, data.y, lay))
        t0 = time.perf_counter()
        try:
            dt = _time(fp, beta)
            compile_s = time.perf_counter() - t0 - 6 * dt * K_INNER
            results[f"pallas-seg TG={tg} TN={tn}"] = dt
            print(f"pallas-seg TG={tg} TN={tn}: {dt*1e3:.2f} ms "
                  f"(chunks={lay.num_chunks}, compile~{compile_s:.0f}s)",
                  flush=True)
            if ref is None:
                got = jax.jit(
                    lambda b, lay=lay: logistic_logp_grad_segment_pallas(
                        b, data.x, data.y, lay))(beta)
                ref = jax.jit(lambda b: logistic_logp_grad_segment(
                    b[:8], data.x, data.y, data.segment_ids, G))(beta)
                np.testing.assert_allclose(
                    np.asarray(got[0][:8]), np.asarray(ref[0]),
                    rtol=5e-5, atol=5e-5)
                print("  parity vs jnp (8 chains): OK", flush=True)
        except Exception as e:
            results[f"pallas-seg TG={tg} TN={tn}"] = (
                f"FAIL {type(e).__name__}: {e}")
            print(f"pallas-seg TG={tg} TN={tn}: FAIL {e}", flush=True)

    print(json.dumps({k: (round(v * 1e3, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
