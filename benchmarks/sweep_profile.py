"""Per-stage timing of the judged sweeps on the judged shape
(C=256, G=1000, n=50, p=4 by default).

    /opt/venv/bin/python -m benchmarks.sweep_profile [--chains 256]

Times, with scalar-host-read syncs (the axon tunnel's block_until_ready
can return early):
  - one frozen sweep per live path: unfused MALA, fused-step MALA
    (ops/pallas/mala_accept.py), fused-step Newton
    (ops/pallas/newton_accept.py)
  - each hot kernel in isolation (fused MALA step, logp+grad eval, fused
    Newton step, logp+grad+Hess eval), plus a copy-only grid control
so the next op-count/fusion decision is driven by measured stage costs.
--roofline adds achieved bytes/s + transcendentals/s vs the HBM spec and
a measured on-chip transcendental peak (VERDICT r2 item 4).
"""

from __future__ import annotations

import argparse
import json
import time


def _timed(fn, init, reps=3, scan_len=64):
    """Median seconds per inner iteration of jitted scan(fn) from init.

    fn: carry -> carry (single value; wrap multi-output kernels so the
    carry pytree is stable across iterations)."""
    import jax

    @jax.jit
    def run(c0):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, c0, None, length=scan_len)
        return out

    out = run(init)  # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(init)
        # scalar host read = reliable sync on axon
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append((time.perf_counter() - t0) / scan_len)
    return sorted(times)[len(times) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--groups", type=int, default=1000)
    ap.add_argument("--obs", type=int, default=50)
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument(
        "--roofline", action="store_true",
        help="emit achieved bytes/s + transcendentals/s of the hot "
             "kernels vs the HBM spec and a measured transcendental peak",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.kernels.gibbs import make_sweep
    from nestmc.kernels.state import init_kernel_state
    from nestmc.models import make_hier_logistic, synth_logistic
    from nestmc.ops.pallas.loglik_logistic import (
        logistic_logp_grad_hess_pallas,
        logistic_logp_grad_pallas,
    )
    from nestmc.ops.pallas.mala_accept import fused_mala_logistic_step
    from nestmc.ops.pallas.newton_accept import fused_newton_logistic_step

    C, G, n, p = args.chains, args.groups, args.obs, args.p
    data, _ = synth_logistic(jax.random.key(2000), G=G, n=n, p=p)
    model = make_hier_logistic(data, tau_prior="invgamma")
    res = {"chains": C, "groups": G}

    # ---- whole frozen sweeps per live path ----
    for name, kcfg in [
        ("unfused_mala", KernelConfig(algorithm="mala")),
        ("fused_mala", KernelConfig(algorithm="mala", fused_accept=True)),
        ("fused_newton", KernelConfig(algorithm="newton",
                                      fused_accept=True)),
    ]:
        cfg = SamplerConfig(kernel=kcfg, run=RunConfig(chains=C, seed=0))
        state = init_kernel_state(model, cfg, jax.random.key(0), data)
        sweep = make_sweep(model, cfg)
        sec = _timed(lambda s: sweep(s, data, adapt=False), state)
        res[name] = round(sec * 1e6, 1)
        print(json.dumps({name: res[name]}), flush=True)

    # ---- hot kernels in isolation (chained carries: nothing DCE'd) ----
    cfg = SamplerConfig(kernel=KernelConfig(algorithm="newton"),
                        run=RunConfig(chains=C, seed=0))
    state = init_kernel_state(model, cfg, jax.random.key(0), data)
    beta = state.position["beta"]
    cache = state.cache["beta"]
    v, g, h = cache["v"], cache["g"], cache["h"]
    mu, lt = state.position["mu"], state.position["log_tau"]
    ls2 = state.log_scale["beta"]
    key = jax.random.key(1)
    dense = True  # synth data is fully dense

    def k_mala(carry):
        b, vv, gg, k = carry
        k, k2 = jax.random.split(k)
        nb, nv, ng, _ = fused_mala_logistic_step(
            k2, b, vv, gg, ls2 - 1.5, mu, lt, data.x, data.y, data.mask,
            dense=dense,
        )
        return nb, nv, ng, k

    res["k_mala_step"] = round(_timed(k_mala, (beta, v, g, key)) * 1e6, 1)
    print(json.dumps({"k_mala_step": res["k_mala_step"]}), flush=True)

    def k_grad(carry):
        b, s = carry
        lv, lg = logistic_logp_grad_pallas(
            b, data.x, data.y, data.mask, dense=dense
        )
        return b + 1e-6 * lg, s + jnp.sum(lv)

    res["k_eval_grad"] = round(_timed(k_grad, (beta, 0.0)) * 1e6, 1)
    print(json.dumps({"k_eval_grad": res["k_eval_grad"]}), flush=True)

    def k_newton(carry):
        b, vv, gg, hh, k = carry
        k, k2 = jax.random.split(k)
        nb, nv, ng, nh, _ = fused_newton_logistic_step(
            k2, b, vv, gg, hh, ls2, mu, lt, data.x, data.y, data.mask,
            dense=dense,
        )
        return nb, nv, ng, nh, k

    res["k_newton_step"] = round(
        _timed(k_newton, (beta, v, g, h, key)) * 1e6, 1
    )
    print(json.dumps({"k_newton_step": res["k_newton_step"]}), flush=True)

    def k_vgh(carry):
        b, s = carry
        lv, lg, lh = logistic_logp_grad_hess_pallas(
            b, data.x, data.y, data.mask, dense=dense
        )
        return b + 1e-6 * lg, s + jnp.sum(lv) + jnp.sum(lh)

    res["k_eval_vgh"] = round(_timed(k_vgh, (beta, 0.0)) * 1e6, 1)
    print(json.dumps({"k_eval_vgh": res["k_eval_vgh"]}), flush=True)

    # fixed pallas dispatch overhead: a copy-only kernel over the same
    # (G, p, C)-sized buffer — subtract from stage times for true compute
    from jax.experimental import pallas as pl

    def _copy_kernel(b_ref, o_ref):
        o_ref[:] = b_ref[:]

    bt = jnp.transpose(beta, (1, 2, 0))
    Gp = (G + 15) // 16 * 16
    bt = jnp.pad(bt, ((0, Gp - G), (0, 0), (0, 0)))
    TCn = 256 if C % 256 == 0 else 128

    def k_noop(b):
        return pl.pallas_call(
            _copy_kernel,
            grid=(Gp // 16, C // TCn),
            in_specs=[pl.BlockSpec((16, p, TCn),
                                   lambda g, c: (g, 0, c))],
            out_specs=pl.BlockSpec((16, p, TCn),
                                   lambda g, c: (g, 0, c)),
            out_shape=jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
        )(b)

    res["k_copy_only"] = round(_timed(k_noop, bt) * 1e6, 1)
    print(json.dumps({"k_copy_only": res["k_copy_only"]}), flush=True)

    if args.roofline:
        res["roofline"] = _roofline(res, C=C, G=G, n=n, p=p)
        print(json.dumps({"roofline": res["roofline"]}, indent=2),
              flush=True)

    res["unit"] = "us_per_sweep_or_call"
    print(json.dumps(res))
    return 0


def _roofline(res, C, G, n, p):
    """Quantified utilization of the hot kernels vs measured device peaks.

    For each timed stage: analytic minimal HBM traffic (every operand
    touched once) and transcendental counts, divided by measured stage
    time, vs (a) the v5e HBM spec 819 GB/s and (b) an EMPIRICAL
    transcendental peak — a same-shape Pallas kernel that only streams the
    obs block and applies one exp+log1p per element, timed on this chip.
    That makes the 'transcendental-bound' claim (DESIGN.md section 2) a
    measured number, not prose (VERDICT r2 item 4).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f = 4  # f32 bytes
    T = p * (p + 1) // 2
    obs_bytes = f * (G * n * p + 2 * G * n)
    c3 = f * G * p * C            # one (G, p, C)-sized array
    c2 = f * G * C
    cT = f * G * T * C
    stages = {
        # in: obs + beta,v,g,ls; out: beta,v,g,alpha
        "k_mala_step": {
            "bytes": obs_bytes + 4 * c3 + 4 * c2,
            "transcendentals": 2 * C * G * n + 3 * C * G * p,
        },
        "k_eval_grad": {
            "bytes": obs_bytes + 2 * c3 + c2,
            "transcendentals": 2 * C * G * n,
        },
        # in: obs + beta,v,g,h,ls; out: beta,v,g,h,alpha
        "k_newton_step": {
            "bytes": obs_bytes + 4 * c3 + 2 * cT + 4 * c2,
            "transcendentals": 2 * C * G * n + 3 * C * G * p,
        },
        "k_eval_vgh": {
            "bytes": obs_bytes + 2 * c3 + cT + c2,
            "transcendentals": 2 * C * G * n,
        },
    }

    # empirical transcendental peak: stream the obs-sized block, apply
    # exp+log1p per element, write one (TG, TC) reduction.
    TC = 256 if C % 256 == 0 else 128
    TG = 16
    Gp = (G + TG - 1) // TG * TG

    def _trans_kernel(x_ref, o_ref):
        x = x_ref[:]                                   # (TG, n, TC)
        o_ref[:] = jnp.sum(jnp.log1p(jnp.exp(x)), axis=1)

    xt = jnp.broadcast_to(
        jnp.linspace(-3.0, 3.0, n)[None, :, None], (Gp, n, TC)
    ).astype(jnp.float32)

    def k_trans(b):
        out = pl.pallas_call(
            _trans_kernel,
            grid=(Gp // TG,),
            in_specs=[pl.BlockSpec((TG, n, TC), lambda g: (g, 0, 0))],
            out_specs=pl.BlockSpec((TG, TC), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((Gp, TC), jnp.float32),
        )(b)
        return b + 0.0 * out[:, None, :]

    t_trans = _timed(k_trans, xt)
    peak_trans_per_s = 2 * Gp * n * TC / t_trans

    out = {
        "empirical_exp_log1p_per_s": round(peak_trans_per_s / 1e9, 2),
        "empirical_peak_unit": "Gtranscendental/s (exp+log1p pairs x2)",
        "hbm_peak_GBps": 819.0,
    }
    for name, cost in stages.items():
        t = res[name] * 1e-6
        out[name] = {
            "us": res[name],
            "achieved_GBps": round(cost["bytes"] / t / 1e9, 1),
            "hbm_util_pct": round(100 * cost["bytes"] / t / 819e9, 1),
            "achieved_Gtrans_per_s": round(
                cost["transcendentals"] / t / 1e9, 2
            ),
            "trans_util_pct": round(
                100 * cost["transcendentals"] / t / peak_trans_per_s, 1
            ) if cost["transcendentals"] else None,
        }
    return out


if __name__ == "__main__":
    raise SystemExit(main())
