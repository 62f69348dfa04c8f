"""Per-stage timing of the fused sweep vs the op-by-op sweep on the
judged shape (C=256, G=1000, n=50, p=4 by default).

    /opt/venv/bin/python -m benchmarks.sweep_profile [--chains 256]

Times, with scalar-host-read syncs (the axon tunnel's block_until_ready
can return early):
  - one frozen unfused sweep, one frozen fused sweep (scan of K for
    per-sweep amortization)
  - each fused kernel in isolation (mala+suff, asis eval, asis select)
so the next op-count/fusion decision is driven by measured stage costs.
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
    from nestmc.ops.pallas.sweep_logistic import (
        asis_eval_t,
        asis_select_t,
        fused_mala_suff_step_t,
    )

    C, G = args.chains, args.groups
    data, _ = synth_logistic(jax.random.key(2000), G=G, n=args.obs,
                             p=args.p)
    model = make_hier_logistic(data, tau_prior="invgamma")
    res = {"chains": C, "groups": G}

    # ---- whole sweeps ----
    for name, kcfg in [
        ("unfused", KernelConfig(algorithm="mala")),
        ("fused_accept", KernelConfig(algorithm="mala",
                                      fused_accept=True)),
        ("fused_sweep", KernelConfig(algorithm="mala", fused_sweep=True)),
    ]:
        cfg = SamplerConfig(kernel=kcfg, run=RunConfig(chains=C, seed=0))
        state = init_kernel_state(model, cfg, jax.random.key(0), data)
        if name == "fused_sweep":
            impl = model.fused_sweep(cfg, data)
            if impl is None:
                res[name] = None
                continue
            fstate = jax.jit(impl.to_fused)(state)
            fdata = jax.jit(impl.prep_data)(data)
            sec = _timed(
                lambda s: impl.sweep(s, fdata, adapt=False), fstate
            )
        else:
            sweep = make_sweep(model, cfg)
            sec = _timed(lambda s: sweep(s, data, adapt=False), state)
        res[name] = round(sec * 1e6, 1)
        print(json.dumps({name: res[name]}), flush=True)

    # ---- fused stages in isolation ----
    cfg = SamplerConfig(kernel=KernelConfig(algorithm="mala",
                                            fused_sweep=True),
                        run=RunConfig(chains=C, seed=0))
    impl = model.fused_sweep(cfg, data)
    if impl is not None:
        state = init_kernel_state(model, cfg, jax.random.key(0), data)
        fs = jax.jit(impl.to_fused)(state)
        fd = jax.jit(impl.prep_data)(data)
        beta = fs.position["beta"]
        v, g = fs.cache["beta"]["v"], fs.cache["beta"]["g"]
        ls = fs.log_scale["beta"]
        mu, lt = fs.position["mu"], fs.position["log_tau"]
        itau2 = jnp.exp(-2.0 * lt)
        ratio = jnp.exp(0.01 * jnp.ones_like(lt))
        key = jax.random.key(1)

        def k1(b):
            return fused_mala_suff_step_t(
                key, b, v, g, ls, mu, itau2, fd.x, fd.y, fd.mask
            )[0]

        def k2(b):
            # carry must keep beta's shape; the zero-scaled grad add keeps
            # the kernel in the dependency chain
            lik, gnew, dsum = asis_eval_t(b, v, mu, ratio, fd.x, fd.y,
                                          fd.mask)
            return b + 0.0 * gnew

        lik_new, g_new, _ = asis_eval_t(beta, v, mu, ratio, fd.x, fd.y,
                                        fd.mask)
        acc = jnp.ones((1, C), jnp.float32)

        def k3(b):
            return asis_select_t(b, v, g, lik_new, g_new, mu, ratio, acc,
                                 fd.mask)[0]

        for name, fn in [("k_mala_suff", k1), ("k_asis_eval", k2),
                         ("k_asis_select", k3)]:
            res[name] = round(_timed(fn, beta) * 1e6, 1)
            print(json.dumps({name: res[name]}), flush=True)

        # fixed pallas dispatch overhead: a copy-only kernel same grid
        # shape as the select kernel — subtract from stage times to get
        # true compute
        from jax.experimental import pallas as pl

        def _copy_kernel(b_ref, o_ref):
            o_ref[:] = b_ref[:]

        Gp, P, Cc = beta.shape
        TCn = 256 if Cc % 256 == 0 else 128

        def k_noop(b):
            return pl.pallas_call(
                _copy_kernel,
                grid=(Gp // 64, Cc // TCn),
                in_specs=[pl.BlockSpec((64, P, TCn),
                                       lambda g, c: (g, 0, c))],
                out_specs=pl.BlockSpec((64, P, TCn),
                                       lambda g, c: (g, 0, c)),
                out_shape=jax.ShapeDtypeStruct((Gp, P, Cc), jnp.float32),
            )(b)

        res["k_copy_only"] = round(_timed(k_noop, beta) * 1e6, 1)
        print(json.dumps({"k_copy_only": res["k_copy_only"]}), flush=True)

        # the round-1 kernel (canonical layout, transposes inside) for
        # comparison: isolates what the layout change buys per call
        from nestmc.ops.pallas.mala_accept import fused_mala_logistic_step

        beta_c = state.position["beta"]
        v_c, g_c = (state.cache["beta"]["v"], state.cache["beta"]["g"])
        ls_c = state.log_scale["beta"]
        mu_c, lt_c = state.position["mu"], state.position["log_tau"]

        def k_old(b):
            return fused_mala_logistic_step(
                key, b, v_c, g_c, ls_c, mu_c, lt_c,
                data.x, data.y, data.mask,
            )[0]

        res["k_mala_old_transposing"] = round(
            _timed(k_old, beta_c) * 1e6, 1
        )

        if args.roofline:
            res["roofline"] = _roofline(
                beta, fd, res, C=Cc, Gp=Gp, n=args.obs, p=P
            )
            print(json.dumps({"roofline": res["roofline"]}, indent=2),
                  flush=True)

    res["unit"] = "us_per_sweep_or_call"
    print(json.dumps(res))
    return 0


def _roofline(beta, fd, res, C, Gp, n, p):
    """Quantified utilization of the hot kernels vs measured device peaks.

    For each timed stage: analytic minimal HBM traffic (every operand
    touched once) and transcendental counts, divided by measured stage
    time, vs (a) the v5e HBM spec 819 GB/s and (b) an EMPIRICAL
    transcendental peak — a same-shape Pallas kernel that only streams the
    obs block and applies one exp+log1p per element, timed on this chip.
    That makes the 'transcendental-bound within ~1.3x of the VPU floor'
    claim (DESIGN.md section 2) a measured number, not prose
    (VERDICT r2 item 4).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f = 4  # f32 bytes
    # per-call minimal HBM bytes: obs block (x, y, mask) + chain-carried
    # blocks in/out.
    obs_bytes = f * (Gp * n * p + 2 * Gp * n)
    carry3 = f * Gp * p * C       # one (Gp, p, C) array
    carry2 = f * Gp * C           # one (Gp, C) array
    stages = {
        # in: obs + beta,v,g,ls; out: beta,v,g,alpha (+s1,s2 ~ p*C, negl.)
        "k_mala_suff": {
            "bytes": obs_bytes + 4 * carry3 + 4 * carry2,
            # per obs element: one exp + one log1p (single-exp _lik_terms)
            # + noise (Box-Muller: log, cos, sqrt ~ 3 per beta element)
            "transcendentals": 2 * C * Gp * n + 3 * C * Gp * p,
        },
        # in: obs + beta,v; out: lik_new, g_new (+dsum)
        "k_asis_eval": {
            "bytes": obs_bytes + 2 * carry3 + 2 * carry2,
            "transcendentals": 2 * C * Gp * n,
        },
        # in: beta,v,g,lik_new,g_new; out: beta,v,g — no obs pass
        "k_asis_select": {
            "bytes": 4 * carry3 + 3 * carry2,
            "transcendentals": 0,
        },
    }

    # empirical transcendental peak: stream the obs-sized block, apply
    # exp+log1p per element, write one (TG, TC) reduction — the same
    # compute/traffic shape as the likelihood inner loop with everything
    # else stripped.
    TC = 256 if C % 256 == 0 else 128
    TG = 16

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
