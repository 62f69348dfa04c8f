"""Fully fused MALA step for the hierarchical-logistic group block.

One Pallas kernel performs, per (group-tile, chain-tile):
  1. the full-conditional gradient at the current point — carried data-lik
     grad (kernels/mala.py cond_cached_grad mechanics) plus the closed-form
     Gaussian group-prior grad,
  2. Langevin proposal beta' = beta + (s^2/2) grad + s eps with on-core
     PRNG noise (Box-Muller over prng_random_bits),
  3. the Bernoulli-logit log-likelihood AND grad of beta' (one obs pass),
  4. the group-prior delta and the asymmetric-proposal MH correction,
  5. the accept/reject draw and the selects,
writing new beta, the refreshed (loglik, grad) cache, and the acceptance
probabilities. The unfused MALA sweep body is ~50 (C,G,p)-shaped HBM-bound
elementwise ops around the likelihood kernel (BASELINE.md roofline: the
judged config is per-op-latency bound, 5-10x above HBM speed-of-light);
this kernel collapses the entire beta update to ONE pass that touches each
operand once.

RNG: per-core PRNG seeded from (key, grid cell) — a different stream than
the threefry path, exactly like ops/pallas/mh_accept.py; opt-in via
KernelConfig.fused_accept, statistical equivalence tested
(tests/test_mala_accept_fused.py: one-step acceptance probabilities +
long-run moments, per CLAUDE.md's "MH trajectory comparisons across
implementations are chaotic" rule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nestmc.ops.pallas.loglik_logistic import (
    _eta_vpu,
    _group_tile,
    _lik_terms,
    _pad_groups,
    _pick_tile,
    _r8,
    _r128,
)
from nestmc.ops.pallas.mh_accept import _normal, _seed_words, _uniform_01


def _fold_tile(G: int, tg: int) -> int | None:
    """Largest multiple-of-8 group tile that DIVIDES G and fits the
    budget tile ``tg`` — the in-kernel R-hat fold streams (2, TG, p, TC)
    accumulator blocks whose group axis must not be padded (padding would
    desynchronize the accumulator from its (2, G, p, C) storage)."""
    t = (min(tg, G) // 8) * 8
    while t >= 8:
        if G % t == 0:
            return t
        t -= 8
    return None


def _make_fused_mala_kernel(p: int, external_noise: bool, dense: bool = False,
                            fold: bool = False):
  """external_noise: eps/log-u arrive as operands instead of the on-core
  PRNG — the testing path (CPU interpret mode has no prng_seed lowering),
  and it makes the kernel EXACTLY reproduce the unfused update given the
  same noise (tests/test_mala_accept_fused.py)."""
  def _kernel(
    seed_ref,                     # (1, 1) int32 in SMEM
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) carried data-loglik of beta
    g_ref,                        # (TG, p, TC) carried data-lik grad
    ls_ref,                       # (TG, TC) log proposal scales
    mu_ref, itau2_ref,            # (p, TC) chains-minor hyper state
    *rest,                        # [eps_ref, logu_ref,] outputs
  ):
    # operand order: [eps, logu]? [fsc, fmean, fm2]? then outputs
    # [beta, v, g, alpha] [fmean', fm2']?
    rest = list(rest)
    if fold:
        out_fmean_ref, out_fm2_ref = rest[-2:]
        rest = rest[:-2]
    if external_noise:
        eps_ref, logu_ref = rest[:2]
        rest = rest[2:]
    if fold:
        fsc_ref, fmean_ref, fm2_ref = rest[:3]
        rest = rest[3:]
    out_beta_ref, out_v_ref, out_g_ref, out_alpha_ref = rest
    if not external_noise:
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * jnp.int32(1000003)
            + pl.program_id(1) * jnp.int32(7919)
        )
    mix = seed_ref[0, 1]
    beta = beta_ref[:]                                    # (TG, p, TC)
    if fold:
        # streaming split-R-hat Welford fold (VERDICT r3 item 5): update
        # BOTH halves' accumulators with the INPUT beta (= the previous
        # retained draw's final value) in the same pass — per-half active
        # flags make the inactive half an identity update
        for h in range(2):
            cnt = fsc_ref[h, 0]
            act = fsc_ref[h, 1]
            mean_h = fmean_ref[h]
            delta = beta - mean_h
            new_mean = mean_h + act * delta / cnt
            out_fmean_ref[h] = new_mean
            out_fm2_ref[h] = fm2_ref[h] + act * delta * (beta - new_mean)
    mu = mu_ref[:][None, :, :]                            # (1, p, TC)
    itau2 = itau2_ref[:][None, :, :]
    s = jnp.exp(ls_ref[:])[:, None, :]                    # (TG, 1, TC)
    s2 = s * s

    db = beta - mu
    g_old = g_ref[:] - db * itau2                         # full-cond grad
    eps = eps_ref[:] if external_noise else _normal(beta.shape, mix)
    prop = beta + 0.5 * s2 * g_old + s * eps

    # one obs pass: loglik + grad of the proposal
    x = x_ref[:]
    eta = _eta_vpu(x, prop, p)                            # (TG, n, TC)
    y = y_ref[:][:, :, None]
    m = None if dense else mask_ref[:][:, :, None]
    ll, resid = _lik_terms(eta, y, m)     # one exp+log1p for both terms
    lik_prop = jnp.sum(ll, axis=1)
    gll = [
        jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)   # (TG, TC)
        for k in range(p)
    ]

    dp = prop - mu
    # conditional delta: data lik + prior quadratics (log tau terms cancel)
    d_delta = (
        lik_prop - v_ref[:]
        + jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=1)
    )
    # asymmetric correction: fwd residual is s*eps by construction; the
    # reverse one uses the full-cond grad at the proposal
    g_new = jnp.stack(gll, axis=1) - dp * itau2           # (TG, p, TC)
    rev = beta - prop - 0.5 * s2 * g_new
    fwd = s * eps
    q_delta = jnp.sum(fwd * fwd - rev * rev, axis=1) / (
        2.0 * jnp.exp(2.0 * ls_ref[:])
    )
    log_alpha = d_delta + q_delta                         # (TG, TC)

    logu = logu_ref[:] if external_noise else jnp.log(
        _uniform_01(log_alpha.shape, mix)
    )
    accept = logu < log_alpha                             # NaN -> reject
    acc3 = accept[:, None, :]
    out_beta_ref[:] = jnp.where(acc3, prop, beta)
    out_v_ref[:] = jnp.where(accept, lik_prop, v_ref[:])
    for k in range(p):
        out_g_ref[:, k, :] = jnp.where(accept, gll[k], g_ref[:, k, :])
    alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
    out_alpha_ref[:] = jnp.where(jnp.isnan(log_alpha), 0.0, alpha)

  return _kernel


def fused_mala_logistic_step(
    key, beta, v_cache, g_cache, log_scale, mu, log_tau, x, y, mask,
    interpret: bool | None = None, noise=None, dense: bool = False,
    rhat_fold=None,
):
    """One MALA update of the whole group block in a single kernel pass.

    Args mirror kernels/mala.py at the hier_logistic call site: beta
    (C,G,p); (v_cache, g_cache) the carried data-likelihood value (C,G) and
    grad (C,G,p) at beta; log_scale (C,G) or (C,1).
    noise: None (on-core PRNG; TPU only) or (eps (C,G,p), logu (C,G)) —
    external noise for exact-parity testing.
    rhat_fold: optional (mean (2,G,p,C), m2 (2,G,p,C), scalars (2,2)) —
    kernel-layout streaming-R-hat accumulators folded with the INPUT beta
    in the same pass (diagnostics.fold_rhat_*); appends (new_mean,
    new_m2) to the return. Needs a group tile dividing G; otherwise the
    fold falls back to the jnp reference around an unfolded kernel call.
    Returns (new_beta, new_v, new_g, alpha (C,G)[, new_mean, new_m2]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    external_noise = noise is not None
    C, G, p = beta.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    fold = rhat_fold is not None
    # (TG,p,TC) buffers: beta + grad in, beta + grad out, ~4 temps (prop,
    # eps, g_old/g_new, rev); (TG,TC): v/ls in, v/alpha out; the fold adds
    # 2x(2,TG,p,TC) in + out
    TG = _group_tile(
        n, p, TC, G, n_inter=2,
        extra_out=(6 + (8 if fold else 0)) * _r8(p) * _r128(TC) * 4
        + 3 * _r128(TC) * 4,
        max_tg=64,
    )
    if fold:
        ft = _fold_tile(G, TG)
        if ft is None:
            from nestmc.diagnostics import fold_rhat_update

            fmean, fm2, fsc = rhat_fold
            nb, nv, ng, alpha = fused_mala_logistic_step(
                key, beta, v_cache, g_cache, log_scale, mu, log_tau,
                x, y, mask, interpret=interpret, noise=noise, dense=dense,
            )
            new_mean, new_m2 = fold_rhat_update(
                fmean, fm2, jnp.transpose(beta, (1, 2, 0)), fsc
            )
            return nb, nv, ng, alpha, new_mean, new_m2
        TG = ft

    seed = _seed_words(key)

    bt = jnp.transpose(beta, (1, 2, 0))                   # (G, p, C)
    gt = jnp.transpose(g_cache, (1, 2, 0))                # (G, p, C)
    v_t = v_cache.T                                       # (G, C)
    ls_t = jnp.broadcast_to(log_scale, (C, G)).T          # (G, C)
    mu_t = mu.T                                           # (p, C)
    itau2_t = jnp.exp(-2.0 * log_tau).T                   # (p, C)
    pads = [x, y, mask, bt, gt, v_t, ls_t]
    if external_noise:
        eps, logu = noise
        pads.append(jnp.transpose(eps, (1, 2, 0)))        # (G, p, C)
        pads.append(logu.T)                               # (G, C)
    pads, Gp = _pad_groups(pads, G, TG)
    x_p, y_p, mask_p, bt_p, gt_p, v_p, ls_p = pads[:7]

    in_specs = [
        pl.BlockSpec(
            (1, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((p, TC), lambda g, c: (0, c)),
        pl.BlockSpec((p, TC), lambda g, c: (0, c)),
    ]
    if external_noise:
        in_specs.append(pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)))
        in_specs.append(pl.BlockSpec((TG, TC), lambda g, c: (g, c)))
    extra_in = list(pads[7:])
    out_specs = [
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
        jax.ShapeDtypeStruct((Gp, C), jnp.float32),
        jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
        jax.ShapeDtypeStruct((Gp, C), jnp.float32),
    ]
    if fold:
        fmean, fm2, fsc = rhat_fold
        in_specs.append(pl.BlockSpec(
            (2, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM
        ))
        fold_spec = pl.BlockSpec((2, TG, p, TC), lambda g, c: (0, g, 0, c))
        in_specs += [fold_spec, fold_spec]
        extra_in += [fsc.astype(jnp.float32), fmean, fm2]
        out_specs += [fold_spec, fold_spec]
        out_shape += [
            jax.ShapeDtypeStruct((2, G, p, C), jnp.float32),
            jax.ShapeDtypeStruct((2, G, p, C), jnp.float32),
        ]

    grid = (Gp // TG, C // TC)
    outs = pl.pallas_call(
        _make_fused_mala_kernel(p, external_noise, dense, fold),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Gp * n * p + 30 * C * Gp * p + 10 * C * Gp * n
            + (8 * C * Gp * p if fold else 0),
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 4 * C * Gp * p + 6 * C * Gp
                                + (16 * C * Gp * p if fold else 0)),
            transcendentals=C * Gp * (2 * n + 3 * p + 3),
        ),
    )(seed, x_p, y_p, mask_p, bt_p, v_p, gt_p, ls_p, mu_t, itau2_t,
      *extra_in)
    new_bt, new_v, new_gt, alpha = outs[:4]
    result = (
        jnp.transpose(new_bt[:G], (2, 0, 1)),
        new_v[:G].T,
        jnp.transpose(new_gt[:G], (2, 0, 1)),
        alpha[:G].T,
    )
    if fold:
        result = result + (outs[4], outs[5])
    return result
