"""Fully fused MH steps (RW / MALA / Newton) for the POISSON subject block.

Mirrors ops/pallas/{mh,mala,newton}_accept.py — one Pallas kernel per
update doing propose + one Poisson-log obs pass + prior delta + asymmetric
correction + accept/reject + selects — with the two structural differences
of the 3-level GLMM's obs block (models/nested_poisson.py beta_s,
BASELINE.json:9):

- the Gaussian prior mean is PER UNIT (beta_s ~ N(beta_g[subject_group],
  diag(tau_s^2))): the kernel streams a (TG, p, TC) prior-mean tile
  alongside beta instead of broadcasting a (p, TC) mu;
- the likelihood terms are Poisson-log: rate = exp(eta) gives loglik
  (y*eta - rate), residual (y - rate) AND Newton curvature w = rate from
  ONE transcendental (the same zero-extra-cost Hessian trick as the vgh
  kernel, ops/pallas/loglik_poisson.py).

The parameter-independent -lgamma(y+1) term is handled OUTSIDE the kernel:
the carried cache convention includes it (lik_value_grad* subtract the
per-unit const), so the wrappers shift the cache by +const on the way in
and -const on the way out — two (C, S) elementwise XLA ops around one
kernel, keeping the kernel free of a dead (TG, n) table stream.

RNG: per-core PRNG seeded from (key, grid cell) exactly as mh_accept.py;
external-noise operands reproduce the unfused kernels bitwise-modulo-
float-assoc for the exact-parity tier (tests/test_poisson_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from nestmc.ops.pallas.loglik_logistic import (
    _eta_vpu,
    _group_tile,
    _pad_groups,
    _pick_tile,
    _r8,
    _r128,
)
from nestmc.ops.pallas.mh_accept import _normal, _seed_words, _uniform_01
from nestmc.ops.pallas.newton_accept import (
    _chol_slices,
    _lt_vec_slices,
    _solve_upper_t_slices,
    _spd_solve_slices,
)
from nestmc.ops.smallchol import packed_index


def _pois_terms(eta, y, m, need_w: bool = False):
    """(ll, resid[, w]) of the Poisson-log likelihood from ONE exp.

    ll = y*eta - exp(eta) (the -lgamma(y+1) const lives outside the
    kernel); resid = y - rate is the gradient weight; w = rate is the
    Newton curvature — all three share the single transcendental.
    """
    rate = jnp.exp(eta)
    ll = y * eta - rate
    resid = y - rate
    if m is not None:
        ll = ll * m
        resid = resid * m
        rate = rate * m
    if need_w:
        return ll, resid, rate
    return ll, resid


# ---------------------------------------------------------------- RW-MH --

def _make_rwmh_kernel(p: int, external_noise: bool, dense: bool):
  def _kernel(
    seed_ref,                     # (1, 2) int32 in SMEM [seed, mix]
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    lik_ref,                      # (TG, TC) carried loglik (const-free)
    ls_ref,                       # (TG, TC) log proposal scales
    bgs_ref, itau2_ref,           # (TG, p, TC) prior means; (p, TC)
    *rest,
  ):
    if external_noise:
        eps_ref, logu_ref, out_beta_ref, out_lik_ref, out_alpha_ref = rest
    else:
        out_beta_ref, out_lik_ref, out_alpha_ref = rest
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * jnp.int32(1000003)
            + pl.program_id(1) * jnp.int32(7919)
        )
    mix = seed_ref[0, 1]
    beta = beta_ref[:]                                    # (TG, p, TC)
    eps = eps_ref[:] if external_noise else _normal(beta.shape, mix)
    prop = beta + jnp.exp(ls_ref[:])[:, None, :] * eps

    eta = _eta_vpu(x_ref[:], prop, p)                     # (TG, n, TC)
    y = y_ref[:][:, :, None]
    m = None if dense else mask_ref[:][:, :, None]
    ll, _ = _pois_terms(eta, y, m)
    lik_prop = jnp.sum(ll, axis=1)

    bgs = bgs_ref[:]                                      # (TG, p, TC)
    itau2 = itau2_ref[:][None, :, :]
    dp = prop - bgs
    db = beta - bgs
    prior_delta = jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=1)

    log_alpha = lik_prop - lik_ref[:] + prior_delta
    logu = logu_ref[:] if external_noise else jnp.log(
        _uniform_01(log_alpha.shape, mix)
    )
    accept = logu < log_alpha                             # NaN -> reject
    out_beta_ref[:] = jnp.where(accept[:, None, :], prop, beta)
    out_lik_ref[:] = jnp.where(accept, lik_prop, lik_ref[:])
    alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
    out_alpha_ref[:] = jnp.where(jnp.isnan(log_alpha), 0.0, alpha)

  return _kernel


def fused_rwmh_poisson_step(
    key, beta, lik_cache, log_scale, bg_s, log_tau_s, x, y, mask,
    lgamma_y=None, interpret: bool | None = None, noise=None,
    dense: bool = False,
):
    """(new_beta (C,S,p), new_lik (C,S), alpha (C,S)) in one kernel pass.

    beta (C,S,p); lik_cache (C,S) carried loglik of beta INCLUDING the
    -lgamma(y+1) const (the cond_cached convention); log_scale (C,S) or
    (C,1); bg_s (C,S,p) per-subject prior means (beta_g gathered to
    subjects); log_tau_s (C,p).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    external_noise = noise is not None
    C, S, p = beta.shape
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)              # (S,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, S, n_inter=2,
                     extra_out=2 * _r8(p) * _r128(TC) * 4
                     + 2 * _r128(TC) * 4,
                     max_tg=64)

    seed = _seed_words(key)
    bt = jnp.transpose(beta, (1, 2, 0))                   # (S, p, C)
    bgt = jnp.transpose(bg_s, (1, 2, 0))                  # (S, p, C)
    lik_t = (lik_cache + const[None, :]).T                # (S, C) const-free
    ls_t = jnp.broadcast_to(log_scale, (C, S)).T
    itau2_t = jnp.exp(-2.0 * log_tau_s).T                 # (p, C)
    pads = [x, y, mask, bt, lik_t, ls_t, bgt]
    if external_noise:
        eps, logu = noise
        pads.append(jnp.transpose(eps, (1, 2, 0)))
        pads.append(logu.T)
    pads, Sp = _pad_groups(pads, S, TG)
    x_p, y_p, mask_p, bt_p, lik_p, ls_p, bgt_p = pads[:7]

    in_specs = [
        pl.BlockSpec((1, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((p, TC), lambda g, c: (0, c)),
    ]
    if external_noise:
        in_specs.append(pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)))
        in_specs.append(pl.BlockSpec((TG, TC), lambda g, c: (g, c)))

    grid = (Sp // TG, C // TC)
    new_bt, new_lik, alpha = pl.pallas_call(
        _make_rwmh_kernel(p, external_noise, dense),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * C * Sp * n * p + 12 * C * Sp * (n + p),
            bytes_accessed=4 * (Sp * n * p + 2 * Sp * n
                                + 3 * C * Sp * p + 6 * C * Sp),
            transcendentals=C * Sp * (n + 3 * p + 2),
        ),
    )(seed, x_p, y_p, mask_p, bt_p, lik_p, ls_p, bgt_p, itau2_t,
      *pads[7:])
    return (
        jnp.transpose(new_bt[:S], (2, 0, 1)),
        new_lik[:S].T - const[None, :],
        alpha[:S].T,
    )


# ----------------------------------------------------------------- MALA --

def _make_mala_kernel(p: int, external_noise: bool, dense: bool):
  def _kernel(
    seed_ref,
    x_ref, y_ref, mask_ref,
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) carried loglik (const-free)
    g_ref,                        # (TG, p, TC) carried data-lik grad
    ls_ref,                       # (TG, TC) log proposal scales
    bgs_ref, itau2_ref,           # (TG, p, TC); (p, TC)
    *rest,
  ):
    if external_noise:
        eps_ref, logu_ref, out_beta_ref, out_v_ref, out_g_ref, \
            out_alpha_ref = rest
    else:
        out_beta_ref, out_v_ref, out_g_ref, out_alpha_ref = rest
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * jnp.int32(1000003)
            + pl.program_id(1) * jnp.int32(7919)
        )
    mix = seed_ref[0, 1]
    beta = beta_ref[:]
    bgs = bgs_ref[:]
    itau2 = itau2_ref[:][None, :, :]
    s = jnp.exp(ls_ref[:])[:, None, :]
    s2 = s * s

    db = beta - bgs
    g_old = g_ref[:] - db * itau2                         # full-cond grad
    eps = eps_ref[:] if external_noise else _normal(beta.shape, mix)
    prop = beta + 0.5 * s2 * g_old + s * eps

    x = x_ref[:]
    eta = _eta_vpu(x, prop, p)
    y = y_ref[:][:, :, None]
    m = None if dense else mask_ref[:][:, :, None]
    ll, resid = _pois_terms(eta, y, m)
    lik_prop = jnp.sum(ll, axis=1)
    gll = [
        jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)
        for k in range(p)
    ]

    dp = prop - bgs
    d_delta = (
        lik_prop - v_ref[:]
        + jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=1)
    )
    g_new = jnp.stack(gll, axis=1) - dp * itau2
    rev = beta - prop - 0.5 * s2 * g_new
    fwd = s * eps
    q_delta = jnp.sum(fwd * fwd - rev * rev, axis=1) / (
        2.0 * jnp.exp(2.0 * ls_ref[:])
    )
    log_alpha = d_delta + q_delta

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


def fused_mala_poisson_step(
    key, beta, v_cache, g_cache, log_scale, bg_s, log_tau_s, x, y, mask,
    lgamma_y=None, interpret: bool | None = None, noise=None,
    dense: bool = False,
):
    """One MALA update of the whole subject block in a single kernel.

    Returns (new_beta, new_v, new_g, alpha (C,S)); cache convention as in
    models/nested_poisson.py lik_value_and_grad (v includes -lgamma const).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    external_noise = noise is not None
    C, S, p = beta.shape
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)              # (S,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(
        n, p, TC, S, n_inter=2,
        extra_out=7 * _r8(p) * _r128(TC) * 4 + 3 * _r128(TC) * 4,
        max_tg=64,
    )

    seed = _seed_words(key)
    bt = jnp.transpose(beta, (1, 2, 0))
    gt = jnp.transpose(g_cache, (1, 2, 0))
    bgt = jnp.transpose(bg_s, (1, 2, 0))
    v_t = (v_cache + const[None, :]).T                    # const-free
    ls_t = jnp.broadcast_to(log_scale, (C, S)).T
    itau2_t = jnp.exp(-2.0 * log_tau_s).T
    pads = [x, y, mask, bt, v_t, gt, ls_t, bgt]
    if external_noise:
        eps, logu = noise
        pads.append(jnp.transpose(eps, (1, 2, 0)))
        pads.append(logu.T)
    pads, Sp = _pad_groups(pads, S, TG)
    x_p, y_p, mask_p, bt_p, v_p, gt_p, ls_p, bgt_p = pads[:8]

    in_specs = [
        pl.BlockSpec((1, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((p, TC), lambda g, c: (0, c)),
    ]
    if external_noise:
        in_specs.append(pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)))
        in_specs.append(pl.BlockSpec((TG, TC), lambda g, c: (g, c)))

    grid = (Sp // TG, C // TC)
    new_bt, new_v, new_gt, alpha = pl.pallas_call(
        _make_mala_kernel(p, external_noise, dense),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Sp, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Sp * n * p + 30 * C * Sp * p + 8 * C * Sp * n,
            bytes_accessed=4 * (Sp * n * p + 2 * Sp * n
                                + 5 * C * Sp * p + 6 * C * Sp),
            transcendentals=C * Sp * (n + 3 * p + 3),
        ),
    )(seed, x_p, y_p, mask_p, bt_p, v_p, gt_p, ls_p, bgt_p, itau2_t,
      *pads[8:])
    return (
        jnp.transpose(new_bt[:S], (2, 0, 1)),
        new_v[:S].T - const[None, :],
        jnp.transpose(new_gt[:S], (2, 0, 1)),
        alpha[:S].T,
    )


# --------------------------------------------------------------- NEWTON --

def _make_newton_kernel(p: int, external_noise: bool, dense: bool,
                        frozen: bool):
  T = p * (p + 1) // 2
  diag_t = [packed_index(k, k) for k in range(p)]

  def _kernel(
    seed_ref,
    x_ref, y_ref, mask_ref,
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) carried loglik (const-free)
    g_ref,                        # (TG, p, TC) carried data-lik grad
    h_ref,                        # (TG, T, TC) carried packed -Hess (lik)
    ls_ref,                       # (TG, TC) log sqrt(c)
    bgs_ref, itau2_ref,           # (TG, p, TC); (p, TC)
    *rest,
  ):
    if external_noise:
        if frozen:
            eps_ref, logu_ref, out_beta_ref, out_v_ref, out_g_ref, \
                out_alpha_ref = rest
        else:
            eps_ref, logu_ref, out_beta_ref, out_v_ref, out_g_ref, \
                out_h_ref, out_alpha_ref = rest
    else:
        if frozen:
            out_beta_ref, out_v_ref, out_g_ref, out_alpha_ref = rest
        else:
            out_beta_ref, out_v_ref, out_g_ref, out_h_ref, \
                out_alpha_ref = rest
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(0) * jnp.int32(1000003)
            + pl.program_id(1) * jnp.int32(7919)
        )
    mix = seed_ref[0, 1]
    beta = [beta_ref[:, k, :] for k in range(p)]          # p x (TG, TC)
    bgs = [bgs_ref[:, k, :] for k in range(p)]
    itau2 = [itau2_ref[k, :][None, :] for k in range(p)]
    sc = jnp.exp(ls_ref[:])
    inv_c = jnp.exp(-2.0 * ls_ref[:])

    db = [beta[k] - bgs[k] for k in range(p)]
    g_old = [g_ref[:, k, :] - db[k] * itau2[k] for k in range(p)]
    h_old = [h_ref[:, t, :] for t in range(T)]
    for k in range(p):
        h_old[diag_t[k]] = h_old[diag_t[k]] + itau2[k]
    L_old = _chol_slices(h_old, p)
    step = _spd_solve_slices(L_old, g_old, p)
    mean_old = [beta[k] + step[k] for k in range(p)]
    if external_noise:
        eps = [eps_ref[:, k, :] for k in range(p)]
    else:
        eps = [_normal(sc.shape, mix) for _ in range(p)]
    shaped = _solve_upper_t_slices(L_old, eps, p)
    prop = [mean_old[k] + sc * shaped[k] for k in range(p)]

    x = x_ref[:]
    prop_arr = jnp.stack(prop, axis=1)                    # (TG, p, TC)
    eta = _eta_vpu(x, prop_arr, p)
    y = y_ref[:][:, :, None]
    m = None if dense else mask_ref[:][:, :, None]
    if frozen:
        ll, resid = _pois_terms(eta, y, m)
    else:
        ll, resid, w = _pois_terms(eta, y, m, need_w=True)
    lik_prop = jnp.sum(ll, axis=1)
    gll = [
        jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)
        for k in range(p)
    ]

    dp = [prop[k] - bgs[k] for k in range(p)]
    g_new = [gll[k] - dp[k] * itau2[k] for k in range(p)]
    if frozen:
        L_new = L_old                                     # constant metric
    else:
        hll = []
        for i in range(p):
            for j in range(i + 1):
                xx = (x[:, :, i] * x[:, :, j])[:, :, None]
                hll.append(jnp.sum(xx * w, axis=1))
        h_new = list(hll)
        for k in range(p):
            h_new[diag_t[k]] = h_new[diag_t[k]] + itau2[k]
        L_new = _chol_slices(h_new, p)
    step_new = _spd_solve_slices(L_new, g_new, p)
    mean_new = [prop[k] + step_new[k] for k in range(p)]

    quad = sum(
        -0.5 * (dp[k] * dp[k] - db[k] * db[k]) * itau2[k] for k in range(p)
    )
    d_delta = lik_prop - v_ref[:] + quad
    w_rev = _lt_vec_slices(
        L_new, [beta[k] - mean_new[k] for k in range(p)], p
    )
    q_quad = 0.5 * (
        sum(e * e for e in eps) - inv_c * sum(r * r for r in w_rev)
    )
    log_alpha = d_delta + q_quad
    if not frozen:
        det_ratio = L_new[diag_t[0]] / L_old[diag_t[0]]
        for k in range(1, p):
            det_ratio = det_ratio * (L_new[diag_t[k]] / L_old[diag_t[k]])
        log_alpha = log_alpha + jnp.log(det_ratio)

    logu = logu_ref[:] if external_noise else jnp.log(
        _uniform_01(log_alpha.shape, mix)
    )
    accept = logu < log_alpha                             # NaN -> reject
    out_v_ref[:] = jnp.where(accept, lik_prop, v_ref[:])
    for k in range(p):
        out_beta_ref[:, k, :] = jnp.where(accept, prop[k], beta[k])
        out_g_ref[:, k, :] = jnp.where(accept, gll[k], g_ref[:, k, :])
    if not frozen:
        for t in range(T):
            out_h_ref[:, t, :] = jnp.where(accept, hll[t], h_ref[:, t, :])
    alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
    out_alpha_ref[:] = jnp.where(jnp.isnan(log_alpha), 0.0, alpha)

  return _kernel


def fused_newton_poisson_step(
    key, beta, v_cache, g_cache, h_cache, log_scale, bg_s, log_tau_s,
    x, y, mask, lgamma_y=None, interpret: bool | None = None, noise=None,
    dense: bool = False, tg: int | None = None, frozen: bool = False,
):
    """One Newton-MH update of the whole subject block in a single kernel.

    Args mirror kernels/newton.py at the nested_poisson call site; frozen
    treats h_cache as a constant metric (KernelConfig.newton_freeze
    sampling phase) and the obs pass drops to MALA cost. Returns
    (new_beta, new_v, new_g, new_h, alpha (C,S)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    external_noise = noise is not None
    C, S, p = beta.shape
    T = p * (p + 1) // 2
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)              # (S,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = tg or _group_tile(
        n, p, TC, S, n_inter=3,
        extra_out=(4 * _r8(p) + 2 * _r8(T) + 4) * _r128(TC) * 4,
        max_tg=16,
    )

    seed = _seed_words(key)
    bt = jnp.transpose(beta, (1, 2, 0))
    gt = jnp.transpose(g_cache, (1, 2, 0))
    ht = jnp.transpose(h_cache, (1, 2, 0))
    bgt = jnp.transpose(bg_s, (1, 2, 0))
    v_t = (v_cache + const[None, :]).T                    # const-free
    ls_t = jnp.broadcast_to(log_scale, (C, S)).T
    itau2_t = jnp.exp(-2.0 * log_tau_s).T
    pads = [x, y, mask, bt, v_t, gt, ht, ls_t, bgt]
    if external_noise:
        eps, logu = noise
        pads.append(jnp.transpose(eps, (1, 2, 0)))
        pads.append(logu.T)
    pads, Sp = _pad_groups(pads, S, TG)
    x_p, y_p, mask_p, bt_p, v_p, gt_p, ht_p, ls_p, bgt_p = pads[:9]

    in_specs = [
        pl.BlockSpec((1, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, T, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((p, TC), lambda g, c: (0, c)),
    ]
    if external_noise:
        in_specs.append(pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)))
        in_specs.append(pl.BlockSpec((TG, TC), lambda g, c: (g, c)))

    grid = (Sp // TG, C // TC)
    out_specs = [
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Sp, p, C), jnp.float32),
        jax.ShapeDtypeStruct((Sp, C), jnp.float32),
        jax.ShapeDtypeStruct((Sp, p, C), jnp.float32),
    ]
    if not frozen:
        out_specs.append(pl.BlockSpec((TG, T, TC), lambda g, c: (g, 0, c)))
        out_shape.append(jax.ShapeDtypeStruct((Sp, T, C), jnp.float32))
    out_specs.append(pl.BlockSpec((TG, TC), lambda g, c: (g, c)))
    out_shape.append(jax.ShapeDtypeStruct((Sp, C), jnp.float32))
    hess_passes = 0 if frozen else 3 * T // 2
    outs = pl.pallas_call(
        _make_newton_kernel(p, external_noise, dense, frozen),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(4 + hess_passes + 3 * p // 2) * C * Sp * n * p
            + 40 * C * Sp * (p * p) + 8 * C * Sp * n,
            bytes_accessed=4 * (Sp * n * p + 2 * Sp * n
                                + C * Sp * (5 * p + (2 if frozen else 4) * T
                                            + 6)),
            transcendentals=C * Sp * (n + 3 * p + 6),
        ),
    )(seed, x_p, y_p, mask_p, bt_p, v_p, gt_p, ht_p, ls_p, bgt_p, itau2_t,
      *pads[9:])
    if frozen:
        new_bt, new_v, new_gt, alpha = outs
        new_h = h_cache
    else:
        new_bt, new_v, new_gt, new_ht, alpha = outs
        new_h = jnp.transpose(new_ht[:S], (2, 0, 1))
    return (
        jnp.transpose(new_bt[:S], (2, 0, 1)),
        new_v[:S].T - const[None, :],
        jnp.transpose(new_gt[:S], (2, 0, 1)),
        new_h,
        alpha[:S].T,
    )
