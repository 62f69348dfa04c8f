"""Fused-sweep Pallas kernels for the hierarchical-logistic model.

The round-1 roofline (BASELINE.md) showed the judged sweep PER-OP-LATENCY
bound: ~100 XLA ops in a sequential Gibbs dependency chain, 5-10x above
HBM speed-of-light. The single-kernel MALA beta step (mala_accept.py)
removed the beta update's elementwise chain but kept paying 4+ full
(C,G,p) transposes per sweep (the kernels want chains-minor layouts) plus
the ASIS interweaving move's ~25-op jnp chain and the O(C G p) sufficient-
statistic reductions for the conjugate hyper draws.

These kernels eliminate all of that by keeping the sweep state chains-minor
(beta/grad (G,p,C), loglik (G,C)) ACROSS sweeps (kernels/../models/
hier_logistic_fused.py owns the carry layout) and fusing whole sweep
stages:

  fused_mala_suff_step_t   MALA propose+logp+grad+correct+accept+select in
                           one pass, PLUS the post-update sufficient stats
                           s1 = sum_g beta, s2 = sum_g beta^2 accumulated
                           over group tiles in VMEM — the conjugate mu/tau
                           draws then cost O(C p) with no big reduction op.
  asis_eval_t              the ASIS rescale beta' = mu + r (beta - mu),
                           its log-lik + grad in one obs pass, and the
                           per-chain sum of likelihood deltas accumulated
                           over group tiles (the move's accept statistic).
  asis_select_t            the per-chain accept/reject select of (beta,
                           loglik, grad) in one elementwise pass; the
                           rescaled proposal is recomputed on the fly
                           instead of round-tripping through HBM.

All operands arrive ALREADY padded to a group-tile multiple and already
transposed; there is deliberately no padding or transposition in these
wrappers — the caller keeps its carry in this layout permanently. Grids
put the group axis innermost so accumulator output blocks are revisited
consecutively (the TPU-legal accumulation pattern). Group validity is
derived from the obs mask (a padded group has an all-zero mask row), and
every output of a padded group row is forced to zero so pad rows stay
exactly constant across sweeps (streaming R-hat then reports 0 for them).

Statistical contract: identical math to kernels/mala.py + the asis_tau
move in models/hier_logistic.py (cited per stage below); exact-parity
tested with external noise (tests/test_fused_sweep.py), statistically
tested on-chip.
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
    _pick_tile,
    _r8,
    _r128,
)
from nestmc.ops.pallas.mh_accept import _normal, _seed_words, _uniform_01


# The fused-sweep carry keeps its group axis padded to this multiple, so
# every kernel's (power-of-2) group tile divides the padded extent and no
# padding happens per sweep.
PAD_MULTIPLE = 64


def pad_groups_to_multiple(x, G: int):
    """Zero-pad the leading (group) axis from G to the PAD_MULTIPLE."""
    Gp = padded_num_groups(G)
    if Gp == G:
        return x
    return jnp.pad(x, [(0, Gp - G)] + [(0, 0)] * (x.ndim - 1))


def padded_num_groups(G: int) -> int:
    return ((G + PAD_MULTIPLE - 1) // PAD_MULTIPLE) * PAD_MULTIPLE


def _tile_pow2(n, p, TC, Gp, n_inter=1, extra_out=0, max_tg=64):
    """Largest power-of-2 group tile within the VMEM budget (so it divides
    the PAD_MULTIPLE-padded group extent)."""
    tg = _group_tile(n, p, TC, Gp, n_inter=n_inter, extra_out=extra_out,
                     max_tg=max_tg)
    pw = 8
    while pw * 2 <= tg and pw * 2 <= max_tg:
        pw *= 2
    return min(pw, Gp)


def _valid_from_mask(m):
    """(TG, 1) 1.0 where the group tile row is a real group (mask not all
    zero). Padded group rows have an all-zero mask by construction."""
    return (jnp.sum(m, axis=1, keepdims=True) > 0).astype(jnp.float32)


def _make_mala_suff_kernel(p: int, external_noise: bool, dense: bool):
  """MALA step + suff-stat accumulation; math = mala_accept.py kernel
  (itself exact-parity tested against kernels/mala.py:58-146)."""
  def _kernel(
    seed_ref,                     # (1, 2) int32 in SMEM [seed, mix]
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) carried data-loglik of beta
    g_ref,                        # (TG, p, TC) carried data-lik grad
    ls_ref,                       # (TG, TC) log proposal scales
    mu_ref, itau2_ref,            # (p, TC) chains-minor hyper state
    *rest,                        # [eps_ref, logu_ref,] outputs
  ):
    if external_noise:
        eps_ref, logu_ref, out_beta_ref, out_v_ref, out_g_ref, \
            out_alpha_ref, s1_ref, s2_ref = rest
    else:
        out_beta_ref, out_v_ref, out_g_ref, out_alpha_ref, \
            s1_ref, s2_ref = rest
        pltpu.prng_seed(
            seed_ref[0, 0]
            + pl.program_id(1) * jnp.int32(1000003)
            + pl.program_id(0) * jnp.int32(7919)
        )
    mix = seed_ref[0, 1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    beta = beta_ref[:]                                    # (TG, p, TC)
    mu = mu_ref[:][None, :, :]                            # (1, p, TC)
    itau2 = itau2_ref[:][None, :, :]
    s = jnp.exp(ls_ref[:])[:, None, :]                    # (TG, 1, TC)
    s2 = s * s

    db = beta - mu
    g_old = g_ref[:] - db * itau2                         # full-cond grad
    eps = eps_ref[:] if external_noise else _normal(beta.shape, mix)
    prop = beta + 0.5 * s2 * g_old + s * eps

    x = x_ref[:]
    m2d = mask_ref[:]
    eta = _eta_vpu(x, prop, p)                            # (TG, n, TC)
    y = y_ref[:][:, :, None]
    m = None if dense else m2d[:, :, None]
    ll, resid = _lik_terms(eta, y, m)     # one exp+log1p for both terms
    lik_prop = jnp.sum(ll, axis=1)
    gll = [
        jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)   # (TG, TC)
        for k in range(p)
    ]

    dp = prop - mu
    d_delta = (
        lik_prop - v_ref[:]
        + jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=1)
    )
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
    valid = _valid_from_mask(m2d)                         # (TG, 1)
    v3 = valid[:, :, None]                                # (TG, 1, 1)
    new_beta = jnp.where(acc3, prop, beta) * v3
    out_beta_ref[:] = new_beta
    out_v_ref[:] = jnp.where(accept, lik_prop, v_ref[:]) * valid
    for k in range(p):
        out_g_ref[:, k, :] = (
            jnp.where(accept, gll[k], g_ref[:, k, :]) * valid
        )
    alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
    out_alpha_ref[:] = jnp.where(jnp.isnan(log_alpha), 0.0, alpha) * valid

    # suff stats of the POST-update beta (pad rows already zeroed);
    # reduce the 3D tile over its leading dim directly — a 2D slice
    # [:, k, :] has a sublane-offset layout Mosaic refuses to ADD-reduce
    # ("input layout must have zero offsets over dimensions being reduced")
    s1_ref[:] = s1_ref[:] + jnp.sum(new_beta, axis=0)
    s2_ref[:] = s2_ref[:] + jnp.sum(new_beta * new_beta, axis=0)

  return _kernel


def fused_mala_suff_step_t(
    key, beta_t, v_t, g_t, ls_t, mu_t, itau2_t, x, y, mask,
    interpret: bool | None = None, noise=None, dense: bool = False,
):
    """One MALA update of the whole group block + suff stats, transposed
    operands, zero host-side layout work.

    beta_t, g_t: (Gp, p, C); v_t, ls_t: (Gp, C); mu_t, itau2_t: (p, C);
    x (Gp, n, p), y/mask (Gp, n) — all group-padded to a TG multiple with
    zero rows. noise: None (on-core PRNG) or (eps_t (Gp,p,C), logu_t
    (Gp,C)) for exact-parity testing.
    Returns (new_beta_t, new_v_t, new_g_t, alpha_t (Gp,C), s1 (p,C),
    s2 (p,C)); padded rows of every per-group output are zero.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    external_noise = noise is not None
    Gp, p, C = beta_t.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _tile_pow2(
        n, p, TC, Gp, n_inter=2,
        extra_out=6 * _r8(p) * _r128(TC) * 4 + 3 * _r128(TC) * 4,
        max_tg=64,
    )
    assert Gp % TG == 0, (Gp, TG)

    seed = _seed_words(key)

    in_specs = [
        pl.BlockSpec((1, 2), lambda c, g: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((TG, n, p), lambda c, g: (g, 0, 0)),
        pl.BlockSpec((TG, n), lambda c, g: (g, 0)),
        pl.BlockSpec((TG, n), lambda c, g: (g, 0)),
        pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
        pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
        pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
        pl.BlockSpec((p, TC), lambda c, g: (0, c)),
        pl.BlockSpec((p, TC), lambda c, g: (0, c)),
    ]
    ops = [seed, x, y, mask, beta_t, v_t, g_t, ls_t, mu_t, itau2_t]
    if external_noise:
        eps_t, logu_t = noise
        in_specs.append(pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)))
        in_specs.append(pl.BlockSpec((TG, TC), lambda c, g: (g, c)))
        ops += [eps_t, logu_t]

    # group axis INNERMOST: the (p, TC) suff-stat blocks are revisited on
    # consecutive grid steps and accumulate in VMEM (one HBM write each).
    grid = (C // TC, Gp // TG)
    return pl.pallas_call(
        _make_mala_suff_kernel(p, external_noise, dense),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
            pl.BlockSpec((p, TC), lambda c, g: (0, c)),
            pl.BlockSpec((p, TC), lambda c, g: (0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((p, C), jnp.float32),
            jax.ShapeDtypeStruct((p, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Gp * n * p + 34 * C * Gp * p + 10 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 4 * C * Gp * p + 6 * C * Gp),
            transcendentals=C * Gp * (2 * n + 3 * p + 3),
        ),
    )(*ops)


def _make_asis_eval_kernel(p: int, dense: bool):
  """ASIS rescale + loglik/grad + delta accumulation; math mirrors
  models/hier_logistic.py asis_tau_move (rescale + one obs pass)."""
  def _kernel(
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) current data loglik
    mu_ref, ratio_ref,            # (p, TC)
    out_lik_ref,                  # (TG, TC) loglik of rescaled beta
    out_g_ref,                    # (TG, p, TC) grad of rescaled beta
    dsum_ref,                     # (1, TC) sum_g (lik_new - lik_old)
  ):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dsum_ref[:] = jnp.zeros_like(dsum_ref)

    beta = beta_ref[:]
    mu = mu_ref[:][None, :, :]
    ratio = ratio_ref[:][None, :, :]
    bnew = mu + ratio * (beta - mu)                       # (TG, p, TC)

    x = x_ref[:]
    m2d = mask_ref[:]
    eta = _eta_vpu(x, bnew, p)
    y = y_ref[:][:, :, None]
    m = None if dense else m2d[:, :, None]
    ll, resid = _lik_terms(eta, y, m)     # one exp+log1p for both terms
    lik_new = jnp.sum(ll, axis=1)
    valid = _valid_from_mask(m2d)                         # (TG, 1)
    lik_new = lik_new * valid
    out_lik_ref[:] = lik_new
    for k in range(p):
        out_g_ref[:, k, :] = (
            jnp.sum(x[:, :, k][:, :, None] * resid, axis=1) * valid
        )
    dsum_ref[:] = dsum_ref[:] + jnp.sum(
        lik_new - v_ref[:], axis=0, keepdims=True
    )

  return _kernel


def asis_eval_t(beta_t, v_t, mu_t, ratio_t, x, y, mask,
                interpret: bool | None = None, dense: bool = False):
    """Rescaled-likelihood pass of the ASIS move, transposed operands.

    Returns (lik_new_t (Gp,C), g_new_t (Gp,p,C), dsum (1,C)); dsum is the
    per-chain sum over groups of (lik_new - lik_old), the data part of the
    move's log acceptance ratio.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Gp, p, C = beta_t.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _tile_pow2(
        n, p, TC, Gp, n_inter=2,
        extra_out=2 * _r8(p) * _r128(TC) * 4 + 2 * _r128(TC) * 4,
        max_tg=64,
    )
    assert Gp % TG == 0, (Gp, TG)
    grid = (C // TC, Gp // TG)
    return pl.pallas_call(
        _make_asis_eval_kernel(p, dense),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n, p), lambda c, g: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda c, g: (g, 0)),
            pl.BlockSpec((TG, n), lambda c, g: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
            pl.BlockSpec((p, TC), lambda c, g: (0, c)),
            pl.BlockSpec((p, TC), lambda c, g: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((TG, TC), lambda c, g: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda c, g: (g, 0, c)),
            pl.BlockSpec((1, TC), lambda c, g: (0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Gp * n * p + 10 * C * Gp * p + 8 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 2 * C * Gp * p + 2 * C * Gp),
            transcendentals=2 * C * Gp * n,
        ),
    )(x, y, mask, beta_t, v_t, mu_t, ratio_t)


def _make_asis_select_kernel(p: int):
  def _kernel(
    mask_ref,                     # (TG, n) — group-validity source
    beta_ref, v_ref, g_ref,       # current (TG,p,TC), (TG,TC), (TG,p,TC)
    lik_new_ref, g_new_ref,       # rescaled-eval outputs
    mu_ref, ratio_ref,            # (p, TC)
    acc_ref,                      # (1, TC) 1.0 where the chain accepted
    out_beta_ref, out_v_ref, out_g_ref,
  ):
    valid = _valid_from_mask(mask_ref[:])                 # (TG, 1)
    acc = acc_ref[:][None, :, :] * valid[:, :, None]      # (TG, 1, TC)
    beta = beta_ref[:]
    mu = mu_ref[:][None, :, :]
    ratio = ratio_ref[:][None, :, :]
    # recompute the rescale instead of storing beta' in asis_eval_t:
    # 2p flops/element beats an (Gp, p, C) HBM round trip. The accept
    # blend is gated by group validity so pad rows (beta = 0 but
    # bnew = mu(1-ratio) != 0) stay exactly zero.
    bnew = mu + ratio * (beta - mu)
    out_beta_ref[:] = beta + acc * (bnew - beta)
    acc2 = acc_ref[:] * valid
    out_v_ref[:] = v_ref[:] + acc2 * (lik_new_ref[:] - v_ref[:])
    out_g_ref[:] = g_ref[:] + acc * (g_new_ref[:] - g_ref[:])

  return _kernel


def asis_select_t(beta_t, v_t, g_t, lik_new_t, g_new_t, mu_t, ratio_t,
                  accept_c, mask, interpret: bool | None = None):
    """Apply the per-chain ASIS accept to (beta, loglik, grad) in one pass.

    accept_c: (1, C) float (1.0 accept / 0.0 reject). The blend is gated
    by group validity (from ``mask``) so padded group rows stay exactly
    zero across sweeps.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Gp, p, C = beta_t.shape
    n = mask.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    # elementwise only: budget by buffer count (9 blocks of (TG,p,TC))
    TG = _tile_pow2(
        n, p, TC, Gp, n_inter=0,
        extra_out=7 * _r8(p) * _r128(TC) * 4 + 4 * _r128(TC) * 4,
        max_tg=64,
    )
    assert Gp % TG == 0, (Gp, TG)
    grid = (Gp // TG, C // TC)
    return pl.pallas_call(
        _make_asis_select_kernel(p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((p, TC), lambda g, c: (0, c)),
            pl.BlockSpec((p, TC), lambda g, c: (0, c)),
            pl.BlockSpec((1, TC), lambda g, c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * C * Gp * p,
            bytes_accessed=4 * (5 * C * Gp * p + 4 * C * Gp + Gp * n),
            transcendentals=0,
        ),
    )(mask, beta_t, v_t, g_t, lik_new_t, g_new_t, mu_t, ratio_t, accept_c)
