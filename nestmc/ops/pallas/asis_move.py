"""Single-kernel ASIS interweaving move (eval + in-kernel accept + select).

Merges ops/pallas/sweep_logistic.py's asis_eval_t + asis_select_t into ONE
pallas_call with a (chain-tile, pass, group-tile) grid:

  pass 0  rescale beta' = mu + r (beta - mu), one obs pass for the
          log-likelihood AND its grad, both parked in VMEM scratch; the
          per-chain sum of likelihood deltas accumulates in scratch, and
          at the last group tile the MH accept decision is taken IN-KERNEL
          (the prior delta and the log-uniform draw arrive as operands —
          they are O(C) jnp work outside).
  pass 1  re-reads the carry blocks, recomputes the rescale, and writes
          the per-chain accept/reject select of (beta, loglik, grad).

Why: stage profiling (benchmarks/sweep_profile.py) showed the separate
select kernel costs ~140 us/call of which ~100 us is dispatch/grid
overhead, with the whole sweep likelihood-kernel-bound — merging removes
one kernel launch and the HBM round trip of the rescaled likelihood/grad
(they never leave VMEM). The kernel is fully deterministic (noise arrives
as operands), so exact parity against the eval+select composition holds
bitwise-ish on CPU interpret as well.

Grid-visit subtlety: the big outputs are only written in pass 1; their
index map sends every pass-0 visit to block 0 so the single garbage flush
at the pass transition is immediately overwritten by pass 1's first real
write.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nestmc.ops.pallas.loglik_logistic import (
    _eta_vpu,
    _lik_terms,
    _r8,
    _r128,
)
from nestmc.ops.pallas.sweep_logistic import _tile_pow2, _valid_from_mask


def _make_asis_move_kernel(p: int, TG: int, NG: int, dense: bool):
  def _kernel(
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    v_ref,                        # (TG, TC) current data loglik
    g_ref,                        # (TG, p, TC) current data-lik grad
    mu_ref, ratio_ref,            # (p, TC)
    pdelta_ref, logu_ref,         # (1, TC) prior delta / log-uniform
    out_beta_ref, out_v_ref, out_g_ref,   # selected carry
    out_alpha_ref, out_acc_ref,           # (1, TC)
    lik_s, g_s, dsum_s,           # VMEM scratch
  ):
    s = pl.program_id(1)
    g = pl.program_id(2)
    beta = beta_ref[:]
    mu = mu_ref[:][None, :, :]
    ratio = ratio_ref[:][None, :, :]
    bnew = mu + ratio * (beta - mu)                       # (TG, p, TC)
    m2d = mask_ref[:]
    valid = _valid_from_mask(m2d)                         # (TG, 1)

    @pl.when(s == 0)
    def _eval():
        @pl.when(g == 0)
        def _init():
            dsum_s[:] = jnp.zeros_like(dsum_s)

        x = x_ref[:]
        eta = _eta_vpu(x, bnew, p)
        y = y_ref[:][:, :, None]
        m = None if dense else m2d[:, :, None]
        ll, resid = _lik_terms(eta, y, m)
        lik_new = jnp.sum(ll, axis=1) * valid             # (TG, TC)
        lik_s[pl.ds(g * TG, TG), :] = lik_new
        for k in range(p):
            g_s[pl.ds(g * TG, TG), k, :] = (
                jnp.sum(x[:, :, k][:, :, None] * resid, axis=1) * valid
            )
        dsum_s[:] = dsum_s[:] + jnp.sum(
            lik_new - v_ref[:], axis=0, keepdims=True
        )

        @pl.when(g == NG - 1)
        def _decide():
            log_alpha = dsum_s[:] + pdelta_ref[:]         # (1, TC)
            acc = (logu_ref[:] < log_alpha).astype(jnp.float32)
            out_acc_ref[:] = acc                          # NaN -> 0.0
            alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
            out_alpha_ref[:] = jnp.where(
                jnp.isnan(log_alpha), 0.0, alpha
            )
            dsum_s[:] = acc  # reuse the accumulator to carry the accept

    @pl.when(s == 1)
    def _select():
        # dsum_s holds the (1, TC) accept after pass 0; gate by group
        # validity so pad rows stay exactly zero
        acc2 = dsum_s[:] * valid                          # (TG, TC)
        acc3 = acc2[:, None, :]                           # (TG, 1, TC)
        lik_new = lik_s[pl.ds(g * TG, TG), :]
        out_beta_ref[:] = beta + acc3 * (bnew - beta)
        out_v_ref[:] = v_ref[:] + acc2 * (lik_new - v_ref[:])
        out_g_ref[:] = g_ref[:] + acc3 * (
            g_s[pl.ds(g * TG, TG), :, :] - g_ref[:]
        )

  return _kernel


def asis_move_t(beta_t, v_t, g_t, mu_t, ratio_t, prior_delta, logu,
                x, y, mask, interpret: bool | None = None,
                dense: bool = False):
    """One-launch ASIS move over transposed, group-padded operands.

    prior_delta, logu: (C,) — the O(C) pieces of the accept statistic
    computed outside (tiny jnp). Returns (new_beta_t, new_v_t, new_g_t,
    alpha (C,), accept (C,) float).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Gp, p, C = beta_t.shape
    n = x.shape[1]
    # TC=128 bounds the g_new scratch at (Gp, r8(p), 128) f32
    TC = 128 if C % 128 == 0 else (C if C < 128 else 64)
    TG = _tile_pow2(
        n, p, TC, Gp, n_inter=2,
        extra_out=5 * _r8(p) * _r128(TC) * 4 + 3 * _r128(TC) * 4,
        max_tg=64,
    )
    assert Gp % TG == 0, (Gp, TG)
    NG = Gp // TG
    pd = prior_delta.reshape(1, C).astype(jnp.float32)
    lu = logu.reshape(1, C).astype(jnp.float32)

    grid = (C // TC, 2, NG)
    big_out = lambda c, s, g: (g * s, c)  # noqa: E731 — pass 0 -> block 0
    small = lambda c, s, g: (0, c)        # noqa: E731
    new_bt, new_v, new_gt, alpha, acc = pl.pallas_call(
        _make_asis_move_kernel(p, TG, NG, dense),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n, p), lambda c, s, g: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda c, s, g: (g, 0)),
            pl.BlockSpec((TG, n), lambda c, s, g: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda c, s, g: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda c, s, g: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda c, s, g: (g, 0, c)),
            pl.BlockSpec((p, TC), small),
            pl.BlockSpec((p, TC), small),
            pl.BlockSpec((1, TC), small),
            pl.BlockSpec((1, TC), small),
        ],
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda c, s, g: (g * s, 0, c)),
            pl.BlockSpec((TG, TC), big_out),
            pl.BlockSpec((TG, p, TC), lambda c, s, g: (g * s, 0, c)),
            pl.BlockSpec((1, TC), small),
            pl.BlockSpec((1, TC), small),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Gp, TC), jnp.float32),
            pltpu.VMEM((Gp, p, TC), jnp.float32),
            pltpu.VMEM((1, TC), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Gp * n * p + 20 * C * Gp * p + 8 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 4 * C * Gp * p + 3 * C * Gp),
            transcendentals=2 * C * Gp * n,
        ),
    )(x, y, mask, beta_t, v_t, g_t, mu_t, ratio_t, pd, lu)
    return new_bt, new_v, new_gt, alpha[0], acc[0]
