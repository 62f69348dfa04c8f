"""Fused Bernoulli-logit log-likelihood (and +grad) Pallas TPU kernels.

Computes ll[c, g] = sum_i mask[g,i] * (y[g,i]*eta - softplus(eta)),
eta = x[g,i,:] . beta[c,g,:], over the full chains x groups x obs lattice.

Layout strategy: the chains axis is the hardware lane axis. Inputs are
transposed once outside the kernel to chains-minor layouts —
beta (C,G,p) -> (G,p,C) — so every VMEM tile has a 128-aligned last dim and
the per-group contraction runs as an (n, p) x (p, TC) matmul on the MXU.
The (C, G, n) eta tensor exists only tile-wise in VMEM; HBM sees beta once
and the (G, C) output once (BASELINE.json:5 "fused Pallas kernels over the
chains x groups x observations lattice").

Grid: (G/TG, C/TC), groups-major so the per-group data tiles (x, y, mask)
are revisited (and kept resident) across the inner chain sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn
from jax.experimental import pallas as pl


def _pick_tile(total: int, candidates) -> int:
    for t in candidates:
        if total % t == 0:
            return t
    return total


def _r8(v: int) -> int:
    return ((v + 7) // 8) * 8


def _r128(v: int) -> int:
    return ((v + 127) // 128) * 128


def _group_tile(n: int, p: int, TC: int, G: int,
                n_inter: int = 1, extra_out: int = 0,
                vmem_budget: int = 8 * 1024 * 1024,
                max_tg: int = 64) -> int:
    """Largest group tile whose VMEM working set fits the budget.

    Too-small tiles make the grid long and per-step overhead dominates
    (measured: TG=8 at G=1000 -> 125 grid steps ~ 0.7 ms/call; TG=64 -> 16
    steps). Sizes model the REAL padded (8, 128) f32 tiling of the last two
    dims of every buffer — a (TG, n, p) x-tile occupies r8(n)*128 lanes per
    group however small p is — with double-buffered in/out blocks.

    n_inter: count of (TG, n, TC)-shaped VMEM intermediates (1 for the lik
    kernel's eta; 2 for logp+grad's eta+resid; 2 for the fused MH step).
    extra_out: extra per-group OUTPUT bytes (e.g. the (TG, p, TC) grad).
    """
    x_b = _r8(n) * _r128(p) * 4
    y_b = _r128(n) * 4
    beta_b = _r8(p) * _r128(TC) * 4
    out_b = _r128(TC) * 4
    inter_b = _r8(n) * _r128(TC) * 4
    per_group = (
        2 * (x_b + 2 * y_b + beta_b + out_b + extra_out)  # double-buffered
        + n_inter * inter_b
    )
    tg = max(1, vmem_budget // max(per_group, 1))
    # max_tg bounds Mosaic compile time, which is strongly superlinear in
    # the leading block dim regardless of formulation (measured at G=100k:
    # TG=128 -> 308 s, TG=64 -> 14-25 s, runtime within 20% either way).
    tg = min(tg, max_tg, G)
    return max(8, (tg // 8) * 8)


def _pad_groups(arrs, G, TG):
    """Zero-pad the leading G axis of each array to a TG multiple."""
    Gp = ((G + TG - 1) // TG) * TG
    if Gp == G:
        return arrs, G
    out = []
    for a in arrs:
        pad = [(0, Gp - G)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad))
    return out, Gp


def _eta_vpu(x, b, p: int):
    """eta[g, i, c] = sum_k x[g,i,k] * b[g,k,c] as p VPU multiply-adds.

    For the tiny contraction dims of this workload (p = 2..8) the MXU is
    <6% utilized (K=p of 128) AND Mosaic unrolls the per-group batched dot,
    blowing up compile time superlinearly in the tile size (measured 393 s
    at 240 unrolled dots). p broadcasted fused multiply-adds on the VPU are
    both faster and compile in seconds.
    """
    eta = x[:, :, 0][:, :, None] * b[:, 0, :][:, None, :]
    for k in range(1, p):
        eta = eta + x[:, :, k][:, :, None] * b[:, k, :][:, None, :]
    return eta


def _lik_terms_w(eta, y, m):
    """(ll, resid, w) with w = sigmoid(eta)(1 - sigmoid(eta)) — the
    Newton-MH obs pass. w = e * inv^2 reuses the SAME e = exp(-|eta|) and
    inv = 1/(1+e) as the loglik and residual (symmetric in the sign of eta),
    so the Hessian weights cost zero extra transcendentals."""
    e = jnp.exp(-jnp.abs(eta))
    sp = jnp.maximum(eta, 0.0) + jnp.log1p(e)
    ll = y * eta - sp
    inv = 1.0 / (1.0 + e)
    sig = jnp.where(eta >= 0.0, inv, e * inv)
    resid = y - sig
    w = e * inv * inv
    if m is not None:
        ll = ll * m
        resid = resid * m
        w = w * m
    return ll, resid, w


def _lik_terms(eta, y, m, need_resid: bool = True):
    """Masked Bernoulli-logit log-lik terms (and residuals) from ONE
    exp + ONE log1p.

    nn.softplus lowers through logaddexp (exp + log1p) and nn.sigmoid
    through its own transcendental; evaluating both of them per element
    costs a third transcendental pass the VPU does not need: with
    e = exp(-|eta|),
        softplus(eta) = max(eta, 0) + log1p(e)
        sigmoid(eta)  = 1/(1+e)        (eta >= 0)
                      = e/(1+e)        (eta < 0)
    The hot kernels are transcendental-bound (BASELINE.md roofline), so
    this is a direct kernel-time saving wherever the residual is needed.

    m=None skips the per-element mask multiplies — valid when the caller
    KNOWS the data is fully dense (mask all ones on real rows) and gates
    any padded-group rows on the summed outputs instead.
    """
    e = jnp.exp(-jnp.abs(eta))
    sp = jnp.maximum(eta, 0.0) + jnp.log1p(e)
    ll = y * eta - sp
    if m is not None:
        ll = ll * m
    if not need_resid:
        return ll, None
    inv = 1.0 / (1.0 + e)
    sig = jnp.where(eta >= 0.0, inv, e * inv)
    resid = y - sig
    if m is not None:
        resid = resid * m
    return ll, resid


def _make_loglik_kernel(p: int, dense: bool = False):
    def _loglik_kernel(x_ref, y_ref, mask_ref, beta_ref, out_ref):
        # x (TG, n, p); y, mask (TG, n); beta (TG, p, TC); out (TG, TC)
        eta = _eta_vpu(x_ref[:], beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = None if dense else mask_ref[:][:, :, None]
        ll, _ = _lik_terms(eta, y, m, need_resid=False)
        out = jnp.sum(ll, axis=1)
        if dense:
            # gate padded-group rows (all-zero mask) on the summed output
            out = out * _dense_valid(mask_ref[:])
        out_ref[:] = out

    return _loglik_kernel


def _dense_valid(m2d):
    """(TG, 1) validity for dense-specialized kernels: a padded group row
    has an all-zero mask."""
    return (jnp.sum(m2d, axis=1, keepdims=True) > 0).astype(jnp.float32)


def logistic_loglik_padded_pallas(beta, x, y, mask, interpret: bool | None = None,
                                  dense: bool = False):
    """Same contract as ops.loglik.logistic_loglik_padded: (C,G,p)->(C,G).

    dense=True: caller statically knows mask is all-ones on real rows —
    skips per-element mask multiplies (the kernels are VPU-bound)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G)
    bt = jnp.transpose(beta, (1, 2, 0))  # (G, p, C)
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out = pl.pallas_call(
        _make_loglik_kernel(p, dense),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        ],
        out_specs=pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        out_shape=jax.ShapeDtypeStruct((Gp, C), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * C * Gp * n * p + 4 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n + C * Gp * p
                                + C * Gp),
            transcendentals=C * Gp * n,
        ),
    )(x_p, y_p, mask_p, bt_p)
    return out[:G].T  # (C, G)


def _make_logp_grad_kernel(p: int, dense: bool = False):
    def _logp_grad_kernel(x_ref, y_ref, mask_ref, beta_ref,
                          out_ref, gout_ref):
        # grad[c,g,:] = sum_i mask * x[g,i,:] * (y - sigmoid(eta))
        x = x_ref[:]
        eta = _eta_vpu(x, beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = None if dense else mask_ref[:][:, :, None]
        ll, resid = _lik_terms(eta, y, m)
        valid = _dense_valid(mask_ref[:]) if dense else None
        out = jnp.sum(ll, axis=1)
        out_ref[:] = out * valid if dense else out
        for k in range(p):  # (TG, p, TC) via p VPU reductions
            g = jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)
            gout_ref[:, k, :] = g * valid if dense else g

    return _logp_grad_kernel


def _make_logp_grad_hess_kernel(p: int, dense: bool = False):
    def _kernel(x_ref, y_ref, mask_ref, beta_ref,
                out_ref, gout_ref, hout_ref):
        # hess[c,g,t] = sum_i mask * w * x[g,i,a] * x[g,i,b] for the packed
        # lower-triangle pairs t <-> (a, b) (ops/smallchol layout)
        x = x_ref[:]
        eta = _eta_vpu(x, beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = None if dense else mask_ref[:][:, :, None]
        ll, resid, w = _lik_terms_w(eta, y, m)
        valid = _dense_valid(mask_ref[:]) if dense else None
        out = jnp.sum(ll, axis=1)
        out_ref[:] = out * valid if dense else out
        for k in range(p):
            g = jnp.sum(x[:, :, k][:, :, None] * resid, axis=1)
            gout_ref[:, k, :] = g * valid if dense else g
        t = 0
        for i in range(p):
            for j in range(i + 1):
                xx = (x[:, :, i] * x[:, :, j])[:, :, None]  # (TG, n, 1)
                h = jnp.sum(xx * w, axis=1)
                hout_ref[:, t, :] = h * valid if dense else h
                t += 1

    return _kernel


def logistic_logp_grad_hess_pallas(beta, x, y, mask,
                                   interpret: bool | None = None,
                                   dense: bool = False,
                                   tg: int | None = None):
    """Fused value+grad+packed-negative-Hessian for Newton-MH:
    ((C,G), (C,G,p), (C,G,T)) in ONE obs pass, T = p(p+1)/2.

    Parity contract: ops.loglik.logistic_logp_grad_hess_padded. The Hessian
    weights share the gradient's transcendentals (see _lik_terms_w); the
    incremental cost is T reduction passes over the (TG, n, TC) tile —
    arithmetic only, under the kernel's transcendental roofline.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    T = p * (p + 1) // 2
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    # default budget -> TG=24 at the judged shape: measured on v5e both
    # safe (TG=40 from a 12 MB budget hits the 16 MB scoped-vmem limit:
    # 24.77M requested) and flat-optimal (628/642/651 us at TG=8/16/24 —
    # the kernel is compute-bound in the T reduction passes, not grid-bound)
    TG = tg or _group_tile(
        n, p, TC, G, n_inter=3,
        extra_out=(_r8(p) + _r8(T)) * _r128(TC) * 4, max_tg=24,
    )
    bt = jnp.transpose(beta, (1, 2, 0))
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out, gout, hout = pl.pallas_call(
        _make_logp_grad_hess_kernel(p, dense),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, T, TC), lambda g, c: (g, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, T, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(4 + 3 * (T + p) // 2) * C * Gp * n * p
            + 8 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + C * Gp * (1 + p + T) + C * Gp * p),
            transcendentals=2 * C * Gp * n,
        ),
    )(x_p, y_p, mask_p, bt_p)
    return (
        out[:G].T,
        jnp.transpose(gout[:G], (2, 0, 1)),
        jnp.transpose(hout[:G], (2, 0, 1)),
    )


def logistic_logp_grad_pallas(beta, x, y, mask, interpret: bool | None = None,
                              dense: bool = False):
    """Fused value+grad for MALA: ((C,G), (C,G,p)) in one pass over obs.

    Saves the second obs-axis pass (and eta rematerialization) that
    jax.vjp of the jnp path would do (BASELINE.json:11). dense=True as in
    :func:`logistic_loglik_padded_pallas`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G, n_inter=2,
                     extra_out=_r8(p) * _r128(TC) * 4, max_tg=64)
    bt = jnp.transpose(beta, (1, 2, 0))
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out, gout = pl.pallas_call(
        _make_logp_grad_kernel(p, dense),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * C * Gp * n * p + 6 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 2 * C * Gp * p + C * Gp),
            transcendentals=2 * C * Gp * n,
        ),
    )(x_p, y_p, mask_p, bt_p)
    return out[:G].T, jnp.transpose(gout[:G], (2, 0, 1))
