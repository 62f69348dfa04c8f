"""Fused Poisson-log log-likelihood Pallas TPU kernel.

ll[c, g] = sum_i mask[g,i]*(y*eta - exp(eta)) - const_g,
const_g = sum_i mask[g,i]*lgamma(y+1) (parameter-independent, folded into a
per-group scalar outside the kernel instead of streaming the lgamma table
every sweep). Same layout strategy as loglik_logistic.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.scipy.special import gammaln

from nestmc.ops.pallas.loglik_logistic import (
    _eta_vpu,
    _group_tile,
    _pad_groups,
    _pick_tile,
    _r8,
    _r128,
)


def _make_poisson_kernel(p: int):
    def _poisson_kernel(x_ref, y_ref, mask_ref, beta_ref, out_ref):
        eta = _eta_vpu(x_ref[:], beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = mask_ref[:][:, :, None]
        ll = (y * eta - jnp.exp(eta)) * m
        out_ref[:] = jnp.sum(ll, axis=1)

    return _poisson_kernel


def poisson_loglik_padded_pallas(
    beta, x, y, mask, lgamma_y=None, interpret: bool | None = None
):
    """Same contract as ops.loglik.poisson_loglik_padded: (C,G,p)->(C,G)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)  # (G,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G)
    bt = jnp.transpose(beta, (1, 2, 0))
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out = pl.pallas_call(
        _make_poisson_kernel(p),
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
    return out[:G].T - const[None, :]


def _make_poisson_grad_kernel(p: int):
    def _kernel(x_ref, y_ref, mask_ref, beta_ref, out_ref, gout_ref):
        # grad[c,g,:] = sum_i mask * x[g,i,:] * (y - exp(eta))
        x = x_ref[:]
        eta = _eta_vpu(x, beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = mask_ref[:][:, :, None]
        rate = jnp.exp(eta)
        out_ref[:] = jnp.sum((y * eta - rate) * m, axis=1)
        resid = (y - rate) * m
        for k in range(p):
            gout_ref[:, k, :] = jnp.sum(
                x[:, :, k][:, :, None] * resid, axis=1
            )

    return _kernel


def _make_poisson_vgh_kernel(p: int):
    T = p * (p + 1) // 2

    def _kernel(x_ref, y_ref, mask_ref, beta_ref, out_ref, gout_ref,
                hout_ref):
        # Newton obs pass: loglik + grad + packed -Hessian. The Poisson
        # curvature w = exp(eta) IS the rate the loglik/grad already
        # computed — the Hessian costs p(p+1)/2 extra multiply-add
        # reduction passes and zero extra transcendentals.
        x = x_ref[:]
        eta = _eta_vpu(x, beta_ref[:], p)  # (TG, n, TC)
        y = y_ref[:][:, :, None]
        m = mask_ref[:][:, :, None]
        rate = jnp.exp(eta)
        out_ref[:] = jnp.sum((y * eta - rate) * m, axis=1)
        resid = (y - rate) * m
        for k in range(p):
            gout_ref[:, k, :] = jnp.sum(
                x[:, :, k][:, :, None] * resid, axis=1
            )
        w = rate * m
        t = 0
        for i in range(p):
            for j in range(i + 1):
                xx = (x[:, :, i] * x[:, :, j])[:, :, None]
                hout_ref[:, t, :] = jnp.sum(xx * w, axis=1)
                t += 1

    return _kernel


def poisson_logp_grad_hess_pallas(
    beta, x, y, mask, lgamma_y=None, interpret: bool | None = None
):
    """Fused value+grad+packed-Hessian of the Poisson-log likelihood —
    the Newton-MH obs pass (same contract as
    ops.loglik.poisson_logp_grad_hess_padded): ((C, G), (C, G, p),
    (C, G, T)) in one pass over the obs axis."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    T = p * (p + 1) // 2
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)  # (G,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G, n_inter=3,
                     extra_out=(_r8(p) + _r8(T)) * _r128(TC) * 4, max_tg=32)
    bt = jnp.transpose(beta, (1, 2, 0))
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out, gout, hout = pl.pallas_call(
        _make_poisson_vgh_kernel(p),
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
            flops=(4 + 3 * T // 2) * C * Gp * n * p + 6 * C * Gp * n,
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 2 * C * Gp * p + C * Gp * (T + 1)),
            transcendentals=C * Gp * n,
        ),
    )(x_p, y_p, mask_p, bt_p)
    return (
        out[:G].T - const[None, :],
        jnp.transpose(gout[:G], (2, 0, 1)),
        jnp.transpose(hout[:G], (2, 0, 1)),
    )


def poisson_logp_grad_pallas(
    beta, x, y, mask, lgamma_y=None, interpret: bool | None = None
):
    """Fused value+grad of the Poisson-log likelihood for MALA:
    ((C, G), (C, G, p)) in one pass over the obs axis."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    n = x.shape[1]
    if lgamma_y is None:
        lgamma_y = gammaln(y + 1.0)
    const = jnp.sum(lgamma_y * mask, axis=1)  # (G,)
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G, n_inter=2,
                     extra_out=_r8(p) * _r128(TC) * 4, max_tg=64)
    bt = jnp.transpose(beta, (1, 2, 0))
    (x_p, y_p, mask_p, bt_p), Gp = _pad_groups([x, y, mask, bt], G, TG)

    grid = (Gp // TG, C // TC)
    out, gout = pl.pallas_call(
        _make_poisson_grad_kernel(p),
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
            transcendentals=C * Gp * n,
        ),
    )(x_p, y_p, mask_p, bt_p)
    return out[:G].T - const[None, :], jnp.transpose(gout[:G], (2, 0, 1))
