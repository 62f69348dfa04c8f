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
