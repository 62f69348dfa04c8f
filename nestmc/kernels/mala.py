"""Batched MALA (Metropolis-adjusted Langevin) block update — BASELINE.json:11.

Proposal: v' = v + (s^2/2) * grad log pi(v) + s * eps, with the asymmetric-
proposal MH correction. Gradients come from the model's fused
``cond_value_and_grad`` (Pallas log-density+grad kernel) when present, else
from one ``jax.vjp`` through the jnp conditional — forward once, backward
once, per-unit values preserved for the per-unit accept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nestmc.kernels.rwmh import (
    accept_prob,
    as_cu,
    bcast_over_unit_shape,
    select_accepted,
)
from nestmc.model import Block, ModelSpec


def cond_value_and_grad(model: ModelSpec, name, value, position, data):
    """((C, U) or (C,), value-shaped grad) of the block conditional.

    Uses the model's fused implementation when it provides one for this
    block (returns non-None); otherwise one jax.vjp through the jnp path.
    """
    if model.cond_value_and_grad is not None:
        fused = model.cond_value_and_grad(name, value, position, data)
        if fused is not None:
            return fused

    def f(v):
        return model.cond_logdensity(name, v, position, data)

    out, vjp = jax.vjp(f, value)
    (g,) = vjp(jnp.ones_like(out))
    return out, g


def _sq_norm_per_unit(x, block: Block):
    """Sum of squares over per-unit parameter dims -> (C, U)."""
    axes = tuple(range(2 if block.units else 1, x.ndim))
    r = jnp.sum(x * x, axis=axes) if axes else x * x
    return r if block.units else r[:, None]


def _whiten(r, chol):
    """L^{-1} r over the trailing unit dim (batched triangular solve)."""
    z = jax.lax.linalg.triangular_solve(
        chol, r[..., None], left_side=True, lower=True
    )
    return z[..., 0]


def mala_update(key, block: Block, model: ModelSpec, position, log_scale,
                pstd, data, cache=None):
    """One MALA update of ``block`` for all chains (and units).

    ``pstd`` acts as a mass matrix: diagonal (value-shaped std, M = pstd^2)
    or FULL (per-(chain, unit) lower-Cholesky factor L with one extra
    trailing matrix dim, M = L L^T — the Haario EMA covariance). Proposal
    v' = v + (s^2/2) M g + s L eps; the correction uses the M^{-1}-weighted
    norm, computed as ||L^{-1} r||^2 via a batched triangular solve (the
    unit dim is tiny, p = 2..8, so the solves are cheap VPU work).

    ``cache``: optional {'v': (C,U), 'g': value-shaped} carried (logp, grad)
    of the SELF-CONTAINED conditional part (ModelSpec.cond_cached_grad) at
    the current value — halves likelihood+grad evaluations per update.
    """
    value = position[block.name]
    k_eps, k_u = jax.random.split(key)
    s = bcast_over_unit_shape(jnp.exp(log_scale), block)
    s2 = s * s
    full = pstd is not None and pstd.ndim == value.ndim + 1
    if full:
        mm = jnp.einsum("...ij,...kj->...ik", pstd, pstd)  # L L^T

        def m_apply(g):
            return jnp.einsum("...ij,...j->...i", mm, g)

        def shape_noise(e):
            return jnp.einsum("...ij,...j->...i", pstd, e)
    else:
        m = jnp.ones_like(value) if pstd is None else pstd * pstd

        def m_apply(g):
            return m * g

        def shape_noise(e):
            return e if pstd is None else pstd * e

    if cache is not None:
        self_vag, rest_vag = model.cond_cached_grad[block.name]
        rv_old, rg_old = rest_vag(value, position, data)
        d_old = cache["v"] + as_cu(rv_old, block)
        g_old = cache["g"] + rg_old
    else:
        d_old, g_old = cond_value_and_grad(
            model, block.name, value, position, data
        )
        d_old = as_cu(d_old, block)
    eps = jax.random.normal(k_eps, value.shape, value.dtype)
    prop = value + 0.5 * s2 * m_apply(g_old) + s * shape_noise(eps)

    if cache is not None:
        sv_new, sg_new = self_vag(prop, data)
        sv_new = as_cu(sv_new, block)
        rv_new, rg_new = rest_vag(prop, position, data)
        d_new = sv_new + as_cu(rv_new, block)
        g_new = sg_new + rg_new
    else:
        d_new, g_new = cond_value_and_grad(
            model, block.name, prop, position, data
        )
        d_new = as_cu(d_new, block)

    # log q(a | b) = -||a - b - (s^2/2) M g(b)||_{M^-1}^2 / (2 s^2) + const
    fwd = prop - value - 0.5 * s2 * m_apply(g_old)   # = s L eps
    rev = value - prop - 0.5 * s2 * m_apply(g_new)
    if full:
        log_q_fwd = -_sq_norm_per_unit(_whiten(fwd, pstd), block)
        log_q_rev = -_sq_norm_per_unit(_whiten(rev, pstd), block)
    else:
        inv_sqrt_m = 1.0 if pstd is None else 1.0 / pstd
        log_q_fwd = -_sq_norm_per_unit(fwd * inv_sqrt_m, block)
        log_q_rev = -_sq_norm_per_unit(rev * inv_sqrt_m, block)
    s2_cu = jnp.exp(2.0 * log_scale)
    log_alpha = (
        d_new - d_old + (log_q_rev - log_q_fwd) / (2.0 * s2_cu)
    )

    logu = jnp.log(jax.random.uniform(
        k_u, log_alpha.shape, value.dtype, minval=jnp.finfo(value.dtype).tiny
    ))
    accept = logu < log_alpha
    new_value = select_accepted(accept, prop, value, block)
    new_cache = None
    if cache is not None:
        new_cache = {
            "v": jnp.where(accept, sv_new, cache["v"]),
            "g": select_accepted(accept, sg_new, cache["g"], block),
        }
    return new_value, accept_prob(log_alpha), new_cache
