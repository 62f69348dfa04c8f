"""Batched random-walk Metropolis block update.

One call proposes and accepts/rejects ALL chains and (for grouped blocks) ALL
conditionally-independent units at once: proposal, two conditional
log-density evaluations, and a (chains, units) Bernoulli accept — a handful
of fused XLA kernels, zero Python per-group looping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nestmc.model import Block, ModelSpec


def bcast_over_unit_shape(s, block: Block):
    """Reshape a (C, U') scale array to broadcast against the block value.

    Value shapes: grouped (C, U, *unit_shape); scalar (C, *shape).
    U' is U, or 1 when scales are shared across units.
    """
    nd = len(block.unit_shape)
    if block.units:
        return s.reshape(s.shape + (1,) * nd)
    # scalar block: s is (C, 1); drop the unit axis, then pad param dims.
    return s.reshape((s.shape[0],) + (1,) * nd)


def as_cu(d, block: Block):
    """Normalize a conditional log-density to (C, U) (U=1 for scalar blocks)."""
    return d if block.units else d[:, None]


def apply_precond(eps, pstd):
    """Shape the proposal noise: elementwise std (diag) or L @ eps (full
    Cholesky factor, detected by the extra trailing matrix dim)."""
    if pstd is None:
        return eps
    if pstd.ndim == eps.ndim + 1:
        return jnp.einsum("...ij,...j->...i", pstd, eps)
    return eps * pstd


def accept_prob(log_alpha):
    """min(1, exp(log_alpha)) with NaN -> 0 (NaN proposals must reject)."""
    a = jnp.exp(jnp.minimum(log_alpha, 0.0))
    return jnp.where(jnp.isnan(log_alpha), 0.0, a)


def select_accepted(accept_cu, prop, value, block: Block):
    """Per-unit where() between proposal and current value."""
    if block.units:
        m = accept_cu.reshape(accept_cu.shape + (1,) * len(block.unit_shape))
    else:
        m = accept_cu.reshape(
            (accept_cu.shape[0],) + (1,) * len(block.unit_shape)
        )
    return jnp.where(m, prop, value)


def rwmh_update(key, block: Block, model: ModelSpec, position, log_scale,
                pstd, data, cache=None):
    """One RW-MH update of ``block`` for all chains (and units).

    Args:
      position: full state dict (current values of every block).
      log_scale: (C, U') log proposal scales for this block.
      pstd: optional value-shaped proposal std multiplier (diagonal
        preconditioner), or None.
      cache: (C, U) carried self-conditional of the CURRENT value when the
        model declares a cond_cached split for this block (halves hot
        evaluations: only the proposal's self part is computed).

    Returns (new_value, alpha, new_cache); alpha: (C, U) acceptance probs.
    """
    value = position[block.name]
    k_eps, k_u = jax.random.split(key)
    eps = apply_precond(
        jax.random.normal(k_eps, value.shape, value.dtype), pstd
    )
    step = bcast_over_unit_shape(jnp.exp(log_scale), block) * eps
    prop = value + step

    if cache is not None:
        self_fn, rest_fn = model.cond_cached[block.name]
        self_new = as_cu(self_fn(prop, data), block)
        d_new = self_new + as_cu(rest_fn(prop, position, data), block)
        d_old = cache + as_cu(rest_fn(value, position, data), block)
    else:
        d_new = as_cu(
            model.cond_logdensity(block.name, prop, position, data), block
        )
        d_old = as_cu(
            model.cond_logdensity(block.name, value, position, data), block
        )
    log_alpha = d_new - d_old

    logu = jnp.log(jax.random.uniform(
        k_u, log_alpha.shape, value.dtype, minval=jnp.finfo(value.dtype).tiny
    ))
    accept = logu < log_alpha  # NaN log_alpha compares False -> reject
    new_value = select_accepted(accept, prop, value, block)
    new_cache = None
    if cache is not None:
        new_cache = jnp.where(accept, self_new, cache)
    return new_value, accept_prob(log_alpha), new_cache
