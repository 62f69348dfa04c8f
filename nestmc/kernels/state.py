"""The scan-carry pytree: positions + adaptation + acceptance bookkeeping.

One KernelState holds EVERYTHING the sampler needs to continue — positions,
per-(chain, unit) proposal scales, preconditioner moments, acceptance
accumulators, the step counter and the RNG key — so checkpoint/resume is
"serialize the carry" and a resumed run is bitwise-identical to an
uninterrupted one (counter-based RNG keyed from the carry).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nestmc.adapt import init_precond
from nestmc.config import SamplerConfig
from nestmc.model import ModelSpec


@dataclass(frozen=True)
class KernelState:
    """Chain-batched sampler state (all leaves lead with the chains axis).

    position:   {name: (C, *shape)} current parameter values.
    log_scale:  {name: (C, U)} per-(chain, unit) log proposal scales
                (U = 1 for scalar blocks or when scale_per_unit=False).
    precond:    {name: None | {mean, var, count}} EMA moments for diagonal
                preconditioning.
    accept_sum: {name: (C, U)} cumulative acceptance probabilities.
    cache:      {name: (C, U) | None} carried self-conditional values
                (e.g. the data log-likelihood of the current position) for
                blocks declared in ModelSpec.cond_cached.
    t:          () int32 — sweeps taken (drives the RM schedule).
    key:        PRNG key (threefry, partitionable across shardings).
    """

    position: dict
    log_scale: dict
    precond: dict
    accept_sum: dict
    cache: dict
    t: jnp.ndarray
    key: jax.Array


jax.tree_util.register_dataclass(
    KernelState,
    data_fields=[
        "position", "log_scale", "precond", "accept_sum", "cache", "t", "key",
    ],
    meta_fields=[],
)


def scale_units(block, cfg: SamplerConfig) -> int:
    if block.units and cfg.kernel.scale_per_unit:
        return block.units
    return 1


def init_kernel_state(
    model: ModelSpec,
    cfg: SamplerConfig,
    key: jax.Array,
    data,
    position: dict | None = None,
) -> KernelState:
    """Build the initial carry. ``position`` overrides model init (resume)."""
    k_init, k_carry = jax.random.split(key)
    chains = cfg.run.chains
    if position is None:
        position = model.init_state(k_init, data, chains)
    dtype = jnp.result_type(*jax.tree_util.tree_leaves(position))
    log_scale, precond, accept_sum, cache = {}, {}, {}, {}
    for b in model.blocks:
        u = scale_units(b, cfg)
        # 2.38/sqrt(d) is the RW-optimal scale for a unit-variance target;
        # init_scale carries the model author's rough posterior-scale guess.
        s0 = b.init_scale * 2.38 / math.sqrt(max(b.unit_dim, 1))
        log_scale[b.name] = jnp.full((chains, u), math.log(s0), dtype)
        precond[b.name] = init_precond(
            position[b.name], cfg.kernel, unit_dim=b.unit_dim
        )
        accept_sum[b.name] = jnp.zeros((chains, max(b.units, 1)), dtype)
        algorithm = b.algorithm or cfg.kernel.algorithm
        if (
            algorithm == "newton"
            and b.name not in model.cond_cached_newton
        ):
            algorithm = "mala"  # same fallback as kernels/gibbs.py
        if b.name in model.cond_cached and algorithm == "rwmh":
            self_fn, _ = model.cond_cached[b.name]
            val = self_fn(position[b.name], data)
            cache[b.name] = val if b.units else val[:, None]
        elif b.name in model.cond_cached_grad and algorithm == "mala":
            self_vag, _ = model.cond_cached_grad[b.name]
            val, grad = self_vag(position[b.name], data)
            cache[b.name] = {
                "v": val if b.units else val[:, None],
                "g": grad,
            }
        elif b.name in model.cond_cached_newton and algorithm == "newton":
            self_vgh, _ = model.cond_cached_newton[b.name]
            val, grad, hess = self_vgh(position[b.name], data)
            cache[b.name] = {
                "v": val if b.units else val[:, None],
                "g": grad,
                "h": hess,
            }
            # Newton-MH: log_scale is log sqrt(c), the proposal-covariance
            # damping relative to the inverse conditional Hessian; c = 1
            # (the Laplace approximation itself) is the exact-Gaussian
            # optimum and is never adapted (kernels/newton.py).
            log_scale[b.name] = jnp.zeros_like(log_scale[b.name])
        else:
            cache[b.name] = None
    from nestmc.kernels.gibbs import grad_cache_live

    grad_live = grad_cache_live(model, cfg)
    for mname in model.joint_moves:
        # joint moves carry one per-chain proposal scale + accept counter;
        # models whose move sums log-alpha over many units override the
        # default start (ModelSpec.joint_move_init_scale) — RM adaptation
        # needs O(100) sweeps per decade of initial-scale error. When the
        # gradient cache is live the move runs metric-preconditioned and
        # its natural scale is O(1) (joint_move_init_scale_grad).
        if grad_live and mname in model.joint_move_init_scale_grad:
            s0 = model.joint_move_init_scale_grad[mname]
        else:
            s0 = model.joint_move_init_scale.get(mname, 0.1)
        log_scale[mname] = jnp.full((chains, 1), math.log(s0), dtype)
        accept_sum[mname] = jnp.zeros((chains, 1), dtype)
    return KernelState(
        position=position,
        log_scale=log_scale,
        precond=precond,
        accept_sum=accept_sum,
        cache=cache,
        t=jnp.zeros((), jnp.int32),
        key=k_carry,
    )
