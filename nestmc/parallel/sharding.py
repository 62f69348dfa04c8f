"""Mesh construction and sharding rules for sampler state and data.

Parallelism taxonomy (SURVEY.md section 2.3):
  - chains axis  -> data parallelism: embarrassingly parallel, zero hot-loop
    collectives; diagnostics at the end reduce across chains.
  - groups axis  -> tensor-model parallelism: group-level updates stay local,
    population-block conditionals reduce over groups (one compiler-inserted
    psum per sweep).
  - observations -> handled inside a chip by kernel tiling / segment sums
    (this workload's sequence-parallel analog; there is no pairwise
    obs x obs interaction, so ring-attention-style schemes do not apply).
  - pipeline / expert parallelism: deliberately absent — Gibbs blocks are
    sequentially dependent within a sweep, and there is no conditional
    routing. Documented, not implemented.

Everything goes through ``jit`` + ``NamedSharding``; XLA chooses and places
the collectives (ICI on a slice, DCN transparently under
``jax.distributed.initialize`` — no code change needed here).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nestmc.config import SamplerConfig
from nestmc.data import NestedData, NestedData3, RaggedData


def make_mesh(cfg: SamplerConfig, devices=None) -> Mesh | None:
    """('chains', 'groups') mesh, or None for the single-device fast path."""
    sh = cfg.sharding
    n = sh.chain_shards * sh.group_shards
    if n == 1:
        return None
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"sharding needs {n} devices, have {len(devices)}"
        )
    dev = np.array(devices[:n]).reshape(sh.chain_shards, sh.group_shards)
    return Mesh(dev, ("chains", "groups"))


def _grouped_shardable(block, cfg: SamplerConfig) -> bool:
    return (
        block.units > 0
        and cfg.sharding.group_shards > 1
        and block.units % cfg.sharding.group_shards == 0
    )


def state_shardings(model, cfg: SamplerConfig, mesh: Mesh):
    """NamedSharding pytree matching a KernelState for this model/config."""
    if mesh is None:
        return None

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    position, log_scale, precond, accept_sum = {}, {}, {}, {}
    cache = {}
    for b in model.blocks:
        gsh = _grouped_shardable(b, cfg)
        val_spec = ("chains", "groups") if gsh else ("chains",)
        val = ns(*val_spec)
        position[b.name] = val
        per_unit_scales = cfg.kernel.scale_per_unit and b.units > 0
        log_scale[b.name] = (
            ns("chains", "groups") if (gsh and per_unit_scales)
            else ns("chains")
        )
        accept_sum[b.name] = (
            ns("chains", "groups") if gsh else ns("chains")
        )
        algorithm = b.algorithm or cfg.kernel.algorithm
        if (
            algorithm == "newton"
            and b.name not in model.cond_cached_newton
        ):
            algorithm = "mala"  # same fallback as kernels/state.py
        cu_spec = ns("chains", "groups") if gsh else ns("chains")
        if b.name in model.cond_cached and algorithm == "rwmh":
            cache[b.name] = cu_spec
        elif b.name in model.cond_cached_grad and algorithm == "mala":
            cache[b.name] = {"v": cu_spec, "g": val}
        elif b.name in model.cond_cached_newton and algorithm == "newton":
            # v (C,U), g value-shaped, h (C,U,T): same leading-axis specs
            cache[b.name] = {"v": cu_spec, "g": val, "h": val}
        else:
            cache[b.name] = None
        if cfg.kernel.precond == "full" and b.unit_dim > 1:
            precond[b.name] = {
                "mean": val, "cov": val, "count": ns("chains"),
            }
        elif cfg.kernel.precond in ("diag", "full"):
            precond[b.name] = {
                "mean": val, "var": val, "count": ns("chains"),
            }
        else:
            precond[b.name] = None
    for mname in model.joint_moves:
        log_scale[mname] = ns("chains")
        accept_sum[mname] = ns("chains")
    from nestmc.kernels.state import KernelState

    return KernelState(
        position=position,
        log_scale=log_scale,
        precond=precond,
        accept_sum=accept_sum,
        cache=cache,
        t=ns(),
        key=ns(),
    )


def data_shardings(data, cfg: SamplerConfig, mesh: Mesh):
    """Sharding pytree for the data container.

    Padded 2-level data shards its leading group axis over 'groups'; the
    3-level container shards subjects over 'groups' (subject-major layout
    keeps each subject's obs local). Ragged (segment) data is replicated —
    flat obs arrays have no group-aligned static split; shard chains instead.
    """
    if mesh is None:
        return None

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    grouped = cfg.sharding.group_shards > 1

    def lead_group(a):
        if a is None:
            return None
        if grouped and a.shape[0] % cfg.sharding.group_shards == 0:
            return ns("groups")
        return ns()

    if isinstance(data, NestedData):
        return NestedData(
            y=lead_group(data.y), mask=lead_group(data.mask),
            sizes=lead_group(data.sizes), x=lead_group(data.x),
            extra={k: lead_group(v) for k, v in data.extra.items()},
        )
    if isinstance(data, NestedData3):
        return NestedData3(
            y=lead_group(data.y), mask=lead_group(data.mask),
            subject_group=lead_group(data.subject_group),
            num_groups=data.num_groups, x=lead_group(data.x),
            extra={k: lead_group(v) for k, v in data.extra.items()},
        )
    if isinstance(data, RaggedData):
        return jax.tree_util.tree_map(lambda _: ns(), data)
    return jax.tree_util.tree_map(lambda _: ns(), data)


def _put_multiprocess(tree, shardings):
    """device_put a pytree onto PROCESS-SPANNING shardings.

    jax.device_put rejects non-addressable shardings, so each process
    materializes its host copy (every process computes identical full-size
    inputs from the same seed) and contributes its addressable shards via
    ``jax.make_array_from_callback``. Mapped shardings-first so a None
    shardings leaf covers a whole state subtree (device_put semantics).
    """
    def put(ns, x):
        if x is None:
            return None
        if ns is None:
            return jax.device_put(x)
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            # typed PRNG keys can't round-trip through numpy directly;
            # move the underlying uint32 words, then rewrap
            raw = np.asarray(jax.random.key_data(x))
            moved = jax.make_array_from_callback(
                raw.shape, ns, lambda idx, a=raw: a[idx]
            )
            return jax.random.wrap_key_data(
                moved, impl=jax.random.key_impl(x)
            )
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, ns, lambda idx, a=arr: a[idx]
        )

    return jax.tree_util.tree_map(
        put, shardings, tree, is_leaf=lambda n: n is None
    )


def shard_inputs(state, data, model, cfg: SamplerConfig, mesh: Mesh):
    """device_put carry + data onto the mesh with their rule shardings."""
    if mesh is None:
        return state, data
    ssh = state_shardings(model, cfg, mesh)
    dsh = data_shardings(data, cfg, mesh)
    if jax.process_count() == 1:
        return jax.device_put(state, ssh), jax.device_put(data, dsh)
    return _put_multiprocess(state, ssh), _put_multiprocess(data, dsh)
