"""Multi-host (DCN) support.

A v5e-8 slice is single-host, so nothing here is exercised in this
container; the design keeps the chains-axis sharding DCN-compatible:

- call :func:`initialize` once per process before any jax call;
- build the mesh over ``jax.devices()`` (global across hosts) exactly as on
  one host — ``make_mesh`` already does;
- keep the 'chains' axis outermost across hosts: chain parallelism has no
  hot-loop collectives, so DCN only carries the end-of-run diagnostics
  reductions; the per-sweep psum of the group axis stays intra-host (ICI)
  as long as 'groups' shards only within a host's devices.

Checkpointing in multi-host runs: each process saves only
``jax.process_index() == 0`` (the carry is replicated per-chain-shard;
addressable shards suffice to rebuild on resume with the same topology).
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Thin wrapper over jax.distributed.initialize with env fallbacks.

    On single-host (or when no coordinator is configured) this is a no-op,
    so the same entrypoint works everywhere.
    """
    if coordinator_address is None and num_processes is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0
