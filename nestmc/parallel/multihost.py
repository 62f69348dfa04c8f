"""Multi-host (DCN) support.

A v5e-8 slice is single-host, so no real DCN fabric exists in this
container — but the full multi-process path IS executed here:
tests/test_multihost.py::test_two_process_distributed_sample runs 2
`jax.distributed.initialize`'d processes x 4 forced CPU devices each and
samples over the process-spanning 2x4 mesh (Gloo collectives standing in
for DCN). The design keeps the chains-axis sharding DCN-compatible:

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

import os

import jax


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return None if v in (None, "") else int(v)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Thin wrapper over jax.distributed.initialize with env fallbacks.

    Explicit arguments win; otherwise NESTMC_COORDINATOR_ADDRESS /
    NESTMC_NUM_PROCESSES / NESTMC_PROCESS_ID are read (jax.distributed
    additionally auto-detects cluster envs on its own). On single-host —
    no argument and no env configured — this is a no-op, so the same
    entrypoint works everywhere.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "NESTMC_COORDINATOR_ADDRESS"
        ) or None
    if num_processes is None:
        num_processes = _env_int("NESTMC_NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("NESTMC_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    return jax.process_index() == 0
