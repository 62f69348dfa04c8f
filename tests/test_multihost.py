"""Multi-host entrypoint (nestmc/parallel/multihost.py).

A v5e-8 slice is single-host, so the real DCN path cannot run here; these
tests pin the contract that CAN be verified without a cluster: the no-op
single-host path, the argument/env-fallback plumbing into
jax.distributed.initialize, and the primary-process predicate.
"""

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
