"""Test configuration: CPU backend with 8 simulated devices.

Env vars MUST be set before the first `import jax` anywhere in the process:
- JAX_PLATFORMS=cpu keeps the suite off the (slow to initialize) TPU tunnel;
- xla_force_host_platform_device_count=8 gives a virtual 8-device mesh for
  sharding tests (SURVEY.md section 4 "distributed without a cluster");
- PALLAS_AXON_POOL_IPS= bypasses the container's sitecustomize TPU hook.

TPU smoke tests opt back in with @pytest.mark.tpu and a separate process.
"""

import os

if os.environ.get("NESTMC_TPU_TESTS", "") != "1":
    # The container env pins JAX_PLATFORMS=axon (remote TPU); override hard.
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 simulated device threads time-slicing on a small core count can
    # miss XLA-CPU's default 40 s collective rendezvous window on
    # non-trivial programs, which ABORTS the process (observed at nproc=1:
    # "only 5 of 8 threads arrived"); give them room.
    _flags = (
        _flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    run_tpu = os.environ.get("NESTMC_TPU_TESTS", "") == "1"
    skip_tpu = pytest.mark.skip(reason="set NESTMC_TPU_TESTS=1 on a TPU host")
    for item in items:
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 simulated devices")
    return devs
