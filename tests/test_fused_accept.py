"""Fused propose+lik+accept kernel: RNG quality + statistical equivalence.

TPU-only (NESTMC_TPU_TESTS=1): the interpret-mode TPU PRNG is stubbed with
zeros on CPU, so neither the Box-Muller normals nor the sampler statistics
can be validated off-chip. The fused path is also auto-disabled off-TPU
(nestmc/kernels/gibbs.py).

The fused kernel uses the TPU core PRNG (its own stream), so trajectories
differ from the threefry path by design; the contract is distributional.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import KernelConfig, RunConfig, SamplerConfig, sample
from nestmc.models import make_hier_logistic, synth_logistic

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("fused-accept kernel requires the real TPU PRNG")


def test_box_muller_normals_are_standard():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nestmc.ops.pallas import mh_accept as m

    def kern(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0, 0])
        out_ref[:] = m._normal(out_ref.shape)

    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
    )(jnp.array([[1234]], jnp.int32))
    x = np.asarray(out).ravel()
    n = x.size
    assert abs(x.mean()) < 4 / np.sqrt(n)
    assert abs(x.std() - 1.0) < 4 / np.sqrt(2 * n)
    frac2 = np.mean(np.abs(x) > 2.0)
    assert abs(frac2 - 0.0455) < 0.01
    assert abs(((x**3).mean())) < 6 * np.sqrt(15 / n)


def test_fused_sampler_statistically_matches_unfused():
    data, _ = synth_logistic(jax.random.key(23), G=64, n=16, p=2)
    model = make_hier_logistic(data)
    assert "beta" in model.fused_updates

    def run(fused):
        cfg = SamplerConfig(
            kernel=KernelConfig(fused_accept=fused),
            run=RunConfig(
                chains=64, warmup=300, draws=500, seed=11,
                log_every_segment=False,
                collect={"mu": None, "log_tau": None, "beta": 8},
            ),
        )
        return sample(model, data, cfg)

    a, b = run(True), run(False)
    acc_a = float(jnp.mean(a.accept_rates["beta"]))
    acc_b = float(jnp.mean(b.accept_rates["beta"]))
    assert abs(acc_a - acc_b) < 0.05, (acc_a, acc_b)
    for k in ("mu", "log_tau"):
        ma, mb = np.asarray(a.mean(k)), np.asarray(b.mean(k))
        sa = np.asarray(a.diagnostics()[k]["mcse_mean"])
        sb = np.asarray(b.diagnostics()[k]["mcse_mean"])
        tol = 6 * np.sqrt(sa**2 + sb**2)
        assert np.all(np.abs(ma - mb) < tol), (k, ma, mb, tol)
