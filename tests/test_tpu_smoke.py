"""Opt-in real-TPU smoke tests (NESTMC_TPU_TESTS=1 on a TPU host).

Short runs on the real chip: finite draws, sane acceptance, pallas/jnp
parity COMPILED (not interpreted), and the graft entry contract.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("not on TPU")


def test_pallas_parity_compiled():
    import jax.numpy as jnp

    from nestmc.ops.loglik import logistic_loglik_padded
    from nestmc.ops.pallas import logistic_loglik_padded_pallas

    rng = np.random.default_rng(0)
    beta = jnp.asarray(rng.normal(size=(64, 96, 4)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(96, 24, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 2, size=(96, 24)).astype(np.float32))
    mask = jnp.ones((96, 24), np.float32)
    ref = logistic_loglik_padded(beta, x, y, mask)
    ker = logistic_loglik_padded_pallas(beta, x, y, mask, interpret=False)
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_short_hier_logistic_run():
    from nestmc.config import RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models import make_hier_logistic, synth_logistic

    data, _ = synth_logistic(jax.random.key(1), G=100, n=20, p=3)
    model = make_hier_logistic(data)
    cfg = SamplerConfig(
        run=RunConfig(
            chains=64, warmup=150, draws=150, log_every_segment=False,
            collect={"mu": None, "log_tau": None},
        ),
    )
    post = sample(model, data, cfg)
    assert np.all(np.isfinite(np.asarray(post.draws["mu"])))
    acc = float(post.accept_rates["beta"].mean())
    assert 0.1 < acc < 0.6, acc
    assert post.worst_rhat() < 2.0  # short run: only sanity


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.position)
    assert int(out.t) == 1
