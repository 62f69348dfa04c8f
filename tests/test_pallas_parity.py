"""Pallas kernels == jnp reference paths (interpret mode on CPU).

The jnp path doubles as the 'fake backend' for the kernels; these tests are
the sanitizer for tiling/masking bugs (SURVEY.md section 5.2). The same
parity contract is asserted compiled-on-TPU by tests/test_tpu_smoke.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.ops.loglik import (
    logistic_loglik_padded,
    poisson_loglik_padded,
)
from nestmc.ops.pallas import (
    logistic_loglik_padded_pallas,
    logistic_logp_grad_pallas,
    poisson_loglik_padded_pallas,
)

RNG = np.random.default_rng(5)


def _case(C, G, n, p, binary=True):
    beta = jnp.asarray(RNG.normal(size=(C, G, p)).astype(np.float32) * 0.5)
    x = jnp.asarray(RNG.normal(size=(G, n, p)).astype(np.float32))
    mask = (RNG.uniform(size=(G, n)) > 0.25).astype(np.float32)
    # at least one valid obs per group
    mask[:, 0] = 1.0
    if binary:
        y = RNG.integers(0, 2, size=(G, n)).astype(np.float32)
    else:
        y = RNG.poisson(2.0, size=(G, n)).astype(np.float32)
    y = y * mask
    return beta, x, jnp.asarray(y), jnp.asarray(mask)


SHAPES = [
    (8, 16, 12, 3),     # tidy tiles
    (8, 13, 7, 2),      # G not tile-divisible (exercises padding)
    (16, 5, 50, 4),     # few big groups
    (8, 32, 1, 1),      # single obs, single covariate
]


@pytest.mark.parametrize("C,G,n,p", SHAPES)
def test_logistic_parity(C, G, n, p):
    beta, x, y, mask = _case(C, G, n, p)
    ref = logistic_loglik_padded(beta, x, y, mask)
    ker = logistic_loglik_padded_pallas(beta, x, y, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("C,G,n,p", SHAPES)
def test_poisson_parity(C, G, n, p):
    beta, x, y, mask = _case(C, G, n, p, binary=False)
    ref = poisson_loglik_padded(beta, x, y, mask)
    ker = poisson_loglik_padded_pallas(beta, x, y, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ker), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("C,G,n,p", SHAPES[:2])
def test_logp_grad_parity(C, G, n, p):
    beta, x, y, mask = _case(C, G, n, p)

    def f(b):
        return logistic_loglik_padded(b, x, y, mask)

    ref_val, vjp = jax.vjp(f, beta)
    (ref_grad,) = vjp(jnp.ones_like(ref_val))
    val, grad = logistic_logp_grad_pallas(beta, x, y, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(val), np.asarray(ref_val), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("C,G,n,p", SHAPES[:2])
def test_poisson_logp_grad_parity(C, G, n, p):
    from nestmc.ops.pallas import poisson_logp_grad_pallas

    beta, x, y, mask = _case(C, G, n, p, binary=False)
    beta = beta * 0.5  # keep rates moderate

    def f(b):
        return poisson_loglik_padded(b, x, y, mask)

    ref_val, vjp = jax.vjp(f, beta)
    (ref_grad,) = vjp(jnp.ones_like(ref_val))
    val, grad = poisson_logp_grad_pallas(beta, x, y, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(val), np.asarray(ref_val), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=1e-4, atol=1e-4
    )


def test_pallas_inside_jit_and_model():
    """The kernel path must trace inside the engine's jit (via the model)."""
    from nestmc.models import make_hier_logistic, synth_logistic

    data, _ = synth_logistic(jax.random.key(0), G=16, n=8, p=2)
    model = make_hier_logistic(data, loglik_impl="pallas")
    assert model.loglik_impls["selected"] == "pallas"
    C = 8
    state = model.init_state(jax.random.key(1), data, C)
    out = jax.jit(
        lambda s: model.cond_logdensity("beta", s["beta"], s, data)
    )(state)
    ref_model = make_hier_logistic(data, loglik_impl="jnp")
    ref = ref_model.cond_logdensity("beta", state["beta"], state, data)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
