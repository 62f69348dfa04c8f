"""Adaptation converges to the optimal scale/acceptance on a known target."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import (
    KernelConfig,
    RunConfig,
    SamplerConfig,
    sample,
)
from nestmc.model import Block, ModelSpec


def std_normal_model(d: int) -> ModelSpec:
    """Single-block standard-normal target in R^d (no data)."""

    def cond(name, value, state, data):
        return -0.5 * jnp.sum(value * value, axis=tuple(range(1, value.ndim)))

    def joint(state, data):
        return cond("x", state["x"], state, data)

    def init_state(key, data, chains):
        shape = (chains, d) if d > 1 else (chains,)
        return {"x": 2.0 * jax.random.normal(key, shape)}

    return ModelSpec(
        name=f"std_normal_{d}d",
        blocks=(Block("x", (d,) if d > 1 else (), init_scale=1.0),),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=init_state,
    )


@pytest.mark.parametrize("d,target", [(1, 0.44), (5, 0.234)])
def test_rw_scale_converges(d, target):
    model = std_normal_model(d)
    cfg = SamplerConfig(
        run=RunConfig(
            chains=64, warmup=1500, draws=500, seed=3,
            log_every_segment=False,
        ),
    )
    post = sample(model, None, cfg)
    acc = float(jnp.mean(post.accept_rates["x"]))
    assert abs(acc - target) < 0.06, f"acceptance {acc} vs target {target}"
    # optimal RW scale for a unit-variance d-dim Gaussian ~ 2.38/sqrt(d)
    s = float(jnp.exp(post.final_state.log_scale["x"]).mean())
    opt = 2.38 / np.sqrt(d)
    assert 0.6 * opt < s < 1.6 * opt, f"scale {s} vs optimum {opt}"


def test_mala_acceptance_converges():
    model = std_normal_model(2)
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="mala"),
        run=RunConfig(
            chains=64, warmup=1500, draws=500, seed=4,
            log_every_segment=False,
        ),
    )
    post = sample(model, None, cfg)
    acc = float(jnp.mean(post.accept_rates["x"]))
    assert abs(acc - 0.574) < 0.08, f"MALA acceptance {acc}"


def test_full_precond_learns_correlation():
    """Target N(0, S) with corr 0.9: the Haario covariance EMA must
    recover S and the correlated directions must actually mix."""
    import numpy as np

    rho = 0.9
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def cond(name, value, state, data):
        q = jnp.einsum("...i,ij,...j->...", value, prec, value)
        return -0.5 * q

    model = ModelSpec(
        name="corr2d",
        blocks=(Block("x", (2,), init_scale=1.0),),
        cond_logdensity=cond,
        joint_logdensity=lambda s, d: cond("x", s["x"], s, d),
        init_state=lambda key, data, chains: {
            "x": jax.random.normal(key, (chains, 2))
        },
    )
    cfg = SamplerConfig(
        kernel=KernelConfig(precond="full"),
        run=RunConfig(
            chains=64, warmup=3000, draws=1500, seed=6,
            log_every_segment=False,
        ),
    )
    post = sample(model, None, cfg)
    acc = float(jnp.mean(post.accept_rates["x"]))
    assert abs(acc - 0.234) < 0.08, acc
    learned = np.asarray(jnp.mean(post.final_state.precond["x"]["cov"], 0))
    corr = learned[0, 1] / np.sqrt(learned[0, 0] * learned[1, 1])
    assert corr > 0.7, f"learned correlation {corr}, want ~{rho}"
    # the anti-correlated (narrow) direction must mix: sd of x0 - x1
    diff_sd = float(jnp.std(post.draws["x"][..., 0] - post.draws["x"][..., 1]))
    expect = np.sqrt(2 * (1 - rho))
    assert 0.6 * expect < diff_sd < 1.6 * expect, (diff_sd, expect)


def test_diag_precond_learns_anisotropy():
    """Target N(0, diag(1, 100)): preconditioned RW should reach near-target
    acceptance AND mix both coordinates (plain RW would crawl on x2)."""

    def cond(name, value, state, data):
        z = value / jnp.array([1.0, 10.0])
        return -0.5 * jnp.sum(z * z, axis=-1)

    def init_state(key, data, chains):
        return {"x": jax.random.normal(key, (chains, 2))}

    model = ModelSpec(
        name="aniso",
        blocks=(Block("x", (2,), init_scale=1.0),),
        cond_logdensity=cond,
        joint_logdensity=lambda s, d: cond("x", s["x"], s, d),
        init_state=init_state,
    )
    cfg = SamplerConfig(
        kernel=KernelConfig(precond="diag"),
        run=RunConfig(
            chains=64, warmup=2500, draws=1000, seed=5,
            log_every_segment=False,
        ),
    )
    post = sample(model, None, cfg)
    acc = float(jnp.mean(post.accept_rates["x"]))
    assert abs(acc - 0.234) < 0.08
    # the learned per-coordinate std should reflect the 1:10 anisotropy
    var = post.final_state.precond["x"]["var"]
    ratio = float(jnp.sqrt(jnp.mean(var[:, 1]) / jnp.mean(var[:, 0])))
    assert ratio > 3.0, f"preconditioner ratio {ratio}, want ~10"
    # and the wide coordinate should actually mix
    sd2 = float(jnp.std(post.draws["x"][..., 1]))
    assert 6.0 < sd2 < 14.0


def test_full_precond_mala_correlated_target():
    """MALA with the full Haario mass matrix on N(0, S), corr 0.9: the
    asymmetric correction with the M^{-1}-weighted norms (batched
    triangular solve) must keep the target exact — wrong q-terms bias the
    narrow direction's variance — and the narrow direction must mix."""
    import numpy as np

    rho = 0.9
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def cond(name, value, state, data):
        q = jnp.einsum("...i,ij,...j->...", value, prec, value)
        return -0.5 * q

    model = ModelSpec(
        name="corr2d_mala",
        blocks=(Block("x", (2,), init_scale=1.0),),
        cond_logdensity=cond,
        joint_logdensity=lambda s, d: cond("x", s["x"], s, d),
        init_state=lambda key, data, chains: {
            "x": jax.random.normal(key, (chains, 2))
        },
    )
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="mala", precond="full"),
        run=RunConfig(
            chains=64, warmup=3000, draws=1500, seed=8,
            log_every_segment=False,
        ),
    )
    post = sample(model, None, cfg)
    acc = float(jnp.mean(post.accept_rates["x"]))
    assert abs(acc - 0.574) < 0.10, acc
    x = np.asarray(post.draws["x"]).reshape(-1, 2)
    emp = np.cov(x.T)
    # posterior covariance must match the target (MC tolerance)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.12)
    diff_sd = float(np.std(x[:, 0] - x[:, 1]))
    expect = np.sqrt(2 * (1 - rho))
    assert 0.6 * expect < diff_sd < 1.6 * expect, (diff_sd, expect)
