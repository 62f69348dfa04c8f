"""Fused Poisson MH step kernels (ops/pallas/poisson_accept.py) contracts.

Same two tiers as the logistic fused-step tests (test_newton_fused.py /
test_mala_accept_fused.py): (1) EXACT parity — with external noise
operands each kernel reproduces the unfused kernels/{rwmh,mala,newton}.py
update on the nested-Poisson subject block (per-unit prior means!) to
float tolerance in interpret mode; (2) a TPU statistical-equivalence tier
(NESTMC_TPU_TESTS=1) for the on-core-PRNG path.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.kernels.mala import mala_update
from nestmc.kernels.newton import newton_update
from nestmc.kernels.rwmh import rwmh_update
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_nested_poisson, synth_poisson3

ON_TPU = jax.default_backend() == "tpu"
TPU_TESTS = os.environ.get("NESTMC_TPU_TESTS") == "1"


def _setup(algorithm, C=8, G=5, spg=3, n=7, p=3, dense=False):
    data, _ = synth_poisson3(
        jax.random.key(23), G=G, subjects_per_group=spg, n=n, p=p
    )
    if not dense:
        mask = np.array(data.mask)
        mask[0, n - 3:] = 0.0
        mask[3, :2] = 0.0
        data = dataclasses.replace(
            data, mask=jnp.asarray(mask), y=data.y * jnp.asarray(mask)
        )
    model = make_nested_poisson(data, tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm=algorithm),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    state = init_kernel_state(model, cfg, jax.random.key(2), data)
    return data, model, state


def _noise(key, C, S, p):
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (C, S, p), jnp.float32)
    logu = jnp.log(jax.random.uniform(
        k_u, (C, S), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    ))
    return eps, logu


def _bgs(state, data):
    return jnp.take(state.position["beta_g"], data.subject_group, axis=1)


@pytest.mark.parametrize("dense", [False, True])
def test_rwmh_external_noise_exact_parity(dense):
    from nestmc.ops.pallas.poisson_accept import fused_rwmh_poisson_step

    data, model, state = _setup("rwmh", dense=dense)
    beta = state.position["beta_s"]
    C, S, p = beta.shape
    key = jax.random.key(7)
    log_scale = state.log_scale["beta_s"]
    eps, logu = _noise(key, C, S, p)

    block = model.block("beta_s")
    ref_beta, ref_alpha, ref_cache = rwmh_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta_s"],
    )
    new_beta, new_lik, alpha = fused_rwmh_poisson_step(
        key, beta, state.cache["beta_s"], log_scale,
        _bgs(state, data), state.position["log_tau_s"],
        data.x, data.y, data.mask,
        interpret=True, noise=(eps, logu), dense=dense,
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_lik), np.asarray(ref_cache), rtol=1e-4, atol=2e-4
    )


@pytest.mark.parametrize("dense", [False, True])
def test_mala_external_noise_exact_parity(dense):
    from nestmc.ops.pallas.poisson_accept import fused_mala_poisson_step

    data, model, state = _setup("mala", dense=dense)
    beta = state.position["beta_s"]
    C, S, p = beta.shape
    key = jax.random.key(8)
    log_scale = state.log_scale["beta_s"]
    eps, logu = _noise(key, C, S, p)

    block = model.block("beta_s")
    ref_beta, ref_alpha, ref_cache = mala_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta_s"],
    )
    c = state.cache["beta_s"]
    new_beta, new_v, new_g, alpha = fused_mala_poisson_step(
        key, beta, c["v"], c["g"], log_scale,
        _bgs(state, data), state.position["log_tau_s"],
        data.x, data.y, data.mask,
        interpret=True, noise=(eps, logu), dense=dense,
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_v), np.asarray(ref_cache["v"]), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_g), np.asarray(ref_cache["g"]), rtol=1e-3, atol=2e-4
    )


@pytest.mark.parametrize("frozen", [False, True])
def test_newton_external_noise_exact_parity(frozen):
    from nestmc.ops.pallas.poisson_accept import fused_newton_poisson_step

    data, model, state = _setup("newton")
    beta = state.position["beta_s"]
    C, S, p = beta.shape
    key = jax.random.key(9)
    log_scale = state.log_scale["beta_s"]
    eps, logu = _noise(key, C, S, p)

    block = model.block("beta_s")
    ref_beta, ref_alpha, ref_cache = newton_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta_s"], frozen=frozen,
    )
    c = state.cache["beta_s"]
    new_beta, new_v, new_g, new_h, alpha = fused_newton_poisson_step(
        key, beta, c["v"], c["g"], c["h"], log_scale,
        _bgs(state, data), state.position["log_tau_s"],
        data.x, data.y, data.mask,
        interpret=True, noise=(eps, logu), frozen=frozen,
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_v), np.asarray(ref_cache["v"]), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_g), np.asarray(ref_cache["g"]), rtol=1e-3, atol=2e-4
    )
    if frozen:
        # the frozen metric passes through IDENTICALLY
        assert new_h is c["h"]
        assert ref_cache["h"] is c["h"]
    else:
        np.testing.assert_allclose(
            np.asarray(new_h), np.asarray(ref_cache["h"]),
            rtol=1e-3, atol=2e-4,
        )


def test_model_hooks_route_to_fused_tables():
    """The ModelSpec declares all three fused tables for beta_s."""
    data, model, _ = _setup("rwmh")
    assert "beta_s" in model.fused_updates
    assert "beta_s" in model.fused_updates_mala
    assert "beta_s" in model.fused_updates_newton


@pytest.mark.skipif(
    not (ON_TPU and TPU_TESTS),
    reason="on-core PRNG path needs a real TPU (NESTMC_TPU_TESTS=1)",
)
@pytest.mark.parametrize("algorithm", ["rwmh", "mala", "newton"])
def test_fused_poisson_statistical_equivalence_tpu(algorithm):
    """Long runs with the on-core-PRNG fused kernels vs the unfused path:
    acceptance levels and posterior moments must agree."""
    from nestmc.engine import sample

    data, _ = synth_poisson3(
        jax.random.key(6), G=16, subjects_per_group=4, n=8, p=3
    )
    model = make_nested_poisson(data, tau_prior="invgamma")
    run = RunConfig(chains=32, warmup=300, draws=600, seed=12,
                    collect={"mu": None, "log_tau_g": None,
                             "log_tau_s": None},
                    log_every_segment=False)
    posts = {}
    for fused in (True, False):
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm=algorithm, fused_accept=fused),
            run=run,
        )
        posts[fused] = sample(model, data, cfg)
    a1 = float(jnp.mean(posts[True].accept_rates["beta_s"]))
    a0 = float(jnp.mean(posts[False].accept_rates["beta_s"]))
    assert abs(a1 - a0) < 0.05, (a1, a0)
    for name in ("mu", "log_tau_g", "log_tau_s"):
        m1 = np.asarray(jnp.mean(posts[True].draws[name], axis=(0, 1)))
        m0 = np.asarray(jnp.mean(posts[False].draws[name], axis=(0, 1)))
        s = np.asarray(jnp.std(posts[False].draws[name], axis=(0, 1)))
        assert np.all(np.abs(m1 - m0) < 0.5 * s + 0.05), (name, m1, m0)
