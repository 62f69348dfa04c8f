"""hier_glm poisson fused single-kernel steps (round-5 completion of
VERDICT r4 item 8: the generic surface's last kernel-servable family).

The 2-level poisson GLM is the nested_poisson subject block with the
per-subject prior mean specialized to the shared mu, so make_hier_glm
wires the SAME exact-parity-tested kernels (ops/pallas/poisson_accept.py)
into its fused tables with bg_s = broadcast(mu). These tests pin the
WIRING: with external noise operands each fused hook must reproduce the
unfused kernels/{rwmh,mala,newton}.py update on the model's own beta
conditional to float tolerance in interpret mode (the kernels' internal
math is covered by tests/test_poisson_fused.py; the on-core-PRNG path by
its TPU tier).
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
from nestmc.models.hier_glm import make_hier_glm, synth_glm


def _setup(algorithm, C=8, G=6, n=7, p=3, dense=False):
    data, _ = synth_glm(jax.random.key(31), family="poisson", G=G, n=n, p=p)
    if not dense:
        mask = np.array(data.mask)
        mask[0, n - 3:] = 0.0
        mask[2, :2] = 0.0
        data = dataclasses.replace(
            data, mask=jnp.asarray(mask), y=data.y * jnp.asarray(mask)
        )
    model = make_hier_glm(data, family="poisson", tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm=algorithm),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    state = init_kernel_state(model, cfg, jax.random.key(4), data)
    return data, model, state


def _noise(key, C, G, p):
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (C, G, p), jnp.float32)
    logu = jnp.log(jax.random.uniform(
        k_u, (C, G), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    ))
    return eps, logu


def test_fused_tables_wired():
    data, _ = synth_glm(jax.random.key(1), family="poisson", G=4, n=5, p=2)
    m = make_hier_glm(data, family="poisson")
    assert "beta" in m.fused_updates
    assert "beta" in m.fused_updates_mala
    assert "beta" in m.fused_updates_newton
    plain = make_hier_glm(data, family="poisson", fused=False)
    assert plain.fused_updates == {}
    assert plain.fused_updates_mala == {}
    assert plain.fused_updates_newton == {}
    # aux families (likelihood reads log_sigma / log_r) have no kernel
    for fam in ("gaussian", "negbin"):
        d, _ = synth_glm(jax.random.key(2), family=fam, G=4, n=5, p=2)
        assert make_hier_glm(d, family=fam).fused_updates == {}


@pytest.mark.parametrize("dense", [False, True])
def test_rwmh_external_noise_exact_parity(dense):
    data, model, state = _setup("rwmh", dense=dense)
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(7)
    log_scale = state.log_scale["beta"]
    eps, logu = _noise(key, C, G, p)

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = rwmh_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"],
    )
    new_beta, new_lik, alpha = model.fused_updates["beta"](
        key, state.position, state.cache, log_scale, data,
        noise=(eps, logu),
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
    data, model, state = _setup("mala", dense=dense)
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(8)
    log_scale = state.log_scale["beta"]
    eps, logu = _noise(key, C, G, p)

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = mala_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"],
    )
    new_beta, new_cache, alpha = model.fused_updates_mala["beta"](
        key, state.position, state.cache, log_scale, data,
        noise=(eps, logu),
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["v"]), np.asarray(ref_cache["v"]),
        rtol=1e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["g"]), np.asarray(ref_cache["g"]),
        rtol=1e-3, atol=2e-4,
    )


@pytest.mark.parametrize("frozen", [False, True])
def test_newton_external_noise_exact_parity(frozen):
    data, model, state = _setup("newton")
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(9)
    log_scale = state.log_scale["beta"]
    eps, logu = _noise(key, C, G, p)

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = newton_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"], frozen=frozen,
    )
    new_beta, new_cache, alpha = model.fused_updates_newton["beta"](
        key, state.position, state.cache, log_scale, data,
        frozen=frozen, noise=(eps, logu),
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["v"]), np.asarray(ref_cache["v"]),
        rtol=1e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(new_cache["g"]), np.asarray(ref_cache["g"]),
        rtol=1e-3, atol=2e-4,
    )
    if frozen:
        # the frozen metric passes through IDENTICALLY
        assert new_cache["h"] is state.cache["beta"]["h"]
        assert ref_cache["h"] is state.cache["beta"]["h"]
    else:
        np.testing.assert_allclose(
            np.asarray(new_cache["h"]), np.asarray(ref_cache["h"]),
            rtol=1e-3, atol=2e-4,
        )
