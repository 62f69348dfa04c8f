"""Fused Newton step kernel (ops/pallas/newton_accept.py) contracts.

(1) EXACT parity: with external noise operands the kernel reproduces the
unfused kernels/newton.py update (same proposal map, correction, accepts)
to float tolerance in interpret mode. (2) TPU tier (NESTMC_TPU_TESTS=1):
on-core-PRNG runs agree statistically with the unfused path (one-step
acceptance levels + long-run moments — trajectory comparisons are chaotic
per CLAUDE.md).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.kernels.newton import newton_update
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_hier_logistic, synth_logistic

ON_TPU = jax.default_backend() == "tpu"
TPU_TESTS = os.environ.get("NESTMC_TPU_TESTS") == "1"


def _setup(C=8, G=13, n=9, p=3, dense=False):
    data, _ = synth_logistic(jax.random.key(17), G=G, n=n, p=p)
    if not dense:
        mask = np.array(data.mask)
        mask[0, n - 3:] = 0.0
        import dataclasses

        data = dataclasses.replace(
            data, mask=jnp.asarray(mask), y=data.y * jnp.asarray(mask)
        )
    model = make_hier_logistic(data, tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton"),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    state = init_kernel_state(model, cfg, jax.random.key(1), data)
    return data, model, state


@pytest.mark.parametrize("dense", [False, True])
def test_external_noise_exact_parity(dense):
    from nestmc.ops.pallas.newton_accept import fused_newton_logistic_step

    data, model, state = _setup(dense=dense)
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(42)
    log_scale = state.log_scale["beta"]                  # zeros (c = 1)

    # the unfused update's internal noise, replicated
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (C, G, p), jnp.float32)
    logu = jnp.log(jax.random.uniform(
        k_u, (C, G), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    ))

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = newton_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"],
    )

    c = state.cache["beta"]
    new_beta, new_v, new_g, new_h, alpha = fused_newton_logistic_step(
        key, beta, c["v"], c["g"], c["h"], log_scale,
        state.position["mu"], state.position["log_tau"],
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
        np.asarray(new_v), np.asarray(ref_cache["v"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_g), np.asarray(ref_cache["g"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_h), np.asarray(ref_cache["h"]), atol=2e-4
    )


@pytest.mark.parametrize("dense", [False, True])
def test_external_noise_exact_parity_frozen(dense):
    """Frozen-metric mode (KernelConfig.newton_freeze sampling phase):
    fused and unfused kernels agree exactly with external noise, and the
    carried Hessian passes through untouched."""
    from nestmc.ops.pallas.newton_accept import fused_newton_logistic_step

    data, model, state = _setup(dense=dense)
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(43)
    log_scale = state.log_scale["beta"]

    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (C, G, p), jnp.float32)
    logu = jnp.log(jax.random.uniform(
        k_u, (C, G), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    ))

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = newton_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"], frozen=True,
    )

    c = state.cache["beta"]
    new_beta, new_v, new_g, new_h, alpha = fused_newton_logistic_step(
        key, beta, c["v"], c["g"], c["h"], log_scale,
        state.position["mu"], state.position["log_tau"],
        data.x, data.y, data.mask,
        interpret=True, noise=(eps, logu), dense=dense, frozen=True,
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_beta), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_v), np.asarray(ref_cache["v"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_g), np.asarray(ref_cache["g"]), atol=2e-4
    )
    # the frozen metric is passed through IDENTICALLY (no select, no write)
    assert new_h is c["h"]
    assert ref_cache["h"] is c["h"]


@pytest.mark.skipif(
    not (ON_TPU and TPU_TESTS),
    reason="on-core PRNG path needs a real TPU (NESTMC_TPU_TESTS=1)",
)
def test_fused_newton_statistical_equivalence_tpu():
    """Long runs with the on-core-PRNG fused kernel vs the unfused path:
    acceptance levels and posterior moments must agree."""
    from nestmc.engine import sample

    data, _ = synth_logistic(jax.random.key(5), G=64, n=20, p=3)
    model = make_hier_logistic(data, tau_prior="invgamma")
    run = RunConfig(chains=32, warmup=300, draws=600, seed=11,
                    collect={"mu": None, "log_tau": None},
                    log_every_segment=False)
    posts = {}
    for fused in (True, False):
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm="newton", fused_accept=fused),
            run=run,
        )
        posts[fused] = sample(model, data, cfg)
    a1 = float(jnp.mean(posts[True].accept_rates["beta"]))
    a0 = float(jnp.mean(posts[False].accept_rates["beta"]))
    assert abs(a1 - a0) < 0.05, (a1, a0)
    for name in ("mu", "log_tau"):
        m1 = np.asarray(jnp.mean(posts[True].draws[name], axis=(0, 1)))
        m0 = np.asarray(jnp.mean(posts[False].draws[name], axis=(0, 1)))
        s = np.asarray(jnp.std(posts[False].draws[name], axis=(0, 1)))
        assert np.all(np.abs(m1 - m0) < 0.5 * s + 0.05), (name, m1, m0)
