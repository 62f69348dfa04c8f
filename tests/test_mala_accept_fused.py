"""Fused MALA propose+logp+grad+accept kernel (ops/pallas/mala_accept.py).

Two tiers:

1. CPU exact parity (interpret mode, EXTERNAL noise): with eps/log-u
   passed in as operands the kernel is a deterministic function, and every
   piece of MALA math (full-conditional grads, prior deltas, asymmetric
   correction, cache refresh, select) must match the unfused
   kernels/mala.py formulas evaluated with the SAME noise.
2. TPU statistical equivalence (NESTMC_TPU_TESTS=1): fused (on-core PRNG)
   vs threefry samplers agree on acceptance rates and posterior moments
   (one-step acceptance + long-run moments, not trajectories —
   CLAUDE.md rule).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import KernelConfig, RunConfig, SamplerConfig, sample
from nestmc.models import make_hier_logistic, synth_logistic
from nestmc.ops.pallas.mala_accept import fused_mala_logistic_step


def _setup(C=8, G=21, n=9, p=3, seed=5):
    data, _ = synth_logistic(jax.random.key(seed), G=G, n=n, p=p)
    model = make_hier_logistic(data, loglik_impl="jnp")
    ks = jax.random.split(jax.random.key(seed + 1), 4)
    position = {
        "beta": 0.4 * jax.random.normal(ks[0], (C, G, p)),
        "mu": 0.3 * jax.random.normal(ks[1], (C, p)),
        "log_tau": -0.4 + 0.2 * jax.random.normal(ks[2], (C, p)),
    }
    log_scale = jnp.full((C, G), -1.3)
    return model, data, position, log_scale


def _reference(model, data, position, log_scale, eps, logu):
    """Unfused MALA math (kernels/mala.py formulas) with explicit noise."""
    beta, mu, lt = position["beta"], position["mu"], position["log_tau"]
    itau2 = jnp.exp(-2.0 * lt)[:, None, :]
    lik_vag = model.cond_cached_grad["beta"][0]

    def g_full(b):
        v, g = lik_vag(b, data)
        return v, g, g - (b - mu[:, None, :]) * itau2

    s = jnp.exp(log_scale)[:, :, None]
    s2 = s * s
    v_old, gl_old, gf_old = g_full(beta)
    prop = beta + 0.5 * s2 * gf_old + s * eps
    v_new, gl_new, gf_new = g_full(prop)
    dp = prop - mu[:, None, :]
    db = beta - mu[:, None, :]
    d_delta = (
        v_new - v_old
        + jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=-1)
    )
    fwd = s * eps
    rev = beta - prop - 0.5 * s2 * gf_new
    q_delta = jnp.sum(fwd * fwd - rev * rev, axis=-1) / (
        2.0 * jnp.exp(2.0 * log_scale)
    )
    log_alpha = d_delta + q_delta
    accept = logu < log_alpha
    a3 = accept[:, :, None]
    return {
        "beta": jnp.where(a3, prop, beta),
        "v": jnp.where(accept, v_new, v_old),
        "g": jnp.where(a3, gl_new, gl_old),
        "alpha": jnp.where(
            jnp.isnan(log_alpha), 0.0,
            jnp.exp(jnp.minimum(log_alpha, 0.0)),
        ),
    }


@pytest.mark.parametrize("dims", [(8, 21, 9, 3), (16, 13, 5, 2),
                                  (8, 64, 16, 4)])
def test_exact_parity_with_external_noise(dims):
    C, G, n, p = dims
    model, data, position, log_scale = _setup(C, G, n, p, seed=5 + p)
    v, g = model.cond_cached_grad["beta"][0](position["beta"], data)
    ke, ku = jax.random.split(jax.random.key(77))
    eps = jax.random.normal(ke, (C, G, p), jnp.float32)
    # spread log-u wide so both accept and reject branches are exercised
    logu = jnp.log(jax.random.uniform(ku, (C, G), jnp.float32,
                                      minval=1e-8))
    nb, nv, ng, alpha = fused_mala_logistic_step(
        jax.random.key(0), position["beta"], v, g, log_scale,
        position["mu"], position["log_tau"],
        data.x, data.y, data.mask, interpret=True, noise=(eps, logu),
    )
    ref = _reference(model, data, position, log_scale, eps, logu)
    assert 0.05 < float(jnp.mean(ref["alpha"])) < 0.999
    # tolerances sized for f32 op-order variation between backends (the
    # jnp reference runs on whatever jax.default_backend() is, the kernel
    # in interpret mode): measured <=3e-4 abs on TPU, while a real MH-math
    # bug (wrong correction sign, stale cache) shifts results O(1)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref["alpha"]),
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(nb), np.asarray(ref["beta"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(nv), np.asarray(ref["v"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ng), np.asarray(ref["g"]),
                               rtol=1e-3, atol=5e-4)


def test_nan_proposal_rejects():
    """A NaN log-alpha (e.g. overflowed proposal) must reject, not accept."""
    model, data, position, log_scale = _setup(C=8, G=21, n=9, p=3)
    v, g = model.cond_cached_grad["beta"][0](position["beta"], data)
    eps = jnp.full((8, 21, 3), jnp.inf, jnp.float32)  # blows up proposal
    logu = jnp.full((8, 21), -1.0, jnp.float32)
    nb, nv, ng, alpha = fused_mala_logistic_step(
        jax.random.key(0), position["beta"], v, g, log_scale,
        position["mu"], position["log_tau"],
        data.x, data.y, data.mask, interpret=True, noise=(eps, logu),
    )
    np.testing.assert_allclose(np.asarray(alpha), 0.0)
    np.testing.assert_allclose(np.asarray(nb),
                               np.asarray(position["beta"]))


@pytest.mark.tpu
def test_fused_mala_sampler_statistically_matches_unfused():
    if jax.default_backend() != "tpu":
        pytest.skip("fused MALA kernel requires the real TPU PRNG")
    data, _ = synth_logistic(jax.random.key(29), G=64, n=16, p=2)
    model = make_hier_logistic(data)
    assert "beta" in model.fused_updates_mala

    def run(fused):
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm="mala", fused_accept=fused),
            run=RunConfig(
                chains=64, warmup=300, draws=500, seed=13,
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
