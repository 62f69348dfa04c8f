"""One-step exactness of the gradient (Langevin) ASIS interweaving move.

The move's acceptance probability is reproduced INDEPENDENTLY from public
API: the z-fixed target is

    F(lt') = joint_logdensity({beta: mu + e^{lt'} z, log_tau: lt'})
             + G * sum_k lt'_k          (Jacobian of the beta -> z change)

with gradients by jax.grad (the move itself uses a hand-derived chain
rule through the cached likelihood gradient — any disagreement in drift,
q-correction, or prior-gradient formulas fails this test). MH trajectory
comparisons are chaotic; one-step acceptance probabilities are the stable
contract (CLAUDE.md statistical design notes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.models.hier_logistic import make_hier_logistic, synth_logistic

C = 8


def _setup(tau_prior):
    data, _ = synth_logistic(jax.random.key(3), G=20, n=10, p=3)
    model = make_hier_logistic(
        data, loglik_impl="jnp", tau_prior=tau_prior
    )
    position = model.init_state(jax.random.key(4), data, C)
    self_vag, _ = model.cond_cached_grad["beta"]
    v, g = self_vag(position["beta"], data)
    cache = {"beta": {"v": v, "g": g}}
    return data, model, position, cache


def _ref_target(model, position, data, G):
    beta, mu, lt0 = (
        position["beta"], position["mu"], position["log_tau"],
    )
    tau_z = beta - mu[:, None, :]  # e^{lt0} z, fixed across the move

    def F(lt):
        beta_p = mu[:, None, :] + tau_z * jnp.exp(lt - lt0)[:, None, :]
        st = {"beta": beta_p, "mu": mu, "log_tau": lt}
        return model.joint_logdensity(st, data) + G * jnp.sum(lt, axis=-1)

    gF = jax.grad(lambda lt: jnp.sum(F(lt)))
    return F, gF


@pytest.mark.parametrize("tau_prior", ["halfnormal", "invgamma"])
def test_grad_asis_one_step_alpha_matches_autodiff(tau_prior):
    data, model, position, cache = _setup(tau_prior)
    G = data.num_groups
    key = jax.random.key(11)
    scale = jnp.full((C, 1), 0.05, jnp.float32)
    pos_up, cache_up, alpha = model.joint_moves["asis_tau"](
        key, position, cache, scale, data
    )

    # independent replay: same key split discipline as the move
    lt = position["log_tau"]
    k1, _ = jax.random.split(key)
    eps = jax.random.normal(k1, lt.shape, lt.dtype)
    F, gF = _ref_target(model, position, data, G)
    s = scale  # (C, 1)
    g_old = gF(lt)
    lt_new = lt + 0.5 * s * s * g_old + s * eps
    g_new = gF(lt_new)
    fwd = lt_new - lt - 0.5 * s * s * g_old
    rev = lt - lt_new - 0.5 * s * s * g_new
    log_alpha_ref = (
        F(lt_new) - F(lt)
        + jnp.sum(fwd * fwd - rev * rev, axis=-1) / (2.0 * s[:, 0] ** 2)
    )
    alpha_ref = jnp.exp(jnp.minimum(log_alpha_ref, 0.0))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), rtol=0, atol=2e-3
    )

    # the refreshed cache must hold the likelihood (value, grad) of the
    # SELECTED position (accepted -> proposal, rejected -> current)
    self_vag, _ = model.cond_cached_grad["beta"]
    v_sel, g_sel = self_vag(pos_up["beta"], data)
    np.testing.assert_allclose(
        np.asarray(cache_up["beta"]["v"]), np.asarray(v_sel),
        rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cache_up["beta"]["g"]), np.asarray(g_sel),
        rtol=0, atol=1e-4,
    )


def test_rw_asis_one_step_alpha_matches_reference():
    """Without a grad cache the move must stay a plain random walk."""
    data, model, position, cache_g = _setup("halfnormal")
    G = data.num_groups
    cache = {"beta": cache_g["beta"]["v"]}          # plain carried lik
    key = jax.random.key(12)
    scale = jnp.full((C, 1), 0.05, jnp.float32)
    _, _, alpha = model.joint_moves["asis_tau"](
        key, position, cache, scale, data
    )
    lt = position["log_tau"]
    k1, _ = jax.random.split(key)
    eps = jax.random.normal(k1, lt.shape, lt.dtype)
    F, _ = _ref_target(model, position, data, G)
    lt_new = lt + scale * eps
    alpha_ref = jnp.exp(jnp.minimum(F(lt_new) - F(lt), 0.0))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(alpha_ref), rtol=0, atol=2e-3
    )


def test_asis_adapts_to_mala_target_under_mala():
    """End-to-end: under algorithm=mala the interweaving move's scale
    adapts toward the MALA optimum (0.574) via the model's "auto"
    joint_move_target_accept; under rwmh it stays at the RW 0.234."""
    import dataclasses

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.kernels.gibbs import make_sweep
    from nestmc.kernels.state import init_kernel_state

    data, _ = synth_logistic(jax.random.key(5), G=16, n=8, p=2)
    model = make_hier_logistic(
        data, loglik_impl="jnp", tau_prior="halfnormal"
    )
    assert model.joint_move_target_accept.get("asis_tau") == "auto"
    got = {}
    for algorithm, n_adapt in (("mala", 400), ("rwmh", 400)):
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm=algorithm),
            run=RunConfig(chains=32, log_every_segment=False),
        )
        sweep = make_sweep(model, cfg)
        ks = init_kernel_state(model, cfg, jax.random.key(6), data)

        def step(carry, _):
            return sweep(carry, data, adapt=True), None

        ks, _ = jax.lax.scan(step, ks, None, length=n_adapt)
        before = ks.accept_sum["asis_tau"]
        ks2, _ = jax.lax.scan(step, ks, None, length=150)
        rate = float(jnp.mean(
            (ks2.accept_sum["asis_tau"] - before) / 150.0
        ))
        got[algorithm] = rate
    assert abs(got["mala"] - 0.574) < 0.12, got
    assert abs(got["rwmh"] - 0.234) < 0.12, got
