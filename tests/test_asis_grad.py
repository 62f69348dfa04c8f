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
    """The grad-mode move is now the JOINT (mu, tau) metric ASIS: a
    preconditioned Langevin step on theta = (mu, log_tau) with the
    data-constant Hessian-bound metric Mb. Reproduced independently: the
    z-fixed target by jax.grad THROUGH the shift+rescale (validating the
    move's hand-derived chain-rule gradient), Mb = 0.25 sum x x^T + prior
    precision by numpy, the proposal map by dense Cholesky/solve, and the
    explicit Gaussian q ratio."""
    data, model, position, cache = _setup(tau_prior)
    G = data.num_groups
    p = data.num_covariates
    key = jax.random.key(11)
    scale = jnp.full((C, 1), 0.4, jnp.float32)
    pos_up, cache_up, alpha = model.joint_moves["asis_tau"](
        key, position, cache, scale, data
    )

    # independent replay: same key split discipline as the move
    beta0 = np.asarray(position["beta"], np.float64)
    mu0 = np.asarray(position["mu"], np.float64)
    lt0 = np.asarray(position["log_tau"], np.float64)
    k1, k2 = jax.random.split(key)
    eps = np.asarray(
        jax.random.normal(k1, (C, 2 * p), jnp.float32), np.float64
    )
    logu = np.asarray(jnp.log(jax.random.uniform(
        k2, (C,), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    )), np.float64)

    # z-fixed joint target via the model's own joint density + Jacobian
    def F_one(th, c):
        z = (beta0[c] - mu0[c]) * np.exp(-lt0[c])
        thj = jnp.asarray(th, jnp.float32)

        def f(thj):
            mu_j, lt_j = thj[:p], thj[p:]
            bp = mu_j[None, :] + jnp.asarray(z, jnp.float32) * jnp.exp(
                lt_j
            )[None, :]
            st = {
                "beta": bp[None],
                "mu": mu_j[None],
                "log_tau": lt_j[None],
            }
            return (
                model.joint_logdensity(st, data)[0]
                + G * jnp.sum(lt_j)
            )

        return float(f(thj)), np.asarray(
            jax.grad(lambda t: f(t))(thj), np.float64
        )

    # Hessian-bound metric, independently from the raw data
    xm = np.asarray(data.x, np.float64) * np.asarray(
        data.mask, np.float64
    )[:, :, None]
    xxt = 0.25 * np.einsum("gni,gnj->gij", xm, np.asarray(data.x))
    S0 = 5.0
    if tau_prior == "invgamma":
        a_ig, b_ig = 2.0, 0.5
        pm = lambda ltv: 4.0 * b_ig * np.exp(-2.0 * ltv)  # noqa: E731
    else:
        pm = lambda ltv: 2.0 * np.exp(2.0 * ltv) / 2.0**2  # noqa: E731

    def metric(th, c):
        mu_v, lt_v = th[:p], th[p:]
        z = (beta0[c] - mu0[c]) * np.exp(-lt0[c])
        d = z * np.exp(lt_v)[None, :]
        M = np.zeros((2 * p, 2 * p))
        for gi in range(G):
            J = np.concatenate([np.eye(p), np.diag(d[gi])], axis=1)
            M += J.T @ xxt[gi] @ J
        M[:p, :p] += np.eye(p) / S0**2
        M[p:, p:] += np.diag(pm(lt_v))
        return M

    alpha_np = np.asarray(alpha)
    for c in range(C):
        s = 0.4
        th0 = np.concatenate([mu0[c], lt0[c]])
        F0, gF0 = F_one(th0, c)
        M0 = metric(th0, c)
        L0 = np.linalg.cholesky(M0)
        mean0 = th0 + 0.5 * s * s * np.linalg.solve(M0, gF0)
        th1 = mean0 + s * np.linalg.solve(L0.T, eps[c])
        F1, gF1 = F_one(th1, c)
        M1 = metric(th1, c)
        mean1 = th1 + 0.5 * s * s * np.linalg.solve(M1, gF1)

        def q_lp(a, mean, M):
            r = a - mean
            return (
                -0.5 * r @ M @ r / (s * s)
                + 0.5 * np.linalg.slogdet(M)[1]
            )

        la = F1 - F0 + q_lp(th0, mean1, M1) - q_lp(th1, mean0, M0)
        a_ext = min(1.0, np.exp(la))
        assert abs(a_ext - alpha_np[c]) < 5e-3, (c, la, alpha_np[c])
        accepted = logu[c] < la
        np.testing.assert_allclose(
            np.asarray(pos_up["log_tau"])[c],
            th1[p:] if accepted else lt0[c], atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(pos_up["mu"])[c],
            th1[:p] if accepted else mu0[c], atol=5e-4,
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
