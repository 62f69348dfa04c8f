"""Newton-ASIS interweaving move (models/hier_logistic.py newton mode):
one-step cross-validation against autodiff + dense linalg, and
newton-vs-mala end-to-end statistical equivalence.

The move is a Laplace-proposal MH on the z-fixed target
F(lt) = sum_g lik_g(mu + e^{lt} z) + log p(lt) with the PSD Gauss-Newton
metric M = sum_g (-H_g) o (d d^T) + diag(-prior''). The test recomputes
everything independently: F' via jax.grad THROUGH the reparameterization
(validating the chain-rule formula), the metric via jax.hessian of the
likelihood wrt beta, numpy Cholesky/solve for the proposal map, and the
explicit Gaussian q ratio.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.distributions import log_scale_guard
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_hier_logistic, synth_logistic
from nestmc.ops.loglik import logistic_loglik_padded


def test_one_step_matches_dense_linalg():
    C, G, p = 5, 6, 3
    data, _ = synth_logistic(jax.random.key(0), G=G, n=7, p=p)
    model = make_hier_logistic(data, tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton"),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    state = init_kernel_state(model, cfg, jax.random.key(1), data)
    move = model.joint_moves["asis_tau"]
    key = jax.random.key(9)
    scale = jnp.full((C, 1), 0.3)  # ignored in newton mode
    pos_up, cache_up, alpha = move(
        key, state.position, state.cache, scale, data
    )
    alpha_np = np.asarray(alpha)

    # ---- independent recomputation (float64 numpy + autodiff) ----
    beta = np.asarray(state.position["beta"], np.float64)
    mu = np.asarray(state.position["mu"], np.float64)
    lt0 = np.asarray(state.position["log_tau"], np.float64)
    a_ig, b_ig = 2.0, 0.5  # make_hier_logistic defaults

    def prior_lp(lt):
        from scipy.special import gammaln

        return np.sum(
            a_ig * np.log(b_ig) - gammaln(a_ig)
            - 2.0 * (a_ig + 1.0) * lt - b_ig * np.exp(-2.0 * lt)
            + np.log(2.0) + 2.0 * lt
        )

    k1, k2 = jax.random.split(key)
    eps = np.asarray(
        jax.random.normal(k1, (C, 2 * p), jnp.float32), np.float64
    )
    logu = np.asarray(jnp.log(jax.random.uniform(
        k2, (C,), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    )), np.float64)

    def lik_sum(beta_c):
        # (G, p) -> scalar total loglik for one chain
        return jnp.sum(logistic_loglik_padded(
            beta_c[None], data.x, data.y, data.mask
        ))

    S0 = 5.0  # make_hier_logistic default prior_mu_scale
    for c in range(C):
        z0 = (beta[c] - mu[c]) * np.exp(-lt0[c])    # fixed ancillary z

        def F_lik(th):
            # total loglik of the z-fixed shift+rescale through
            # theta = (mu, lt) — jax.grad of THIS validates the move's
            # chain-rule joint gradient formula
            mu_v, lt_v = th[:p], th[p:]
            bc = mu_v[None, :] + (
                jnp.asarray(z0, jnp.float32) * jnp.exp(lt_v)[None, :]
            )
            return lik_sum(bc)

        def metric_at(th):
            # M = sum_g J_g^T (-H_g) J_g + prior precision,
            # J_g = [I, diag(d_g)], d_g = e^{lt} z_g
            mu_v, lt_v = th[:p], th[p:]
            bc = mu_v[None, :] + z0 * np.exp(lt_v)[None, :]
            Hs = np.concatenate([
                -np.asarray(jax.hessian(
                    lambda bv, gi=gi: jnp.sum(
                        (data.y[gi] * (data.x[gi] @ bv)
                         - jax.nn.softplus(data.x[gi] @ bv)) * data.mask[gi]
                    )
                )(jnp.asarray(bc[gi], jnp.float32)), np.float64)[None]
                for gi in range(G)
            ])
            d = z0 * np.exp(lt_v)[None, :]
            M = np.zeros((2 * p, 2 * p))
            for gi in range(G):
                J = np.concatenate([np.eye(p), np.diag(d[gi])], axis=1)
                M += J.T @ Hs[gi] @ J
            M[:p, :p] += np.eye(p) / S0**2
            M[p:, p:] += np.diag(4.0 * b_ig * np.exp(-2.0 * lt_v))
            return M

        def prior_grad(th):
            mu_v, lt_v = th[:p], th[p:]
            return np.concatenate([
                -mu_v / S0**2,
                -2.0 * a_ig + 2.0 * b_ig * np.exp(-2.0 * lt_v),
            ])

        def full_grad(th):
            return np.asarray(
                jax.grad(F_lik)(jnp.asarray(th, jnp.float32)), np.float64
            ) + prior_grad(th)

        th0 = np.concatenate([mu[c], lt0[c]])
        M0 = metric_at(th0)
        L0 = np.linalg.cholesky(M0)
        mean0 = th0 + np.linalg.solve(M0, full_grad(th0))
        th1 = mean0 + np.linalg.solve(L0.T, eps[c])
        M1 = metric_at(th1)
        mean1 = th1 + np.linalg.solve(M1, full_grad(th1))

        def q_lp(a, mean, M):
            r = a - mean
            return -0.5 * r @ M @ r + 0.5 * np.linalg.slogdet(M)[1]

        def joint_lp(th):
            mu_v, lt_v = th[:p], th[p:]
            bc = jnp.asarray(
                mu_v[None, :] + z0 * np.exp(lt_v)[None, :], jnp.float32
            )
            guard = float(jnp.sum(log_scale_guard(
                jnp.asarray(lt_v, jnp.float32)
            )))
            return (
                float(lik_sum(bc)) + prior_lp(lt_v) + guard
                - 0.5 * np.sum(mu_v**2) / S0**2
            )

        la = (
            joint_lp(th1) - joint_lp(th0)
            + q_lp(th0, mean1, M1) - q_lp(th1, mean0, M0)
        )
        a_ext = min(1.0, np.exp(la))
        assert abs(a_ext - alpha_np[c]) < 5e-3, (c, la, alpha_np[c])
        accepted = logu[c] < la
        got_lt = np.asarray(pos_up["log_tau"])[c]
        got_mu = np.asarray(pos_up["mu"])[c]
        expect_lt = th1[p:] if accepted else lt0[c]
        expect_mu = th1[:p] if accepted else mu[c]
        np.testing.assert_allclose(got_lt, expect_lt, atol=5e-4)
        np.testing.assert_allclose(got_mu, expect_mu, atol=5e-4)


@pytest.mark.slow
def test_newton_and_mala_posteriors_agree():
    """End-to-end statistical equivalence: the Newton kernel + Newton-ASIS
    and the (independently validated) MALA + Langevin-ASIS paths must give
    the same posterior within Monte-Carlo tolerance."""
    from nestmc.engine import sample

    data, _ = synth_logistic(jax.random.key(8), G=60, n=20, p=3)
    run = RunConfig(chains=16, warmup=400, draws=800, seed=4,
                    collect={"mu": None, "log_tau": None},
                    log_every_segment=False)
    posts = {}
    for algo in ("newton", "mala"):
        model = make_hier_logistic(data, tau_prior="invgamma")
        posts[algo] = sample(
            model, data,
            SamplerConfig(kernel=KernelConfig(algorithm=algo), run=run),
        )
    for name in ("mu", "log_tau"):
        m1 = np.asarray(jnp.mean(posts["newton"].draws[name], axis=(0, 1)))
        m0 = np.asarray(jnp.mean(posts["mala"].draws[name], axis=(0, 1)))
        s0 = np.asarray(jnp.std(posts["mala"].draws[name], axis=(0, 1)))
        v1 = np.asarray(jnp.var(posts["newton"].draws[name], axis=(0, 1)))
        v0 = np.asarray(jnp.var(posts["mala"].draws[name], axis=(0, 1)))
        assert np.all(np.abs(m1 - m0) < 0.35 * s0 + 0.03), (name, m1, m0)
        assert np.all(np.abs(v1 - v0) < 0.5 * v0 + 0.01), (name, v1, v0)
