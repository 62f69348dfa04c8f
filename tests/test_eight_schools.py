"""8-schools: sampler vs high-precision 2D deterministic quadrature.

The (mu, log tau) marginal posterior is a 2D integral (theta integrates out
in closed form since everything is Gaussian given tau); a dense float64 grid
gives reference moments to compare the sampler against (BASELINE.json:7).
"""

import numpy as np
import pytest

import jax

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models import make_eight_schools

PRIOR_MU_SCALE = 10.0
PRIOR_TAU_SCALE = 5.0


def quadrature_reference():
    """Posterior moments of mu, tau, theta via dense grid quadrature."""
    y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    mu = np.linspace(-25.0, 40.0, 800)
    ltau = np.linspace(-7.0, 4.5, 800)
    MU, LT = np.meshgrid(mu, ltau, indexing="ij")
    TAU = np.exp(LT)
    # log p(y | mu, tau) with theta marginalized: y_j ~ N(mu, sigma_j^2+tau^2)
    var = sigma[None, None, :] ** 2 + TAU[..., None] ** 2
    loglik = -0.5 * np.sum(
        (y[None, None, :] - MU[..., None]) ** 2 / var + np.log(2 * np.pi * var),
        axis=-1,
    )
    # priors: mu ~ N(0, 10^2); tau ~ HalfCauchy(5) with log-jacobian
    logprior = (
        -0.5 * (MU / PRIOR_MU_SCALE) ** 2
        - np.log1p((TAU / PRIOR_TAU_SCALE) ** 2)
        + LT
    )
    logpost = loglik + logprior
    w = np.exp(logpost - logpost.max())
    w /= w.sum()
    mu_mean = np.sum(w * MU)
    mu_var = np.sum(w * (MU - mu_mean) ** 2)
    tau_mean = np.sum(w * TAU)
    # theta_j | mu, tau, y is Gaussian: mean (a_j y_j + b mu)/(a_j + b)
    a = 1.0 / sigma**2
    b = 1.0 / TAU[..., None] ** 2
    theta_mean_cond = (a * y + b * MU[..., None]) / (a + b)
    theta_mean = np.sum(w[..., None] * theta_mean_cond, axis=(0, 1))
    return {
        "mu_mean": mu_mean,
        "mu_var": mu_var,
        "tau_mean": tau_mean,
        "theta_mean": theta_mean,
    }


@pytest.fixture(scope="module")
def run():
    model, data = make_eight_schools()
    cfg = SamplerConfig(
        run=RunConfig(
            chains=64, warmup=2000, draws=4000, seed=8,
            log_every_segment=False, segment_size=2000,
        ),
    )
    return sample(model, data, cfg), quadrature_reference()


def test_converged(run):
    post, _ = run
    assert post.worst_rhat() < 1.01


def test_mu_matches_quadrature(run):
    post, ref = run
    d = post.diagnostics()["mu"]
    err = abs(float(d["mean"]) - ref["mu_mean"])
    assert err < 6 * float(d["mcse_mean"]), (
        f"mu {float(d['mean']):.3f} vs quadrature {ref['mu_mean']:.3f}"
    )
    v = float(post.var("mu"))
    ess = float(d["ess_bulk"])
    assert abs(v - ref["mu_var"]) < 6 * ref["mu_var"] * np.sqrt(2 / ess)


def test_tau_matches_quadrature(run):
    post, ref = run
    import jax.numpy as jnp

    tau_draws = jnp.exp(post.draws["log_tau"])
    tau_mean = float(jnp.mean(tau_draws))
    from nestmc.diagnostics import ess as ess_fn

    se = float(jnp.std(tau_draws) / np.sqrt(float(ess_fn(tau_draws))))
    assert abs(tau_mean - ref["tau_mean"]) < 6 * se, (
        f"tau {tau_mean:.3f} vs quadrature {ref['tau_mean']:.3f}"
    )


def test_theta_matches_quadrature(run):
    post, ref = run
    d = post.diagnostics()["theta"]
    err = np.abs(np.asarray(d["mean"]) - ref["theta_mean"])
    tol = 6 * np.asarray(d["mcse_mean"])
    assert np.all(err < tol), f"theta err {err} vs tol {tol}"
