"""Sampler moments vs closed-form posteriors (conjugate linear-Gaussian).

The strongest correctness check available without the reference: the
hierarchical normal model with known scales has an exact Gaussian posterior;
the sampler's posterior means/variances must land within z * MCSE of it
(BASELINE.json:5 'match ... within Monte-Carlo tolerance', re-anchored to
analytic truth per SURVEY.md section 0.2).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models import (
    analytic_hier_normal_posterior,
    make_hier_normal_known_scales,
    synth_hier_normal,
)

SIGMA, TAU, M0, S0 = 1.0, 1.5, 0.0, 3.0


@pytest.fixture(scope="module")
def run():
    data = synth_hier_normal(
        jax.random.key(11), G=15, n=8, sigma=SIGMA, tau=TAU, m0=M0, s0=S0
    )
    model = make_hier_normal_known_scales(
        data, sigma=SIGMA, tau=TAU, m0=M0, s0=S0
    )
    cfg = SamplerConfig(
        run=RunConfig(
            chains=32, warmup=1500, draws=2500, seed=2,
            log_every_segment=False,
        ),
    )
    post = sample(model, data, cfg)
    truth = analytic_hier_normal_posterior(data, SIGMA, TAU, M0, S0)
    return post, truth


def test_converged(run):
    post, _ = run
    assert post.worst_rhat() < 1.02


def test_mu_mean_exact(run):
    post, truth = run
    d = post.diagnostics()["mu"]
    mcse = float(d["mcse_mean"])
    err = abs(float(d["mean"]) - truth["mu_mean"])
    assert err < 5 * mcse, f"mu mean err {err} vs 5*mcse {5 * mcse}"


def test_mu_var_exact(run):
    post, truth = run
    v = float(post.var("mu"))
    ess = float(post.diagnostics()["mu"]["ess_bulk"])
    # var of a variance estimate ~ 2 var^2 / ess
    tol = 5 * truth["mu_var"] * np.sqrt(2.0 / ess)
    assert abs(v - truth["mu_var"]) < tol


def test_theta_means_exact(run):
    post, truth = run
    d = post.diagnostics()["theta"]
    err = np.abs(np.asarray(d["mean"]) - truth["theta_mean"])
    tol = 5 * np.asarray(d["mcse_mean"])
    assert np.all(err < tol), f"max err {err.max()}, tol {tol.min()}"


def test_theta_vars_exact(run):
    post, truth = run
    v = np.asarray(post.var("theta"))
    ess = np.asarray(post.diagnostics()["theta"]["ess_bulk"])
    tol = 5 * truth["theta_var"] * np.sqrt(2.0 / ess)
    assert np.all(np.abs(v - truth["theta_var"]) < tol)
