"""Nested Poisson GLMM: conjugate middle-level draw validated against the
plain-MH sampler (same posterior), plus posterior recovery."""

import dataclasses

import numpy as np
import pytest

import jax

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models import make_nested_poisson, synth_poisson3


@pytest.fixture(scope="module")
def setup():
    data, truth = synth_poisson3(
        jax.random.key(3), G=24, subjects_per_group=4, n=10, p=2
    )
    model = make_nested_poisson(data, loglik_impl="jnp")
    return data, truth, model


def _run(model, data, seed=2):
    cfg = SamplerConfig(run=RunConfig(
        chains=16, warmup=800, draws=1200, seed=seed,
        log_every_segment=False,
        collect={"mu": None, "log_tau_g": None, "log_tau_s": None,
                 "beta_g": 4},
    ))
    return sample(model, data, cfg)


@pytest.mark.slow
def test_conjugate_beta_g_matches_mh(setup):
    """The exact conjugate draw of beta_g must target the same posterior as
    plain per-unit MH on beta_g (statistical agreement of moments)."""
    data, _, model = setup
    assert "beta_g" in model.gibbs_draws
    mh_model = dataclasses.replace(
        model,
        gibbs_draws={"mu": model.gibbs_draws["mu"]},  # drop beta_g draw
    )
    a = _run(model, data)
    b = _run(mh_model, data)
    for k in ("mu", "log_tau_g", "beta_g"):
        ma, mb = np.asarray(a.mean(k)), np.asarray(b.mean(k))
        sa = np.asarray(a.diagnostics()[k]["mcse_mean"])
        sb = np.asarray(b.diagnostics()[k]["mcse_mean"])
        tol = 6 * np.sqrt(sa**2 + sb**2) + 0.02
        assert np.all(np.abs(ma - mb) < tol), (k, ma, mb, tol)


@pytest.mark.slow
def test_conjugate_tau_matches_mh_tau(setup):
    """Under the inverse-gamma prior, exact conjugate tau draws must target
    the same posterior as per-coordinate MH on log tau."""
    data, _, _ = setup
    conj = make_nested_poisson(
        data, loglik_impl="jnp", tau_prior="invgamma"
    )
    assert "log_tau_g" in conj.gibbs_draws
    mh = dataclasses.replace(
        conj,
        gibbs_draws={
            k: v for k, v in conj.gibbs_draws.items()
            if not k.startswith("log_tau")
        },
    )
    a = _run(conj, data)
    b = _run(mh, data)
    for k in ("mu", "log_tau_g", "log_tau_s"):
        ma, mb = np.asarray(a.mean(k)), np.asarray(b.mean(k))
        sa = np.asarray(a.diagnostics()[k]["mcse_mean"])
        sb = np.asarray(b.diagnostics()[k]["mcse_mean"])
        tol = 6 * np.sqrt(sa**2 + sb**2) + 0.03
        assert np.all(np.abs(ma - mb) < tol), (k, ma, mb, tol)


def test_posterior_recovery(setup):
    data, truth, model = setup
    post = _run(model, data)
    assert post.worst_rhat() < 1.15  # small config; sane convergence
    mu_hat = np.asarray(post.mean("mu"))
    sd = np.asarray(post.diagnostics()["mu"]["sd"])
    assert np.all(
        np.abs(mu_hat - np.asarray(truth["mu"])) < 4 * sd + 0.1
    )
    assert float(np.mean(np.asarray(post.accept_rates["beta_g"]))) == 1.0
