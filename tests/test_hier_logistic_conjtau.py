"""Conjugate inverse-gamma tau for hier_logistic (ported from
nested_poisson, VERDICT round-1 item 8): the exact draw must target the
same posterior as per-coordinate MH on log tau under the SAME prior."""

import dataclasses

import numpy as np
import pytest

import jax

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models import make_hier_logistic, synth_logistic


@pytest.fixture(scope="module")
def setup():
    data, truth = synth_logistic(jax.random.key(5), G=50, n=20, p=3)
    return data, truth


def _run(model, data, seed=2):
    cfg = SamplerConfig(run=RunConfig(
        chains=16, warmup=800, draws=1200, seed=seed,
        log_every_segment=False,
        collect={"mu": None, "log_tau": None, "beta": 8},
    ))
    return sample(model, data, cfg)


@pytest.mark.slow
def test_conjugate_tau_matches_mh_tau(setup):
    data, _ = setup
    conj = make_hier_logistic(
        data, loglik_impl="jnp", tau_prior="invgamma"
    )
    assert "log_tau" in conj.gibbs_draws
    mh = dataclasses.replace(
        conj,
        gibbs_draws={"mu": conj.gibbs_draws["mu"]},  # drop the tau draw
    )
    a = _run(conj, data)
    b = _run(mh, data)
    assert float(np.mean(np.asarray(a.accept_rates["log_tau"]))) == 1.0
    for k in ("mu", "log_tau", "beta"):
        ma, mb = np.asarray(a.mean(k)), np.asarray(b.mean(k))
        sa = np.asarray(a.diagnostics()[k]["mcse_mean"])
        sb = np.asarray(b.diagnostics()[k]["mcse_mean"])
        tol = 6 * np.sqrt(sa**2 + sb**2) + 0.03
        assert np.all(np.abs(ma - mb) < tol), (k, ma, mb, tol)


def test_halfnormal_variant_unchanged(setup):
    """The default (halfnormal) build must NOT gain a tau gibbs draw."""
    data, _ = setup
    model = make_hier_logistic(data, loglik_impl="jnp")
    assert "log_tau" not in model.gibbs_draws
    assert "mu" in model.gibbs_draws
