"""Posterior-predictive simulation (nestmc/predictive.py): replicated
datasets from posterior draws + predictive p-values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc import (
    RunConfig,
    SamplerConfig,
    posterior_predictive,
    predictive_pvalue,
    sample,
)
from nestmc.models import make_hier_logistic, synth_logistic


@pytest.fixture(scope="module")
def fit():
    data, truth = synth_logistic(jax.random.key(4), G=40, n=20, p=3)
    model = make_hier_logistic(data, tau_prior="invgamma",
                               loglik_impl="jnp")
    post = sample(model, data, SamplerConfig(run=RunConfig(
        chains=8, warmup=400, draws=400, log_every_segment=False,
    )))  # collect=None -> full blocks, as the simulator requires
    return model, data, post


def test_replicates_shape_and_calibration(fit):
    model, data, post = fit
    y_rep = posterior_predictive(model, post, data,
                                 jax.random.key(1), num=48)
    assert y_rep.shape == (48,) + data.y.shape
    assert bool(jnp.isfinite(y_rep).all())
    # well-specified model: observed mean is typical of replicates
    pval = float(predictive_pvalue(y_rep, data))
    assert 0.02 < pval < 0.98, pval
    # replicates vary across draws (not one frozen parameter)
    means = np.asarray(jnp.mean(y_rep, axis=(1, 2)))
    assert np.std(means) > 0


def test_custom_statistic(fit):
    model, data, post = fit
    y_rep = posterior_predictive(model, post, data,
                                 jax.random.key(2), num=32)

    def frac_ones(y, m):
        return jnp.sum(y * m) / jnp.sum(m)

    pval = float(predictive_pvalue(y_rep, data, stat=frac_ones))
    assert 0.0 <= pval <= 1.0


def test_partial_collection_of_unread_blocks_ok():
    """Blocks the simulator never reads (mu, log_tau for hier_logistic —
    sample_data reads only beta) may be partially collected; only READ
    blocks must be full (VERDICT r2 item 10)."""
    data, _ = synth_logistic(jax.random.key(5), G=20, n=10, p=2)
    model = make_hier_logistic(data, loglik_impl="jnp")
    post = sample(model, data, SamplerConfig(run=RunConfig(
        chains=4, warmup=100, draws=100, log_every_segment=False,
        collect={"beta": None, "mu": None, "log_tau": 1},
    )))
    y_rep = posterior_predictive(model, post, data,
                                 jax.random.key(3), num=8)
    assert y_rep.shape == (8,) + data.y.shape

    # a partially collected READ block raises the informative error
    post2 = sample(model, data, SamplerConfig(run=RunConfig(
        chains=4, warmup=100, draws=100, log_every_segment=False,
        collect={"beta": 4, "mu": None, "log_tau": None},
    )))
    with pytest.raises(ValueError, match="fully collected"):
        posterior_predictive(model, post2, data, jax.random.key(3), num=8)


def test_requires_simulator():
    import dataclasses

    data, _ = synth_logistic(jax.random.key(4), G=8, n=5, p=2)
    model = make_hier_logistic(data, loglik_impl="jnp")
    broken = dataclasses.replace(model, sample_data=None)

    class _P:  # minimal stand-in
        draws = {"beta": jnp.zeros((2, 3, 8, 2))}

    with pytest.raises(ValueError, match="sample_data"):
        posterior_predictive(broken, _P(), data)
