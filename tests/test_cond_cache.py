"""The carried-likelihood optimization must not change the Markov chain.

Same model, same seed, with and without the cond_cached split: the accept
decisions compare identical quantities, so trajectories must match (up to
float reassociation; we assert near-bitwise agreement over many sweeps —
any MH-logic bug would diverge the chains completely within a few sweeps).
"""

import dataclasses

import numpy as np

import jax

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.models import make_hier_logistic, synth_logistic


def test_cache_matches_uncached_trajectories():
    data, _ = synth_logistic(jax.random.key(31), G=24, n=16, p=3)
    cached_model = make_hier_logistic(data, loglik_impl="jnp")
    assert "beta" in cached_model.cond_cached
    plain_model = dataclasses.replace(cached_model, cond_cached={})

    cfg = SamplerConfig(
        run=RunConfig(
            chains=8, warmup=50, draws=80, seed=12, log_every_segment=False,
        ),
    )
    a = sample(cached_model, data, cfg)
    b = sample(plain_model, data, cfg)
    for k in a.draws:
        xa, xb = np.asarray(a.draws[k]), np.asarray(b.draws[k])
        np.testing.assert_allclose(xa, xb, rtol=2e-4, atol=2e-4, err_msg=k)
    # acceptance bookkeeping identical too
    for k in a.accept_rates:
        np.testing.assert_allclose(
            np.asarray(a.accept_rates[k]),
            np.asarray(b.accept_rates[k]),
            rtol=1e-3, atol=1e-3,
        )
