"""User path: write a model UNBATCHED, lift with vmap_chains, sample."""

import numpy as np

import jax
import jax.numpy as jnp

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.distributions import logpdf_normal
from nestmc.model import Block, ModelSpec, vmap_chains


def test_unbatched_model_lifted_and_sampled():
    # conjugate normal: y_i ~ N(theta, 1), theta ~ N(0, 2) — unbatched spec
    y = np.array([0.4, 1.2, -0.3, 0.8, 1.5], np.float32)
    n = len(y)
    post_prec = n + 1 / 4.0
    post_mean = y.sum() / post_prec
    post_sd = 1 / np.sqrt(post_prec)

    def cond(name, value, state, data):
        lik = jnp.sum(logpdf_normal(jnp.asarray(y), value, 1.0))
        return lik + logpdf_normal(value, 0.0, 2.0)

    unbatched = ModelSpec(
        name="tiny",
        blocks=(Block("theta", (), init_scale=1.0),),
        cond_logdensity=cond,
        joint_logdensity=lambda s, d: cond("theta", s["theta"], s, d),
        init_state=lambda key, data, chains: {
            "theta": jax.random.normal(key, ())
        },
        prior_sample=lambda key, data, chains: {
            "theta": 2.0 * jax.random.normal(key, ())
        },
    )
    model = vmap_chains(unbatched)
    post = sample(model, None, SamplerConfig(run=RunConfig(
        chains=16, warmup=500, draws=1000, log_every_segment=False,
    )))
    assert post.worst_rhat() < 1.02
    m = float(post.mean("theta"))
    sd = float(jnp.std(post.draws["theta"]))
    assert abs(m - post_mean) < 0.05, (m, post_mean)
    assert abs(sd - post_sd) < 0.05, (sd, post_sd)

    # prior_sample lifted too
    pri = model.prior_sample(jax.random.key(0), None, 64)
    assert pri["theta"].shape == (64,)
