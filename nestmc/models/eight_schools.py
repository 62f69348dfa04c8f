"""Hierarchical normal means model ("8 schools") — BASELINE.json:7 (config 1).

    y_j ~ N(theta_j, sigma_j^2)   sigma_j known, j = 1..G
    theta_j ~ N(mu, tau^2)
    mu ~ N(0, prior_mu_scale^2),  tau ~ HalfCauchy(prior_tau_scale)

Sampled in unconstrained space (mu, log tau) with the log-Jacobian of
tau = exp(log_tau) added. Gibbs blocks: theta (G conditionally independent
units -> one batched (chains, G) MH update), then mu, then log_tau.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nestmc.data import NestedData
from nestmc.distributions import (
    logpdf_halfcauchy,
    logpdf_normal,
)
from nestmc.model import Block, ModelSpec


def eight_schools_data() -> NestedData:
    """The classical Rubin (1981) 8-schools dataset."""
    y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    return NestedData(
        y=jnp.asarray(y[:, None]),
        mask=jnp.ones((8, 1), jnp.float32),
        sizes=jnp.ones((8,), jnp.int32),
        x=None,
        extra={"sigma": jnp.asarray(sigma, jnp.float32)},
    )


def make_eight_schools(
    data: NestedData | None = None,
    prior_mu_scale: float = 10.0,
    prior_tau_scale: float = 5.0,
) -> tuple[ModelSpec, NestedData]:
    if data is None:
        data = eight_schools_data()
    G = data.num_groups

    def _parts(state, data):
        y = data.y[:, 0]                      # (G,)
        sigma = data.extra["sigma"]           # (G,)
        theta = state["theta"]                # (C, G)
        mu = state["mu"][:, None]             # (C, 1)
        tau = jnp.exp(state["log_tau"])[:, None]
        lik = logpdf_normal(y, theta, sigma)  # (C, G)
        gprior = logpdf_normal(theta, mu, tau)  # (C, G)
        return lik, gprior

    def cond(name, value, state, data):
        state = {**state, name: value}
        lik, gprior = _parts(state, data)
        if name == "theta":
            return lik + gprior
        if name == "mu":
            pprior = logpdf_normal(state["mu"], 0.0, prior_mu_scale)
            return jnp.sum(gprior, axis=-1) + pprior
        if name == "log_tau":
            tau = jnp.exp(state["log_tau"])
            pprior = logpdf_halfcauchy(tau, prior_tau_scale) + state["log_tau"]
            return jnp.sum(gprior, axis=-1) + pprior
        raise KeyError(name)

    def joint(state, data):
        lik, gprior = _parts(state, data)
        tau = jnp.exp(state["log_tau"])
        return (
            jnp.sum(lik + gprior, axis=-1)
            + logpdf_normal(state["mu"], 0.0, prior_mu_scale)
            + logpdf_halfcauchy(tau, prior_tau_scale)
            + state["log_tau"]
        )

    def init_state(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        y = data.y[:, 0]
        return {
            "theta": y + 5.0 * jax.random.normal(k1, (chains, G)),
            "mu": jnp.mean(y) + 5.0 * jax.random.normal(k2, (chains,)),
            "log_tau": jnp.log(5.0) + 0.5 * jax.random.normal(k3, (chains,)),
        }

    def prior_sample(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        mu = prior_mu_scale * jax.random.normal(k1, (chains,))
        # HalfCauchy via |Cauchy|: tan of uniform(0, pi/2).
        u = jax.random.uniform(k2, (chains,), minval=0.0, maxval=jnp.pi / 2)
        tau = prior_tau_scale * jnp.tan(u)
        theta = mu[:, None] + tau[:, None] * jax.random.normal(k3, (chains, G))
        return {"theta": theta, "mu": mu, "log_tau": jnp.log(tau)}

    def sample_data(key, state, data):
        sigma = data.extra["sigma"]
        y = state["theta"][0] + sigma * jax.random.normal(key, (G,))
        return NestedData(
            y=y[:, None].astype(data.y.dtype),
            mask=data.mask,
            sizes=data.sizes,
            x=None,
            extra=data.extra,
        )

    spec = ModelSpec(
        name="eight_schools",
        blocks=(
            Block("theta", (G,), units=G, init_scale=5.0),
            Block("mu", (), init_scale=5.0),
            Block("log_tau", (), init_scale=0.5),
        ),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=init_state,
        prior_sample=prior_sample,
        sample_data=sample_data,
    )
    return spec, data
