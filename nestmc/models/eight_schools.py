"""Hierarchical normal means model ("8 schools") — BASELINE.json:7 (config 1).

    y_j ~ N(theta_j, sigma_j^2)   sigma_j known, j = 1..G
    theta_j ~ N(mu, tau^2)
    mu ~ N(0, prior_mu_scale^2),  tau ~ HalfCauchy(prior_tau_scale)

Default parameterization is NON-CENTERED: theta_j = mu + tau * z_j with
z_j ~ N(0, 1) sampled as the group block. This removes the funnel coupling
between tau and theta that makes the centered form mix slowly under
random-walk MH (classic result; the centered variant is kept for
comparison/calibration via ``centered=True``). theta is exposed as a derived
quantity, so users see the same parameter surface either way.

Gibbs blocks: z (G conditionally-independent units -> one batched
(chains, G) MH update), then mu, then log_tau.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nestmc.data import NestedData
from nestmc.distributions import (
    log_scale_guard,
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


def _make_noncentered(data, prior_mu_scale, prior_tau_scale):
    G = data.num_groups

    def _theta(state):
        tau = jnp.exp(state["log_tau"])[:, None]
        return state["mu"][:, None] + tau * state["z"]

    def _lik(state, data):
        y = data.y[..., 0]                    # (G,) (or (C, G) batched)
        sigma = data.extra["sigma"]
        return logpdf_normal(y, _theta(state), sigma)  # (C, G)

    def cond(name, value, state, data):
        state = {**state, name: value}
        if name == "z":
            return _lik(state, data) + logpdf_normal(state["z"])
        if name == "mu":
            lik = jnp.sum(_lik(state, data), axis=-1)
            return lik + logpdf_normal(state["mu"], 0.0, prior_mu_scale)
        if name == "log_tau":
            tau = jnp.exp(state["log_tau"])
            lik = jnp.sum(_lik(state, data), axis=-1)
            return (
                lik
                + logpdf_halfcauchy(tau, prior_tau_scale)
                + state["log_tau"]
                + log_scale_guard(state["log_tau"])
            )
        raise KeyError(name)

    def joint(state, data):
        tau = jnp.exp(state["log_tau"])
        return (
            jnp.sum(_lik(state, data) + logpdf_normal(state["z"]), axis=-1)
            + logpdf_normal(state["mu"], 0.0, prior_mu_scale)
            + logpdf_halfcauchy(tau, prior_tau_scale)
            + state["log_tau"]
        )

    def init_state(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        y = data.y[:, 0]
        return {
            "z": jax.random.normal(k1, (chains, G)),
            "mu": jnp.mean(y) + 5.0 * jax.random.normal(k2, (chains,)),
            "log_tau": jnp.log(5.0) + 0.5 * jax.random.normal(k3, (chains,)),
        }

    def prior_sample(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        mu = prior_mu_scale * jax.random.normal(k1, (chains,))
        u = jax.random.uniform(k2, (chains,), minval=0.0, maxval=jnp.pi / 2)
        tau = prior_tau_scale * jnp.tan(u)
        z = jax.random.normal(k3, (chains, G))
        return {"z": z, "mu": mu, "log_tau": jnp.log(tau)}

    def sample_data(key, state, data):
        sigma = data.extra["sigma"]
        theta0 = _theta(state)[0]
        y = theta0 + sigma * jax.random.normal(key, (G,))
        return NestedData(
            y=y[:, None].astype(data.y.dtype), mask=data.mask,
            sizes=data.sizes, x=None, extra=data.extra,
        )

    return ModelSpec(
        name="eight_schools",
        blocks=(
            Block("z", (G,), units=G, init_scale=1.0),
            Block("mu", (), init_scale=5.0),
            Block("log_tau", (), init_scale=0.5),
        ),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=init_state,
        prior_sample=prior_sample,
        sample_data=sample_data,
        derived={"theta": _theta},
    )


def _make_centered(data, prior_mu_scale, prior_tau_scale):
    G = data.num_groups

    def _parts(state, data):
        y = data.y[..., 0]
        sigma = data.extra["sigma"]
        theta = state["theta"]
        mu = state["mu"][:, None]
        tau = jnp.exp(state["log_tau"])[:, None]
        lik = logpdf_normal(y, theta, sigma)
        gprior = logpdf_normal(theta, mu, tau)
        return lik, gprior

    def cond(name, value, state, data):
        state = {**state, name: value}
        lik, gprior = _parts(state, data)
        if name == "theta":
            return lik + gprior
        if name == "mu":
            return jnp.sum(gprior, axis=-1) + logpdf_normal(
                state["mu"], 0.0, prior_mu_scale
            )
        if name == "log_tau":
            tau = jnp.exp(state["log_tau"])
            return (
                jnp.sum(gprior, axis=-1)
                + logpdf_halfcauchy(tau, prior_tau_scale)
                + state["log_tau"]
            )
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
        u = jax.random.uniform(k2, (chains,), minval=0.0, maxval=jnp.pi / 2)
        tau = prior_tau_scale * jnp.tan(u)
        theta = mu[:, None] + tau[:, None] * jax.random.normal(
            k3, (chains, G)
        )
        return {"theta": theta, "mu": mu, "log_tau": jnp.log(tau)}

    def sample_data(key, state, data):
        sigma = data.extra["sigma"]
        y = state["theta"][0] + sigma * jax.random.normal(key, (G,))
        return NestedData(
            y=y[:, None].astype(data.y.dtype), mask=data.mask,
            sizes=data.sizes, x=None, extra=data.extra,
        )

    return ModelSpec(
        name="eight_schools_centered",
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


def make_eight_schools(
    data: NestedData | None = None,
    prior_mu_scale: float = 10.0,
    prior_tau_scale: float = 5.0,
    centered: bool = False,
) -> tuple[ModelSpec, NestedData]:
    if data is None:
        data = eight_schools_data()
    maker = _make_centered if centered else _make_noncentered
    return maker(data, prior_mu_scale, prior_tau_scale), data
