"""Test-local hierarchical model with CHAIN-BATCHED data for calibration
tests (Geweke, SBC): every replica carries its own simulated dataset, so the
whole calibration experiment is one batched computation.

    y_gi ~ N(theta_g, 1)      theta_g ~ N(mu, tau)
    mu ~ N(0, S0)             tau ~ HalfNormal(TAU0), sampled as log tau

Data is a plain dict {"y": (C, G, n)} — ModelSpec treats data opaquely, so
per-chain data works through broadcasting.
"""

import jax
import jax.numpy as jnp

from nestmc.distributions import logpdf_halfnormal, logpdf_normal
from nestmc.model import Block, ModelSpec

S0 = 2.0
TAU0 = 1.5
SIGMA = 1.0


def make_calibration_model(G: int, n: int) -> ModelSpec:
    def _lik(state, data):
        # data["y"]: (C, G, n); theta: (C, G)
        return jnp.sum(
            logpdf_normal(data["y"], state["theta"][:, :, None], SIGMA),
            axis=-1,
        )  # (C, G)

    def _gprior(state):
        tau = jnp.exp(state["log_tau"])[:, None]
        return logpdf_normal(state["theta"], state["mu"][:, None], tau)

    def cond(name, value, state, data):
        state = {**state, name: value}
        if name == "theta":
            return _lik(state, data) + _gprior(state)
        if name == "mu":
            return jnp.sum(_gprior(state), axis=-1) + logpdf_normal(
                state["mu"], 0.0, S0
            )
        if name == "log_tau":
            tau = jnp.exp(state["log_tau"])
            return (
                jnp.sum(_gprior(state), axis=-1)
                + logpdf_halfnormal(tau, TAU0)
                + state["log_tau"]
            )
        raise KeyError(name)

    def joint(state, data):
        tau = jnp.exp(state["log_tau"])
        return (
            jnp.sum(_lik(state, data) + _gprior(state), axis=-1)
            + logpdf_normal(state["mu"], 0.0, S0)
            + logpdf_halfnormal(tau, TAU0)
            + state["log_tau"]
        )

    def init_state(key, data, chains):
        return prior_sample(key, data, chains)

    def prior_sample(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        mu = S0 * jax.random.normal(k1, (chains,))
        tau = TAU0 * jnp.abs(jax.random.normal(k2, (chains,)))
        theta = mu[:, None] + tau[:, None] * jax.random.normal(
            k3, (chains, G)
        )
        return {"theta": theta, "mu": mu, "log_tau": jnp.log(tau)}

    return ModelSpec(
        name="calibration_hier_normal",
        blocks=(
            Block("theta", (G,), units=G, init_scale=0.5),
            Block("mu", (), init_scale=0.5),
            Block("log_tau", (), init_scale=0.3),
        ),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=init_state,
        prior_sample=prior_sample,
    )


def make_broken_model(G: int, n: int) -> ModelSpec:
    """Deliberately WRONG sampler (missing log-tau Jacobian): the Geweke
    test must detect it (power check)."""
    good = make_calibration_model(G, n)

    def cond(name, value, state, data):
        out = good.cond_logdensity(name, value, state, data)
        if name == "log_tau":
            out = out - value  # drop the +log_tau Jacobian term
        return out

    import dataclasses

    return dataclasses.replace(good, cond_logdensity=cond)


def sample_y(key, theta, n):
    """(C, G) theta -> (C, G, n) simulated responses."""
    C, G = theta.shape
    return theta[:, :, None] + SIGMA * jax.random.normal(key, (C, G, n))
