"""Linear-Gaussian hierarchical model with a CLOSED-FORM posterior.

    y_ij ~ N(theta_j, sigma^2)        sigma known
    theta_j ~ N(mu, tau^2)            tau known
    mu ~ N(m0, s0^2)

Everything is jointly Gaussian, so the exact posterior mean/variance of mu
and every theta_j is computable analytically — the exactness anchor for the
sampler (tests/test_exactness.py): sampler moments must land within z*MCSE of
:func:`analytic_hier_normal_posterior`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nestmc.data import NestedData
from nestmc.distributions import logpdf_normal
from nestmc.model import Block, ModelSpec


def make_hier_normal_known_scales(
    data: NestedData,
    sigma: float = 1.0,
    tau: float = 1.0,
    m0: float = 0.0,
    s0: float = 3.0,
) -> ModelSpec:
    G = data.num_groups

    def _parts(state, data):
        theta = state["theta"]                     # (C, G)
        mu = state["mu"][:, None]                  # (C, 1)
        lik = logpdf_normal(data.y, theta[:, :, None], sigma)  # (C, G, n)
        lik = jnp.sum(lik * data.mask, axis=-1)    # (C, G)
        gprior = logpdf_normal(theta, mu, tau)     # (C, G)
        return lik, gprior

    def cond(name, value, state, data):
        state = {**state, name: value}
        lik, gprior = _parts(state, data)
        if name == "theta":
            return lik + gprior
        if name == "mu":
            return jnp.sum(gprior, axis=-1) + logpdf_normal(
                state["mu"], m0, s0
            )
        raise KeyError(name)

    def joint(state, data):
        lik, gprior = _parts(state, data)
        return jnp.sum(lik + gprior, axis=-1) + logpdf_normal(
            state["mu"], m0, s0
        )

    def init_state(key, data, chains):
        k1, k2 = jax.random.split(key)
        return {
            "theta": jax.random.normal(k1, (chains, G)),
            "mu": jax.random.normal(k2, (chains,)),
        }

    def prior_sample(key, data, chains):
        k1, k2 = jax.random.split(key)
        mu = m0 + s0 * jax.random.normal(k1, (chains,))
        theta = mu[:, None] + tau * jax.random.normal(k2, (chains, G))
        return {"theta": theta, "mu": mu}

    def sample_data(key, state, data):
        eps = jax.random.normal(key, data.y.shape)
        y = state["theta"][0][:, None] + sigma * eps
        return NestedData(
            y=y.astype(data.y.dtype), mask=data.mask, sizes=data.sizes,
            x=None, extra=data.extra,
        )

    return ModelSpec(
        name="hier_normal_known_scales",
        blocks=(
            Block("theta", (G,), units=G, init_scale=1.0),
            Block("mu", (), init_scale=1.0),
        ),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=init_state,
        prior_sample=prior_sample,
        sample_data=sample_data,
    )


def synth_hier_normal(
    key, G: int = 20, n: int = 10, sigma: float = 1.0, tau: float = 1.0,
    m0: float = 0.0, s0: float = 3.0,
) -> NestedData:
    k1, k2, k3 = jax.random.split(key, 3)
    mu = m0 + s0 * jax.random.normal(k1, ())
    theta = mu + tau * jax.random.normal(k2, (G,))
    y = theta[:, None] + sigma * jax.random.normal(k3, (G, n))
    return NestedData(
        y=y, mask=jnp.ones((G, n), jnp.float32),
        sizes=jnp.full((G,), n, jnp.int32), x=None, extra={},
    )


def analytic_hier_normal_posterior(
    data: NestedData, sigma: float, tau: float, m0: float, s0: float
):
    """Exact posterior moments of (mu, theta) in float64 numpy.

    Returns dict with mu_mean, mu_var, theta_mean (G,), theta_var (G,).
    """
    y = np.asarray(data.y, np.float64)
    mask = np.asarray(data.mask, np.float64)
    n = mask.sum(axis=1)
    ybar = (y * mask).sum(axis=1) / n
    # Marginal: ybar_j | mu ~ N(mu, sigma^2/n_j + tau^2)
    v_j = sigma**2 / n + tau**2
    prec_mu = 1.0 / s0**2 + np.sum(1.0 / v_j)
    mu_var = 1.0 / prec_mu
    mu_mean = mu_var * (m0 / s0**2 + np.sum(ybar / v_j))
    # theta_j | mu, y ~ N((a_j ybar_j + b mu)/(a_j + b), 1/(a_j + b))
    a = n / sigma**2
    b = 1.0 / tau**2
    w = b / (a + b)
    theta_mean = (a * ybar + b * mu_mean) / (a + b)
    theta_var = 1.0 / (a + b) + (w**2) * mu_var
    return {
        "mu_mean": mu_mean,
        "mu_var": mu_var,
        "theta_mean": theta_mean,
        "theta_var": theta_var,
    }
