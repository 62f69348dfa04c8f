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


def make_calibration_model(
    G: int, n: int, grad_asis=False, asis_init_scale: float = 0.1,
) -> ModelSpec:
    """grad_asis: False = random-walk ASIS move (production default in
    plain-RW mode); True = LANGEVIN (MALA) ASIS move with analytic
    gradients — validates the gradient-interweaving MH ratio that
    models/hier_logistic.py uses when the MALA grad cache is live;
    "broken-q" = Langevin proposal WITHOUT the asymmetric-proposal
    correction (power check: Geweke must detect it)."""

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

    def asis_tau_move(key, position, cache, scale, data):
        """Same ASIS interweaving move as hier_logistic (z fixed, rescale
        (tau, theta) jointly) — here so Geweke validates the joint_moves
        machinery and the move's MH ratio."""
        k1, k2 = jax.random.split(key)
        theta, mu, lt = (
            position["theta"], position["mu"], position["log_tau"],
        )
        C = lt.shape[0]
        eps = jax.random.normal(k1, lt.shape, lt.dtype)
        lt_new = lt + scale[:, 0] * eps                 # (C,)
        ratio = jnp.exp(lt_new - lt)[:, None]
        theta_new = mu[:, None] + (theta - mu[:, None]) * ratio
        lik_old = jnp.sum(_lik({**position}, data), axis=-1)
        lik_new = jnp.sum(
            _lik({**position, "theta": theta_new}, data), axis=-1
        )
        tau, tau_new = jnp.exp(lt), jnp.exp(lt_new)
        prior_delta = (
            logpdf_halfnormal(tau_new, TAU0) + lt_new
            - logpdf_halfnormal(tau, TAU0) - lt
        )
        log_alpha = lik_new - lik_old + prior_delta
        logu = jnp.log(jax.random.uniform(
            k2, (C,), lt.dtype, minval=jnp.finfo(lt.dtype).tiny
        ))
        accept = logu < log_alpha
        pos_up = {
            "theta": jnp.where(accept[:, None], theta_new, theta),
            "log_tau": jnp.where(accept, lt_new, lt),
        }
        alpha = jnp.where(
            jnp.isnan(log_alpha), 0.0,
            jnp.exp(jnp.minimum(log_alpha, 0.0)),
        )
        return pos_up, {}, alpha

    def asis_tau_move_grad(key, position, cache, scale, data):
        """Langevin (MALA) version of the interweaving move: same
        z-fixed target F(lt) = sum_g lik_g(mu + e^lt z) + log p(lt),
        proposal lt' = lt + (s^2/2) F'(lt) + s eps with the asymmetric
        q-correction. F' by the chain rule through theta' = mu + e^lt z:
          F'(lt) = sum_g dlik/dtheta_g * (theta_g - mu) + d log p/d lt
        with dlik/dtheta_g = sum_i (y_gi - theta_g)/sigma^2 analytic here
        (so the test validates the FORMULA, independent of autodiff)."""
        k1, k2 = jax.random.split(key)
        theta, mu, lt = (
            position["theta"], position["mu"], position["log_tau"],
        )
        C = lt.shape[0]
        s = scale[:, 0]                                 # (C,)
        s2 = s * s
        eps = jax.random.normal(k1, lt.shape, lt.dtype)
        diff = theta - mu[:, None]                      # tau*z, (C, G)

        def _glt(ltv, diffv):
            th = mu[:, None] + diffv
            glik = jnp.sum(
                (data["y"] - th[:, :, None]) / SIGMA**2, axis=-1
            )                                           # (C, G)
            return (
                jnp.sum(glik * diffv, axis=-1)
                + 1.0 - jnp.exp(2.0 * ltv) / TAU0**2
            )

        g_old = _glt(lt, diff)
        lt_new = lt + 0.5 * s2 * g_old + s * eps
        ratio = jnp.exp(lt_new - lt)[:, None]
        diff_new = diff * ratio
        theta_new = mu[:, None] + diff_new
        g_new = _glt(lt_new, diff_new)
        fwd = lt_new - lt - 0.5 * s2 * g_old            # = s * eps
        rev = lt - lt_new - 0.5 * s2 * g_new
        q_corr = (fwd * fwd - rev * rev) / (2.0 * s2)
        if grad_asis == "broken-q":
            q_corr = jnp.zeros_like(q_corr)
        lik_old = jnp.sum(_lik({**position}, data), axis=-1)
        lik_new = jnp.sum(
            _lik({**position, "theta": theta_new}, data), axis=-1
        )
        tau, tau_new = jnp.exp(lt), jnp.exp(lt_new)
        prior_delta = (
            logpdf_halfnormal(tau_new, TAU0) + lt_new
            - logpdf_halfnormal(tau, TAU0) - lt
        )
        log_alpha = lik_new - lik_old + prior_delta + q_corr
        logu = jnp.log(jax.random.uniform(
            k2, (C,), lt.dtype, minval=jnp.finfo(lt.dtype).tiny
        ))
        accept = logu < log_alpha
        pos_up = {
            "theta": jnp.where(accept[:, None], theta_new, theta),
            "log_tau": jnp.where(accept, lt_new, lt),
        }
        alpha = jnp.where(
            jnp.isnan(log_alpha), 0.0,
            jnp.exp(jnp.minimum(log_alpha, 0.0)),
        )
        return pos_up, {}, alpha

    move = asis_tau_move_grad if grad_asis else asis_tau_move
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
        joint_moves={"asis_tau": move},
        joint_move_init_scale={"asis_tau": asis_init_scale},
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
