"""Geweke "getting it right" tier for the Newton-MH kernel.

Same harness as tests/test_geweke.py but on a Bernoulli-logit calibration
model — the conditional of the per-group logit theta_g is NON-Gaussian at
n = 3 obs/group, so the Newton acceptance ratio (position-dependent mean,
covariance AND normalization of q) is genuinely exercised; on a Gaussian
conditional the ratio is identically 1 and a broken correction could hide.

Model:  y_gi ~ Bernoulli(sigmoid(theta_g)),  theta_g ~ N(mu, tau),
        mu ~ N(0, S0), tau ~ HalfNormal(TAU0) (sampled as log tau).
theta runs Newton-MH with ANALYTIC value/grad/Hessian hooks (validating the
kernel independent of autodiff); mu and log_tau run RW-MH.

POWER check: the same kernel with the asymmetric-proposal correction
dropped (log_alpha = d_new - d_old only — the classic "Newton step without
MH correction" bug, which biases draws toward the Laplace mode) must be
detected.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.distributions import logpdf_halfnormal, logpdf_normal
from nestmc.kernels.gibbs import make_sweep
from nestmc.kernels.state import init_kernel_state
from nestmc.model import Block, ModelSpec
from nestmc.kernels import newton as newton_mod
from nestmc.kernels.rwmh import accept_prob

S0 = 1.2
TAU0 = 1.0
G, N = 4, 3
C = 512
M = 400
BURN = 100


def make_logistic_calibration_model(G: int, n: int) -> ModelSpec:
    def _lik(state, data):
        th = state["theta"][:, :, None]           # (C, G, 1)
        return jnp.sum(
            data["y"] * th - jax.nn.softplus(th), axis=-1
        )                                          # (C, G)

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

    # Newton hooks for theta, ALL analytic (scalar units -> p = 1
    # convention: grad and Hessian both (C, G)):
    #   lik:   v = s_g theta - n softplus(theta), s_g = sum_i y_gi
    #          g = s_g - n sigmoid(theta),  h = n w,  w = sig (1 - sig)
    #   prior: v = log N(theta | mu, tau), g = -(theta-mu)/tau^2, h = 1/tau^2
    def self_vgh(value, data):
        s_g = jnp.sum(data["y"], axis=-1)          # (C, G)
        sig = jax.nn.sigmoid(value)
        v = s_g * value - n * jax.nn.softplus(value)
        return v, s_g - n * sig, n * sig * (1.0 - sig)

    def rest_vgh(value, state, data):
        mu = state["mu"][:, None]
        inv_tau2 = jnp.exp(-2.0 * state["log_tau"])[:, None]
        diff = value - mu
        v = (
            -0.5 * diff * diff * inv_tau2
            + 0.5 * jnp.log(inv_tau2) - 0.9189385332046727
        )
        return v, -diff * inv_tau2, jnp.broadcast_to(inv_tau2, value.shape)

    def prior_sample(key, data, chains):
        k1, k2, k3 = jax.random.split(key, 3)
        mu = S0 * jax.random.normal(k1, (chains,))
        tau = TAU0 * jnp.abs(jax.random.normal(k2, (chains,)))
        theta = mu[:, None] + tau[:, None] * jax.random.normal(
            k3, (chains, G)
        )
        return {"theta": theta, "mu": mu, "log_tau": jnp.log(tau)}

    return ModelSpec(
        name="calibration_hier_logistic",
        blocks=(
            Block("theta", (G,), units=G, algorithm="newton"),
            Block("mu", (), init_scale=0.5),
            Block("log_tau", (), init_scale=0.3),
        ),
        cond_logdensity=cond,
        joint_logdensity=joint,
        init_state=lambda key, data, chains: prior_sample(key, data, chains),
        prior_sample=prior_sample,
        cond_cached_newton={"theta": (self_vgh, rest_vgh)},
    )


def sample_y(key, theta, n):
    C_, G_ = theta.shape
    probs = jax.nn.sigmoid(theta)[:, :, None]
    return jax.random.bernoulli(key, probs, (C_, G_, n)).astype(jnp.float32)


def _test_functions(state, y):
    tau = jnp.exp(state["log_tau"])
    th = state["theta"]
    return {
        "mu": state["mu"],
        "mu2": state["mu"] ** 2,
        "tau": tau,
        "tau2": tau**2,
        "theta0": th[:, 0],
        "theta02": th[:, 0] ** 2,
        "theta03": th[:, 0] ** 3,
        "theta_mean": jnp.mean(th, axis=1),
        "ybar": jnp.mean(y, axis=(1, 2)),
        "ty": th[:, 0] * jnp.mean(y[:, 0], axis=-1),
    }


def _broken_newton_update(key, block, model, position, log_scale, pstd,
                          data, cache=None, frozen=False):
    """newton_update with the asymmetric-proposal correction DROPPED
    (accepts on the bare density ratio) — the power-check transition."""
    import jax.numpy as jnp
    from nestmc.kernels.rwmh import select_accepted
    from nestmc.ops.smallchol import chol_packed, solve_upper_t, spd_solve

    value = position[block.name]                   # (C, G) scalar units
    k_eps, k_u = jax.random.split(key)
    self_vgh, rest_vgh = model.cond_cached_newton[block.name]
    sv, sg, sh = self_vgh(value, data)
    rv, rg, rh = rest_vgh(value, position, data)
    d_old, g_old, h_old = sv + rv, (sg + rg)[..., None], (sh + rh)[..., None]
    L_old = chol_packed(h_old, 1)
    mean_old = value[..., None] + spd_solve(L_old, g_old, 1)
    eps = jax.random.normal(k_eps, mean_old.shape, value.dtype)
    prop = (mean_old + solve_upper_t(L_old, eps, 1))[..., 0]
    sv2, _, _ = self_vgh(prop, data)
    rv2, _, _ = rest_vgh(prop, position, data)
    log_alpha = (sv2 + rv2) - d_old               # NO q correction
    logu = jnp.log(jax.random.uniform(
        k_u, log_alpha.shape, value.dtype,
        minval=jnp.finfo(value.dtype).tiny,
    ))
    accept = logu < log_alpha
    new_value = select_accepted(accept, prop, value, block)
    # keep the carry pytree structure: the harness refreshes this cache
    # from the resampled data before every sweep anyway
    if cache is not None:
        sel = lambda a, b: jnp.where(accept, a, b)  # noqa: E731
        cache = {"v": sel(sv2, cache["v"]), "g": cache["g"],
                 "h": cache["h"]}
    return new_value, accept_prob(log_alpha), cache


def _successive_conditional(model, key, update_fn=None, frozen=False,
                            frozen_refresh_bug=False):
    """update_fn: optional replacement for the 'newton' transition (the
    power check). The patch must stay active until the scan below has
    TRACED the sweep (gibbs.py reads _UPDATES at trace time), so the whole
    body runs under it; _zscores restores the original afterwards.

    frozen: run the FROZEN-metric sampling kernel
    (KernelConfig.newton_freeze) with the likelihood Hessian held at its
    value from the initial prior draw — a genuine constant, as in
    production where it freezes at warmup end. Only (v, g) are refreshed
    when the Geweke data resamples (this model's lik Hessian n*sig(1-sig)
    is y-free, so holding it constant is structurally consistent).

    frozen_refresh_bug: the INVALID pattern the frozen tier must be able
    to detect — refresh the Hessian from the CURRENT position every
    iteration while the kernel still treats the metric as constant
    (forward and reverse sides share one metric, no log-det ratio). The
    metric then depends on the current state and detailed balance breaks.

    Note the refresh tiers pin newton_freeze=False: the harness rebuilds
    the full (v, g, h) cache from the resampled data each iteration, which
    under a frozen kernel would BE the refresh bug above.
    """
    cfg = SamplerConfig(
        kernel=KernelConfig(
            scale_per_unit=True,
            newton_freeze=frozen or frozen_refresh_bug,
        ),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    sweep = make_sweep(model, cfg)
    k0, k1, kinit = jax.random.split(key, 3)
    y_init = sample_y(
        k1, model.prior_sample(k0, None, C)["theta"], N
    )
    kstate = init_kernel_state(model, cfg, kinit, {"y": y_init})
    kstate = dataclasses.replace(
        kstate, position=model.prior_sample(k0, None, C)
    )
    self_vgh, _ = model.cond_cached_newton["theta"]
    keep_h = frozen and not frozen_refresh_bug

    def refresh_cache(kstate, y):
        # data changes every Geweke iteration, so the carried obs-pass
        # cache must be rebuilt (in production data is static per run);
        # the frozen tier keeps the CONSTANT initial Hessian instead
        v, g, h = self_vgh(kstate.position["theta"], {"y": y})
        if keep_h:
            h = kstate.cache["theta"]["h"]
        return dataclasses.replace(
            kstate, cache={**kstate.cache, "theta": {"v": v, "g": g, "h": h}}
        )

    def step(carry, key_t):
        kstate, y = carry
        y = sample_y(key_t, kstate.position["theta"], N)
        kstate = refresh_cache(kstate, y)
        kstate = sweep(kstate, {"y": y}, adapt=False)
        stats = _test_functions(kstate.position, y)
        return (kstate, y), stats

    keys = jax.random.split(jax.random.key(99), M)
    (_, _), stats = jax.lax.scan(step, (kstate, y_init), keys)
    return {k: jnp.mean(v[BURN:], axis=0) for k, v in stats.items()}


def _zscores(model, seed=0, update_fn=None, frozen=False,
             frozen_refresh_bug=False):
    ks, ky = jax.random.split(jax.random.key(seed))
    state = model.prior_sample(ks, None, 200_000)
    y = sample_y(ky, state["theta"], N)
    mc = _test_functions(state, y)
    from nestmc.kernels import gibbs as gibbs_mod

    old = gibbs_mod._UPDATES["newton"]
    if update_fn is not None:
        gibbs_mod._UPDATES = {**gibbs_mod._UPDATES, "newton": update_fn}
    try:
        sc_stats = _successive_conditional(
            model, jax.random.key(seed + 1), update_fn=update_fn,
            frozen=frozen, frozen_refresh_bug=frozen_refresh_bug,
        )
    finally:
        gibbs_mod._UPDATES = {**gibbs_mod._UPDATES, "newton": old}
    zs = {}
    for k in mc:
        m1 = float(jnp.mean(mc[k]))
        se1 = float(jnp.std(mc[k]) / np.sqrt(mc[k].shape[0]))
        m2 = float(jnp.mean(sc_stats[k]))
        se2 = float(jnp.std(sc_stats[k]) / np.sqrt(sc_stats[k].shape[0]))
        zs[k] = (m1 - m2) / np.sqrt(se1**2 + se2**2 + 1e-12)
    return zs


@pytest.mark.slow
def test_geweke_newton_passes():
    model = make_logistic_calibration_model(G, N)
    zs = _zscores(model, seed=30)
    worst = max(abs(z) for z in zs.values())
    assert worst < 5.0, f"Geweke z-scores (newton) {zs}"


@pytest.mark.slow
def test_geweke_newton_dropped_q_detected():
    model = make_logistic_calibration_model(G, N)
    zs = _zscores(model, seed=31, update_fn=_broken_newton_update)
    worst = max(abs(z) for z in zs.values())
    assert worst > 6.0, (
        f"Geweke failed to detect a missing Newton q-correction: {zs}"
    )


@pytest.mark.slow
def test_geweke_newton_frozen_passes():
    """The frozen-metric sampling kernel (constant likelihood Hessian,
    KernelConfig.newton_freeze) leaves the joint invariant."""
    model = make_logistic_calibration_model(G, N)
    zs = _zscores(model, seed=32, frozen=True)
    worst = max(abs(z) for z in zs.values())
    assert worst < 5.0, f"Geweke z-scores (frozen newton) {zs}"


@pytest.mark.slow
def test_geweke_newton_frozen_refresh_bug_detected():
    """POWER check for the frozen tier: refreshing the Hessian from the
    current position each iteration while the kernel treats the metric as
    constant (one metric both sides, no log-det ratio) breaks detailed
    balance — the exact bug class newton_freeze could hide — and must be
    detected."""
    model = make_logistic_calibration_model(G, N)
    zs = _zscores(model, seed=33, frozen_refresh_bug=True)
    worst = max(abs(z) for z in zs.values())
    assert worst > 6.0, (
        f"Geweke failed to detect the stale-metric frozen-Newton bug: {zs}"
    )
