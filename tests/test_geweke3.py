"""Geweke (2004) joint-distribution test for the THREE-LEVEL nested
Poisson GLMM — the strongest correctness tier for its exact conjugate
Gibbs draws (beta_g always; mu always; log_tau_g/log_tau_s under the
inverse-gamma prior) and for the ASIS interweaving moves.

Same machinery as tests/test_geweke.py, but against the REAL
``make_nested_poisson`` model (not a test-local mirror): data enters the
model as a traced argument, so per-replica simulated responses ride the
chain axis by broadcasting — y becomes (C, S, n) while x/mask stay
(S, n, ...). Includes a power check: a seeded bug in the conjugate
log_tau_g draw (wrong sufficient-statistic scaling) must be detected.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.kernels.gibbs import make_sweep
from nestmc.kernels.state import init_kernel_state
from nestmc.models.nested_poisson import make_nested_poisson, synth_poisson3

G, SPG, N, P = 3, 2, 3, 2     # groups, subjects/group, obs, covariates
S = G * SPG
C = 512                       # independent replicas
M = 400                       # successive-conditional iterations
BURN = 100

# Tight priors keep Poisson rates bounded under prior draws (exp(eta)
# must stay in sane f32 territory for the marginal-conditional tail).
PRIORS = dict(prior_mu_scale=0.4, prior_tau_scale=0.3)
IG = dict(tau_ig_shape=3.0, tau_ig_scale=0.3)


def _make(tau_prior):
    data, _ = synth_poisson3(
        jax.random.key(0), G=G, subjects_per_group=SPG, n=N, p=P
    )
    model = make_nested_poisson(
        data, loglik_impl="jnp", tau_prior=tau_prior, **PRIORS, **IG
    )
    return model, data


def _sample_y(key, beta_s, data):
    """(C, S, p) beta_s -> (C, S, n) Poisson responses given the fixed x."""
    eta = jnp.einsum("snp,csp->csn", data.x, beta_s)
    rate = jnp.minimum(jnp.exp(eta), 1e6)  # guard the f32 prior tail
    return jax.random.poisson(key, rate).astype(jnp.float32) * data.mask


def _test_functions(state, y):
    tau_g = jnp.exp(state["log_tau_g"][:, 0])
    tau_s = jnp.exp(state["log_tau_s"][:, 0])
    return {
        "mu": state["mu"][:, 0],
        "mu2": state["mu"][:, 0] ** 2,
        "tau_g": tau_g,
        "tau_g2": tau_g**2,
        "tau_s": tau_s,
        "tau_s2": tau_s**2,
        "beta_g00": state["beta_g"][:, 0, 0],
        "beta_g00sq": state["beta_g"][:, 0, 0] ** 2,
        "beta_s00": state["beta_s"][:, 0, 0],
        "beta_s00sq": state["beta_s"][:, 0, 0] ** 2,
        "beta_g_x_mu": state["beta_g"][:, 0, 0] * state["mu"][:, 0],
        "ymean": jnp.mean(y, axis=(1, 2)),
        "y2": jnp.mean(y**2, axis=(1, 2)),
        "by": state["beta_s"][:, 0, 0] * jnp.mean(y[:, 0], axis=-1),
    }


def _marginal_conditional(model, data, key, reps):
    ks, ky = jax.random.split(key)
    state = model.prior_sample(ks, data, reps)
    y = _sample_y(ky, state["beta_s"], data)
    return _test_functions(state, y)


def _successive_conditional(model, data, key):
    cfg = SamplerConfig(
        kernel=KernelConfig(scale_per_unit=True, algorithm="rwmh"),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    sweep = make_sweep(model, cfg)
    k0, k1, kinit = jax.random.split(key, 3)
    kstate = init_kernel_state(model, cfg, kinit, data)
    kstate = dataclasses.replace(
        kstate, position=model.prior_sample(k0, data, C)
    )
    self_fn = model.cond_cached["beta_s"][0]

    def step(carry, key_t):
        kstate, y = carry
        y = _sample_y(key_t, kstate.position["beta_s"], data)
        data_t = dataclasses.replace(data, y=y)
        # the carried likelihood cache is data-dependent; y just changed,
        # so refresh it (semantics, not a workaround: new data, new cache)
        cache = dict(kstate.cache)
        cache["beta_s"] = self_fn(kstate.position["beta_s"], data_t)
        kstate = dataclasses.replace(kstate, cache=cache)
        kstate = sweep(kstate, data_t, adapt=False)
        stats = _test_functions(kstate.position, y)
        return (kstate, y), stats

    y0 = _sample_y(k1, kstate.position["beta_s"], data)
    keys = jax.random.split(jax.random.key(99), M)
    (_, _), stats = jax.lax.scan(step, (kstate, y0), keys)
    return {k: jnp.mean(v[BURN:], axis=0) for k, v in stats.items()}


def _geweke_zscores(model, data, seed=0):
    mc = _marginal_conditional(
        model, data, jax.random.key(seed), reps=200_000
    )
    sc = _successive_conditional(model, data, jax.random.key(seed + 1))
    zs = {}
    for k in mc:
        m1 = float(jnp.mean(mc[k]))
        se1 = float(jnp.std(mc[k]) / np.sqrt(mc[k].shape[0]))
        m2 = float(jnp.mean(sc[k]))
        se2 = float(jnp.std(sc[k]) / np.sqrt(sc[k].shape[0]))
        zs[k] = (m1 - m2) / np.sqrt(se1**2 + se2**2 + 1e-12)
    return zs


@pytest.mark.slow
@pytest.mark.parametrize("tau_prior", ["halfnormal", "invgamma"])
def test_geweke3_correct_sampler_passes(tau_prior):
    """halfnormal: validates MH tau blocks + conjugate (mu, beta_g) + both
    ASIS moves. invgamma: additionally validates the conjugate
    inverse-gamma draws of BOTH scale levels."""
    model, data = _make(tau_prior)
    zs = _geweke_zscores(model, data)
    worst = max(abs(z) for z in zs.values())
    assert worst < 5.0, f"Geweke-3 z-scores ({tau_prior}) {zs}"


@pytest.mark.slow
def test_geweke3_detects_broken_conjugate_tau():
    """Power check: seed a bug into the conjugate log_tau_g draw (quad/4
    instead of quad/2 in the InvGamma rate — a sufficient-statistic
    scaling error) and require the harness to flag it."""
    model, data = _make("invgamma")

    def broken_log_tau_g(key, state, data_):
        bg, mu = state["beta_g"], state["mu"]
        s1, s2 = jnp.sum(bg, axis=1), jnp.sum(bg**2, axis=1)
        quad = s2 - 2.0 * mu * s1 + G * mu * mu
        a = IG["tau_ig_shape"] + 0.5 * G
        b = IG["tau_ig_scale"] + 0.25 * quad  # BUG: should be 0.5 * quad
        g = jax.random.gamma(key, a, shape=quad.shape, dtype=quad.dtype)
        return jnp.clip(0.5 * (jnp.log(b) - jnp.log(g)), -12.0, 12.0)

    broken = dataclasses.replace(
        model,
        gibbs_draws={**model.gibbs_draws, "log_tau_g": broken_log_tau_g},
    )
    zs = _geweke_zscores(broken, data, seed=10)
    worst = max(abs(z) for z in zs.values())
    assert worst > 6.0, (
        f"Geweke-3 failed to detect a broken conjugate draw: z-scores {zs}"
    )
