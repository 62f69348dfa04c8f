"""Newton-MH hooks for the generic GLM surface (VERDICT r3 item 7).

Tiers:
1. Analytic (value, grad, packed -Hessian) hooks vs autodiff of the
   conditional, all five families.
2. Gaussian family: the beta conditional is EXACTLY Gaussian given
   (mu, tau, sigma), so the Laplace proposal at c=1 is an exact Gibbs
   draw — acceptance must be ~1.
3. End-to-end `algorithm='newton'` runs on every family (no silent MALA
   fallback: the kernel must actually engage).
4. Cache freshness: the ASIS interweave must refresh the carried beta
   cache (a stale cache after an accepted rescale corrupts every later
   accept ratio).
5. Geweke joint-distribution tier for the Newton kernel on the poisson
   family (slow).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.engine import sample
from nestmc.kernels.gibbs import make_sweep
from nestmc.kernels.newton import cond_value_grad_hess, newton_update
from nestmc.kernels.state import init_kernel_state
from nestmc.models.hier_glm import make_hier_glm, synth_glm
from nestmc.ops.smallchol import packed_index

FAMILIES = ["gaussian", "binomial", "bernoulli", "poisson", "negbin"]


def _unpack(h, p):
    """(..., T) packed lower triangle -> (..., p, p) symmetric."""
    out = np.zeros(h.shape[:-1] + (p, p), np.float64)
    for i in range(p):
        for j in range(i + 1):
            out[..., i, j] = h[..., packed_index(i, j)]
            out[..., j, i] = h[..., packed_index(i, j)]
    return out


@pytest.mark.parametrize("family", FAMILIES)
def test_vgh_hooks_match_autodiff(family):
    data, _ = synth_glm(jax.random.key(3), family=family, G=3, n=5, p=2)
    model = make_hier_glm(data, family=family)
    cfg = SamplerConfig(kernel=KernelConfig(algorithm="newton"),
                        run=RunConfig(chains=2, log_every_segment=False))
    state = init_kernel_state(model, cfg, jax.random.key(1), data)
    pos = state.position
    beta = pos["beta"]
    C, G, p = beta.shape

    v, g, h = cond_value_grad_hess(model, "beta", beta, pos, data)

    def cond_sum(b):
        return jnp.sum(model.cond_logdensity("beta", b, pos, data))

    # value parity (sum over chains x groups)
    ref_v = model.cond_logdensity("beta", beta, pos, data)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(ref_v), rtol=2e-5, atol=2e-5
    )
    # gradient parity
    ref_g = jax.grad(cond_sum)(beta)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(ref_g), rtol=2e-4, atol=2e-4
    )
    # Hessian parity: conditional factorizes per (chain, group) unit, so
    # the full Hessian's diagonal unit blocks are minus the packed one
    full = jax.jacfwd(jax.grad(cond_sum))(beta)            # (C,G,p,C,G,p)
    full = np.asarray(full)
    H = _unpack(np.asarray(h), p)
    for c in range(C):
        for gi in range(G):
            np.testing.assert_allclose(
                -full[c, gi, :, c, gi, :], H[c, gi], rtol=3e-3, atol=3e-3
            )


def test_gaussian_newton_is_exact_gibbs():
    """Gaussian beta conditional is exactly Gaussian: acceptance ~ 1."""
    data, _ = synth_glm(jax.random.key(5), family="gaussian", G=8, n=12, p=3)
    model = make_hier_glm(data, family="gaussian")
    cfg = SamplerConfig(kernel=KernelConfig(algorithm="newton"),
                        run=RunConfig(chains=16, log_every_segment=False))
    state = init_kernel_state(model, cfg, jax.random.key(2), data)
    block = model.block("beta")
    _, alpha, _ = newton_update(
        jax.random.key(11), block, model, state.position,
        state.log_scale["beta"], None, data, cache=state.cache["beta"],
    )
    assert float(jnp.min(alpha)) > 0.9999, float(jnp.min(alpha))


@pytest.mark.parametrize("family", FAMILIES)
def test_newton_end_to_end(family):
    """algorithm='newton' actually samples every family (hooks declared,
    no silent MALA fallback) with sane acceptance and finite draws."""
    data, truth = synth_glm(jax.random.key(7), family=family, G=10, n=15,
                            p=2)
    model = make_hier_glm(data, family=family, tau_prior="invgamma")
    assert "beta" in model.cond_cached_newton
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton"),
        run=RunConfig(chains=8, warmup=100, draws=150, seed=4,
                      collect={"mu": None, "log_tau": None},
                      log_every_segment=False),
    )
    post = sample(model, data, cfg)
    # near-Gaussian conditionals: the Laplace proposal accepts at high
    # rates (exactly 1 for gaussian); anything near the RW/MALA optima
    # would mean the fallback engaged instead
    acc = float(jnp.mean(post.accept_rates["beta"]))
    assert acc > 0.8, acc
    for name in ("mu", "log_tau"):
        assert np.all(np.isfinite(np.asarray(post.draws[name])))
    mu_err = np.abs(
        np.asarray(jnp.mean(post.draws["mu"], axis=(0, 1)))
        - np.asarray(truth["mu"])
    )
    assert np.all(mu_err < 1.0), mu_err


@pytest.mark.parametrize("algorithm", ["rwmh", "mala", "newton"])
def test_asis_refreshes_cache(algorithm):
    """After sweeps that interleave ASIS rescales with cached updates, the
    carried beta cache must equal the self hook at the current position."""
    family = "poisson"  # aux-free: the cache carries real likelihoods
    data, _ = synth_glm(jax.random.key(9), family=family, G=6, n=8, p=2)
    model = make_hier_glm(data, family=family, tau_prior="invgamma")
    cfg = SamplerConfig(
        # newton_freeze=False so the h cache must track the position too
        # (under the default freeze, h intentionally stays at its
        # end-of-warmup value through the sampling phase)
        kernel=KernelConfig(algorithm=algorithm, newton_freeze=False),
        run=RunConfig(chains=4, warmup=30, draws=30,
                      log_every_segment=False),
    )
    post = sample(model, data, cfg)
    state = post.final_state
    asis_acc = float(jnp.mean(post.accept_rates["asis_tau"]))
    assert asis_acc > 0.02, "no accepted interweaves: test has no power"
    cache = state.cache["beta"]
    if algorithm == "rwmh":
        ref = model.cond_cached["beta"][0](state.position["beta"], data)
        np.testing.assert_allclose(
            np.asarray(cache), np.asarray(ref), rtol=3e-5, atol=3e-5
        )
    elif algorithm == "mala":
        ref_v, ref_g = model.cond_cached_grad["beta"][0](
            state.position["beta"], data
        )
        np.testing.assert_allclose(
            np.asarray(cache["v"]), np.asarray(ref_v), rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(cache["g"]), np.asarray(ref_g), rtol=3e-4, atol=3e-4
        )
    else:
        ref_v, ref_g, ref_h = model.cond_cached_newton["beta"][0](
            state.position["beta"], data
        )
        np.testing.assert_allclose(
            np.asarray(cache["v"]), np.asarray(ref_v), rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(cache["g"]), np.asarray(ref_g), rtol=3e-4, atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(cache["h"]), np.asarray(ref_h), rtol=3e-4, atol=3e-4
        )


@pytest.mark.slow
def test_geweke_glm_newton_poisson():
    """Geweke joint-distribution test for the Newton kernel on the GLM
    poisson family: successive-conditional (y ~ lik, beta/mu/tau ~ sweep)
    vs marginal-conditional (exact prior + lik) moments by z-test."""
    Gq, n, p, C, M, BURN = 3, 4, 2, 256, 400, 100
    data0, _ = synth_glm(jax.random.key(13), family="poisson", G=Gq, n=n,
                         p=p)
    model = make_hier_glm(data0, family="poisson", tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton"),
        run=RunConfig(chains=C, log_every_segment=False),
    )

    def stats(state, y):
        tau = jnp.exp(state["log_tau"])
        return {
            "mu0": state["mu"][:, 0],
            "mu02": state["mu"][:, 0] ** 2,
            "tau0": tau[:, 0],
            "tau02": tau[:, 0] ** 2,
            "beta00": state["beta"][:, 0, 0],
            "beta002": state["beta"][:, 0, 0] ** 2,
            "ymean": jnp.mean(y, axis=(-2, -1)),
        }

    def sample_y(key, beta):
        eta = jnp.einsum("cgp,gnp->cgn", beta, data0.x)
        # clip the rate: prior tails make exp(eta) overflow in a few of
        # the 200k replicas; both simulators use the SAME likelihood
        return jax.random.poisson(
            key, jnp.clip(jnp.exp(eta), 0.0, 1e6)
        ).astype(jnp.float32)

    # marginal-conditional: exact prior + one likelihood draw
    kmc = jax.random.key(0)
    st_mc = model.prior_sample(kmc, data0, 200_000)
    y_mc = sample_y(jax.random.fold_in(kmc, 1), st_mc["beta"])
    mc = {k: np.asarray(v, np.float64) for k, v in
          stats(st_mc, y_mc).items()}

    # successive-conditional: alternate y ~ lik and state ~ MCMC(..|y)
    sweep = make_sweep(model, cfg)
    kstate = init_kernel_state(model, cfg, jax.random.key(2), data0)
    kstate = dataclasses.replace(
        kstate, position=model.prior_sample(jax.random.key(3), data0, C)
    )

    def step(carry, key_t):
        ks, y = carry
        y = sample_y(key_t, ks.position["beta"])
        ks = sweep(ks, dataclasses.replace(data0, y=y), adapt=False)
        return (ks, y), stats(ks.position, y)

    y0 = sample_y(jax.random.key(4), kstate.position["beta"])
    keys = jax.random.split(jax.random.key(99), M)
    (_, _), sc_stats = jax.lax.scan(step, (kstate, y0), keys)
    sc = {k: np.asarray(jnp.mean(v[BURN:], axis=0), np.float64)
          for k, v in sc_stats.items()}

    for k in mc:
        m1, s1, n1 = mc[k].mean(), mc[k].std(ddof=1), mc[k].size
        m2, s2 = sc[k].mean(), sc[k].std(ddof=1)
        # successive-conditional chains are autocorrelated across the M
        # iterations we averaged; per-chain means are iid across C
        z = (m1 - m2) / np.sqrt(s1**2 / n1 + s2**2 / C)
        assert abs(z) < 5.0, (k, z, m1, m2)
