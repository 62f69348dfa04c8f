"""Streaming cross-chain all-param ESS (VERDICT r4 item 5).

The estimator ESS = M * n * var_plus / B is read off the SAME split-half
Welford accumulators the full-R-hat gate streams, so the min-ESS floor is
measured over EVERY parameter instead of extrapolated from collected
scalars or sampled-unit upper bounds. Tests:

  1. exact parity: streaming accumulators (std and kernel/fold layouts)
     reproduce the in-memory reference `cross_chain_ess` bit-for-bit-ish
     (Welford vs two-pass moment order).
  2. statistical correctness: iid draws read ~M*n (capped at M*n); AR(1)
     draws match the analytic ESS factor (1-rho)/(1+rho) and the FFT+Geyer
     estimator within sampling noise.
  3. the chi-square lower bound sits below the point estimate by the
     Wilson-Hilferty factor.
  4. engine end-to-end: a full_rhat run exposes Posterior.full_ess over
     every position block, and the streamed value for a fully-collected
     block agrees with the reference computed from its retained draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nestmc.diagnostics import (
    cross_chain_ess,
    ess,
    fold_ess_finalize,
    fold_rhat_init,
    fold_rhat_scalars,
    fold_rhat_update,
    streaming_ess_finalize,
    streaming_rhat_init,
    streaming_rhat_update,
)


def _feed_std(draws):
    """Run the engine's streaming update over (C, D, ...) draws."""
    C, D = draws.shape[:2]
    half = D // 2
    acc = streaming_rhat_init({"x": draws[:, 0]})
    for j in range(D):
        acc = streaming_rhat_update(acc, {"x": draws[:, j]}, j, half)
    return acc


class TestParity:
    def test_std_layout_matches_reference(self):
        key = jax.random.key(0)
        draws = jax.random.normal(key, (6, 40, 3)) * 2.0 + 1.0
        acc = _feed_std(draws)
        out = streaming_ess_finalize(acc)["x"]
        ref_e, ref_lb = cross_chain_ess(draws)
        np.testing.assert_allclose(out["ess"], ref_e, rtol=1e-4)
        np.testing.assert_allclose(out["ess_lb"], ref_lb, rtol=1e-4)

    def test_std_layout_odd_draws_drops_leftover(self):
        key = jax.random.key(1)
        draws = jax.random.normal(key, (4, 41))
        acc = _feed_std(draws)
        out = streaming_ess_finalize(acc)["x"]
        ref_e, _ = cross_chain_ess(draws[:, :40])
        np.testing.assert_allclose(out["ess"], ref_e, rtol=1e-4)

    def test_fold_layout_matches_reference(self):
        key = jax.random.key(2)
        C, D, G, p = 5, 32, 4, 2
        draws = jax.random.normal(key, (C, D, G, p)) + 0.5
        half = D // 2
        acc = fold_rhat_init({"b": draws[:, 0]}, names=("b",))
        count, mean, m2 = acc["b"]
        for j in range(D):
            sc = fold_rhat_scalars(count, jnp.int32(j), half)
            x_t = jnp.moveaxis(draws[:, j], 0, -1)  # (G, p, C)
            mean, m2 = fold_rhat_update(mean, m2, x_t, sc)
            count = count + sc[:, 1]
        out = fold_ess_finalize({"b": (count, mean, m2)})["b"]
        ref_e, ref_lb = cross_chain_ess(draws)
        np.testing.assert_allclose(out["ess"], ref_e, rtol=1e-4)
        np.testing.assert_allclose(out["ess_lb"], ref_lb, rtol=1e-4)


class TestStatistics:
    def test_iid_reads_near_total(self):
        key = jax.random.key(3)
        C, D = 64, 256
        draws = jax.random.normal(key, (C, D, 8))
        e, lb = cross_chain_ess(draws)
        total = C * D
        assert float(jnp.min(e)) > 0.55 * total  # chi2 noise at M=128
        assert float(jnp.max(e)) <= total + 1e-3  # capped at M*n
        assert float(jnp.max(lb / e)) < 1.0

    def test_ar1_matches_analytic_and_fft(self):
        rho, C, D = 0.9, 128, 512
        rng = np.random.default_rng(7)
        x = np.zeros((C, D), np.float64)
        x[:, 0] = rng.standard_normal(C)
        innov = rng.standard_normal((C, D)) * np.sqrt(1 - rho**2)
        for t in range(1, D):
            x[:, t] = rho * x[:, t - 1] + innov[:, t]
        e, lb = cross_chain_ess(jnp.asarray(x))
        analytic = C * D * (1 - rho) / (1 + rho)
        assert 0.6 * analytic < float(e) < 1.6 * analytic
        fft = float(ess(jnp.asarray(x, jnp.float32)))
        assert 0.6 * fft < float(e) < 1.6 * fft
        assert float(lb) < float(e)

    def test_lower_bound_is_wilson_hilferty_shrink(self):
        key = jax.random.key(4)
        C, D = 16, 64
        draws = jax.random.normal(key, (C, D))
        e, lb = cross_chain_ess(draws, alpha=0.05)
        M = 2 * C
        k = M - 1
        z = -1.6448536  # ndtri(0.05)
        c = 2.0 / (9.0 * k)
        shrink = (1.0 - c + z * np.sqrt(c)) ** 3
        np.testing.assert_allclose(float(lb / e), shrink, rtol=1e-4)


class TestEngine:
    @pytest.fixture(scope="class")
    def post(self):
        from nestmc.config import RunConfig, SamplerConfig
        from nestmc.engine import sample
        from nestmc.models import make_hier_logistic, synth_logistic

        data, _ = synth_logistic(jax.random.key(5), G=12, n=10, p=2)
        cfg = SamplerConfig(run=RunConfig(
            chains=8, warmup=150, draws=200, seed=0,
            collect={"mu": None, "log_tau": None, "beta": 4},
            full_rhat=True, log_every_segment=False,
        ))
        return sample(make_hier_logistic(data), data, cfg)

    def test_full_ess_covers_every_position_block(self, post):
        assert post.full_ess is not None
        assert set(post.full_ess) >= {"beta", "mu", "log_tau"}
        beta = post.full_ess["beta"]
        assert beta["ess"].shape == (12, 2)

    def test_streamed_matches_reference_on_collected_block(self, post):
        streamed = np.asarray(post.full_ess["mu"]["ess"])
        ref = np.asarray(cross_chain_ess(post.draws["mu"])[0])
        np.testing.assert_allclose(streamed, ref, rtol=1e-3)

    def test_min_ess_all_params_accessor(self, post):
        floor = post.min_ess_all_params()
        assert floor is not None
        assert floor["block"] in post.full_ess
        assert 0 < floor["ess_lb"] <= floor["ess"]
        # the floor over ALL params cannot exceed any single block's min
        assert floor["ess"] <= float(
            np.min(np.asarray(post.full_ess["log_tau"]["ess"]))
        )

    def test_no_full_rhat_no_full_ess(self):
        from nestmc.config import RunConfig, SamplerConfig
        from nestmc.engine import sample
        from nestmc.models import make_hier_logistic, synth_logistic

        data, _ = synth_logistic(jax.random.key(6), G=6, n=8, p=2)
        cfg = SamplerConfig(run=RunConfig(
            chains=4, warmup=20, draws=20, log_every_segment=False,
        ))
        post = sample(make_hier_logistic(data), data, cfg)
        assert post.full_ess is None
        assert post.min_ess_all_params() is None
