"""Diagnostics vs float64 numpy goldens + analytic sanity anchors."""

import numpy as np

import jax.numpy as jnp

from nestmc.diagnostics import (
    ess,
    ess_bulk,
    ess_tail,
    mcse_mean,
    rhat,
    split_rhat,
)
from tests.reference_diagnostics import np_ess, np_split_rhat

RNG = np.random.default_rng(7)


def ar1(phi, C=4, D=2000, scale=1.0):
    x = np.zeros((C, D))
    innov = RNG.normal(size=(C, D)) * scale
    for t in range(1, D):
        x[:, t] = phi * x[:, t - 1] + innov[:, t] * np.sqrt(1 - phi**2)
    return x.astype(np.float32)


def test_rhat_identical_chains_near_one():
    one = RNG.normal(size=(1, 1000)).astype(np.float32)
    x = np.repeat(one, 6, axis=0)
    r = float(split_rhat(x))
    assert abs(r - 1.0) < 0.01


def test_rhat_shifted_chains_large():
    x = RNG.normal(size=(4, 500)).astype(np.float32)
    x[0] += 10.0
    assert float(split_rhat(x)) > 2.0
    assert float(rhat(x)) > 1.5  # rank-normalized also flags it


def test_rhat_matches_numpy_golden():
    x = ar1(0.5, C=6, D=800)[..., None] * np.array([1.0, 2.0], np.float32)
    ours = np.asarray(split_rhat(x))
    golden = np_split_rhat(x)
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_ess_matches_numpy_golden():
    for phi in (0.0, 0.3, 0.8):
        x = ar1(phi, C=4, D=600)
        ours = float(ess(x))
        golden = float(np_ess(x))
        np.testing.assert_allclose(ours, golden, rtol=2e-3)


def test_ess_iid_near_total():
    x = RNG.normal(size=(4, 2000)).astype(np.float32)
    total = 4 * 2000
    assert 0.6 * total < float(ess(x)) <= total
    assert 0.6 * total < float(ess_bulk(x)) <= total


def test_ess_ar1_analytic():
    # AR(1): tau = (1+phi)/(1-phi); ESS ~= M*D / tau
    phi = 0.7
    x = ar1(phi, C=8, D=5000)
    expected = 8 * 5000 * (1 - phi) / (1 + phi)
    got = float(ess(x))
    assert 0.7 * expected < got < 1.4 * expected


def test_ess_tail_iid_near_total():
    # Regression for the round-1 advisor finding: positional tie-breaking in
    # rank normalization turned the 0/1 tail indicator into a near-perfectly
    # autocorrelated sequence (ess_tail 5.3 on this input instead of ~7886).
    x = RNG.normal(size=(4, 2000)).astype(np.float32)
    et = float(ess_tail(x))
    assert et > 0.5 * 4 * 2000, et


def test_ess_tail_matches_numpy_golden():
    from tests.reference_diagnostics import np_ess_tail

    x = ar1(0.6, C=4, D=800)
    ours = float(ess_tail(x))
    golden = float(np_ess_tail(x))
    np.testing.assert_allclose(ours, golden, rtol=0.02)


def test_rank_normalize_matches_scipy():
    from nestmc.diagnostics import _rank_normalize
    from tests.reference_diagnostics import np_rank_normalize

    # continuous draws and a heavily tied integer-valued array
    for x in (
        RNG.normal(size=(4, 300, 3)).astype(np.float32),
        RNG.integers(0, 4, size=(4, 300, 3)).astype(np.float32),
    ):
        ours = np.asarray(_rank_normalize(jnp.asarray(x)))
        golden = np_rank_normalize(x)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_rank_normalize_binary_is_affine():
    # With average-rank ties, rank-normalizing a binary chain maps it to
    # exactly two values, so its ESS equals the raw indicator's ESS.
    from nestmc.diagnostics import _rank_normalize, ess

    x = (RNG.normal(size=(4, 1000)) < -1.6).astype(np.float32)
    z = np.asarray(_rank_normalize(jnp.asarray(x)))
    assert len(np.unique(z)) == 2
    np.testing.assert_allclose(float(ess(z)), float(ess(x)), rtol=1e-3)


def test_ess_tail_and_mcse_finite():
    x = ar1(0.5, C=4, D=1000)
    et = float(ess_tail(x))
    assert 0 < et <= 4 * 1000
    m = float(mcse_mean(x))
    # MCSE ~ sd/sqrt(ess); sd=1 here
    assert 0.005 < m < 0.2


def test_diagnostics_multiparam_shapes():
    x = RNG.normal(size=(4, 300, 5, 2)).astype(np.float32)
    assert split_rhat(x).shape == (5, 2)
    assert ess(x).shape == (5, 2)
    assert ess_bulk(jnp.asarray(x)).shape == (5, 2)
