"""Every logpdf vs scipy.stats (float32 inputs, tolerance-matched)."""

import numpy as np
import pytest
import scipy.stats as st

import jax.numpy as jnp

from nestmc import distributions as d

RNG = np.random.default_rng(0)
X = RNG.normal(size=50).astype(np.float32)
POS = np.abs(RNG.normal(size=50)).astype(np.float32) + 0.1
P01 = RNG.uniform(0.05, 0.95, size=50).astype(np.float32)
COUNTS = RNG.poisson(3.0, size=50).astype(np.float32)
BITS = RNG.integers(0, 2, size=50).astype(np.float32)


def check(ours, theirs, rtol=2e-5, atol=2e-5):
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=rtol, atol=atol
    )


def test_normal():
    check(d.logpdf_normal(X, 0.5, 2.0), st.norm.logpdf(X, 0.5, 2.0))


def test_normal_prec():
    check(
        d.logpdf_normal_prec(X, 0.5, 4.0),
        st.norm.logpdf(X, 0.5, 0.5),
    )


def test_halfnormal():
    check(d.logpdf_halfnormal(POS, 1.7), st.halfnorm.logpdf(POS, 0, 1.7))


def test_halfcauchy():
    check(d.logpdf_halfcauchy(POS, 2.5), st.halfcauchy.logpdf(POS, 0, 2.5))


def test_cauchy():
    check(d.logpdf_cauchy(X, 0.3, 1.2), st.cauchy.logpdf(X, 0.3, 1.2))


def test_student_t():
    check(d.logpdf_student_t(X, 4.0, 0.3, 1.2), st.t.logpdf(X, 4, 0.3, 1.2))


def test_bernoulli_logit():
    eta = X * 3
    p = 1 / (1 + np.exp(-eta))
    check(
        d.logpmf_bernoulli_logit(BITS, eta),
        st.bernoulli.logpmf(BITS.astype(int), p),
        rtol=1e-4, atol=1e-5,
    )


def test_poisson_log():
    eta = X.astype(np.float64) * 0.5
    check(
        d.logpmf_poisson_log(COUNTS, eta.astype(np.float32)),
        st.poisson.logpmf(COUNTS.astype(int), np.exp(eta)),
        rtol=1e-4, atol=1e-4,
    )


def test_binomial_logit():
    n = 10.0
    y = RNG.integers(0, 11, size=50).astype(np.float32)
    eta = X
    p = 1 / (1 + np.exp(-eta))
    check(
        d.logpmf_binomial_logit(y, n, eta),
        st.binom.logpmf(y.astype(int), 10, p),
        rtol=1e-4, atol=1e-4,
    )


def test_gamma():
    check(
        d.logpdf_gamma(POS, 2.5, 1.5),
        st.gamma.logpdf(POS, 2.5, scale=1 / 1.5),
        rtol=1e-4, atol=1e-4,
    )


def test_invgamma():
    check(
        d.logpdf_invgamma(POS, 3.0, 2.0),
        st.invgamma.logpdf(POS, 3.0, scale=2.0),
        rtol=1e-4, atol=1e-4,
    )


def test_exponential():
    check(d.logpdf_exponential(POS, 2.0), st.expon.logpdf(POS, scale=0.5))


def test_lognormal():
    check(
        d.logpdf_lognormal(POS, 0.2, 0.8),
        st.lognorm.logpdf(POS, 0.8, scale=np.exp(0.2)),
        rtol=1e-4, atol=1e-4,
    )


def test_beta():
    check(
        d.logpdf_beta(P01, 2.0, 3.0),
        st.beta.logpdf(P01, 2.0, 3.0),
        rtol=1e-4, atol=1e-4,
    )


def test_uniform():
    check(d.logpdf_uniform(P01, 0.0, 2.0), st.uniform.logpdf(P01, 0, 2))
    assert np.isneginf(float(d.logpdf_uniform(jnp.float32(3.0), 0.0, 2.0)))


def test_mvn_diag():
    x = RNG.normal(size=(7, 3)).astype(np.float32)
    loc = np.array([0.1, -0.2, 0.3], np.float32)
    sd = np.array([1.0, 2.0, 0.5], np.float32)
    ours = d.logpdf_mvn_diag(x, loc, sd)
    theirs = st.multivariate_normal.logpdf(x, loc, np.diag(sd**2))
    check(ours, theirs, rtol=1e-4, atol=1e-4)


def test_mvn_chol():
    a = RNG.normal(size=(3, 3))
    cov = a @ a.T + 3 * np.eye(3)
    chol = np.linalg.cholesky(cov).astype(np.float32)
    x = RNG.normal(size=(7, 3)).astype(np.float32)
    loc = np.zeros(3, np.float32)
    ours = d.logpdf_mvn_chol(x, loc, chol)
    theirs = st.multivariate_normal.logpdf(x, loc, cov)
    check(ours, theirs, rtol=1e-4, atol=1e-4)


def test_transforms_roundtrip_and_jacobian():
    from nestmc import transforms as tr

    for name in ("identity", "log", "logit", "softplus"):
        t = tr.get(name)
        x = np.linspace(-3, 3, 21).astype(np.float32)
        y = np.asarray(t.forward(x))
        back = np.asarray(t.inverse(y))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-4)
        # numerical jacobian
        eps = 1e-3
        num = (np.asarray(t.forward(x + eps)) - np.asarray(
            t.forward(x - eps))) / (2 * eps)
        np.testing.assert_allclose(
            np.asarray(t.log_jac(x)), np.log(np.abs(num) + 1e-30),
            rtol=5e-3, atol=5e-3,
        )
