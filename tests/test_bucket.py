"""Parity contract for the bucketed ragged path (ops/bucket.py).

BucketLayout partitions groups by size with power-of-2 caps and runs the
PADDED kernels once per bucket; results must match the segment reference
ops/loglik.py::logistic_loglik_segment exactly (same math, different
layout). Also pins the padding-waste bound and the min-groups merge rule.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.ops.bucket import (
    BucketLayout,
    bucketed_logistic_loglik,
    bucketed_logistic_logp_grad,
    bucketed_logistic_logp_grad_hess,
)
from nestmc.ops.loglik import (
    logistic_logp_grad_hess_segment,
    logistic_logp_grad_segment,
    logistic_loglik_segment,
)


def _ragged(key, C, G, p, max_n, min_n=0, empty_every=None):
    kx, kb, ky, kn = jax.random.split(key, 4)
    sizes = np.array(jax.random.randint(kn, (G,), min_n, max_n + 1))
    if empty_every:
        sizes[::empty_every] = 0
    N = int(sizes.sum())
    seg = np.repeat(np.arange(G, dtype=np.int32), sizes)
    x = jax.random.normal(kx, (N, p), jnp.float32)
    y = jax.random.bernoulli(ky, 0.5, (N,)).astype(jnp.float32)
    beta = 0.7 * jax.random.normal(kb, (C, G, p), jnp.float32)
    return beta, x, y, jnp.asarray(seg)


CASES = [
    # (C, G, p, max_n, min_n, empty_every) — wide size spreads so several
    # buckets actually form; empty groups must come back with loglik 0.
    (8, 64, 3, 33, 0, 7),
    (4, 128, 2, 129, 1, None),
    (8, 16, 4, 5, 0, 2),
]


@pytest.mark.parametrize("case", CASES)
def test_bucket_loglik_parity(case):
    C, G, p, max_n, min_n, empty_every = case
    beta, x, y, seg = _ragged(jax.random.key(11), C, G, p, max_n,
                              min_n, empty_every)
    layout = BucketLayout.build(np.asarray(seg), G, min_groups=4)
    got = bucketed_logistic_loglik(beta, x, y, layout)
    ref = logistic_loglik_segment(beta, x, y, seg, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", CASES)
def test_bucket_logp_grad_parity(case):
    C, G, p, max_n, min_n, empty_every = case
    beta, x, y, seg = _ragged(jax.random.key(12), C, G, p, max_n,
                              min_n, empty_every)
    layout = BucketLayout.build(np.asarray(seg), G, min_groups=4)
    ll, g = bucketed_logistic_logp_grad(beta, x, y, layout)
    ll_ref, g_ref = logistic_logp_grad_segment(beta, x, y, seg, G)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("case", CASES)
def test_bucket_logp_grad_hess_parity(case):
    """The Newton obs pass through the bucket path matches the segment
    reference (value, grad AND packed Hessian)."""
    C, G, p, max_n, min_n, empty_every = case
    beta, x, y, seg = _ragged(jax.random.key(13), C, G, p, max_n,
                              min_n, empty_every)
    layout = BucketLayout.build(np.asarray(seg), G, min_groups=4)
    ll, g, h = bucketed_logistic_logp_grad_hess(beta, x, y, layout)
    ll_ref, g_ref, h_ref = logistic_logp_grad_hess_segment(
        beta, x, y, seg, G
    )
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-4, atol=2e-5)


def test_bucket_padding_bound():
    """Power-of-2 edges bound per-group padding to <2x its true size
    (merged small buckets can exceed this only via the min_groups rule,
    disabled here)."""
    rng = np.random.default_rng(0)
    sizes = rng.integers(1, 1000, size=500)
    seg = np.repeat(np.arange(500, dtype=np.int32), sizes)
    layout = BucketLayout.build(seg, 500, min_groups=1)
    assert layout.padded_obs() < 2 * int(sizes.sum())
    # every group with >0 obs appears in exactly one bucket
    seen = np.concatenate([np.asarray(b.group_index) for b in layout.buckets])
    assert sorted(seen.tolist()) == list(range(500))


def test_bucket_min_groups_merges_up():
    """A size tail thinner than min_groups merges into the next bucket
    instead of launching a tiny kernel."""
    sizes = np.array([1] * 2 + [3] * 2 + [60] * 40)  # 2+2 small, 40 big
    seg = np.repeat(np.arange(sizes.size, dtype=np.int32), sizes)
    layout = BucketLayout.build(seg, sizes.size, min_groups=8)
    assert len(layout.buckets) < 4
    for b in layout.buckets[:-1]:
        assert b.obs_index.shape[0] >= 8


def test_bucket_rejects_unsorted():
    with pytest.raises(ValueError):
        BucketLayout.build(np.array([1, 0, 2]), 3)


def test_bucket_zero_size_groups_zero_loglik():
    sizes = np.array([0, 3, 0, 5, 0])
    seg = np.repeat(np.arange(5, dtype=np.int32), sizes)
    key = jax.random.key(13)
    x = jax.random.normal(key, (int(sizes.sum()), 2), jnp.float32)
    y = jnp.zeros((int(sizes.sum()),), jnp.float32)
    beta = jnp.ones((2, 5, 2), jnp.float32)
    layout = BucketLayout.build(seg, 5, min_groups=1)
    ll = bucketed_logistic_loglik(beta, x, y, layout)
    assert np.allclose(np.asarray(ll)[:, [0, 2, 4]], 0.0)
