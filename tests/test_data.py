"""Data-layer invariants: padded == ragged reductions, 3-level wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.data import NestedData, NestedData3, RaggedData, bucket_by_size
from nestmc.ops import (
    logistic_loglik_padded,
    logistic_loglik_segment,
    poisson_loglik_padded,
    poisson_loglik_segment,
)

RNG = np.random.default_rng(1)


def ragged_lists(G=13, max_n=17, p=3):
    sizes = RNG.integers(1, max_n + 1, size=G)
    ys = [RNG.integers(0, 2, size=s).astype(np.float32) for s in sizes]
    xs = [RNG.normal(size=(s, p)).astype(np.float32) for s in sizes]
    return ys, xs


def test_from_ragged_roundtrip():
    ys, xs = ragged_lists()
    nd = NestedData.from_ragged(ys, xs)
    assert nd.num_groups == len(ys)
    assert nd.max_obs == max(len(y) for y in ys)
    np.testing.assert_array_equal(
        np.asarray(nd.sizes), [len(y) for y in ys]
    )
    rd = nd.to_ragged()
    rd2 = RaggedData.from_ragged(ys, xs)
    np.testing.assert_allclose(np.asarray(rd.y), np.asarray(rd2.y))
    np.testing.assert_allclose(np.asarray(rd.x), np.asarray(rd2.x))
    np.testing.assert_array_equal(
        np.asarray(rd.segment_ids), np.asarray(rd2.segment_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(rd.sizes()), np.asarray(nd.sizes)
    )


def test_padded_equals_segment_loglik():
    ys, xs = ragged_lists()
    nd = NestedData.from_ragged(ys, xs)
    rd = RaggedData.from_ragged(ys, xs)
    C = 5
    beta = jnp.asarray(
        RNG.normal(size=(C, nd.num_groups, nd.num_covariates)).astype(
            np.float32
        )
    )
    padded = logistic_loglik_padded(beta, nd.x, nd.y, nd.mask)
    segment = logistic_loglik_segment(
        beta, rd.x, rd.y, rd.segment_ids, rd.num_groups
    )
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(segment), rtol=2e-5, atol=2e-5
    )


def test_padded_equals_segment_poisson():
    ys, xs = ragged_lists()
    ys = [np.float32(RNG.poisson(2.0, size=len(y))) for y in ys]
    nd = NestedData.from_ragged(ys, xs)
    rd = RaggedData.from_ragged(ys, xs)
    C = 4
    beta = jnp.asarray(
        RNG.normal(size=(C, nd.num_groups, nd.num_covariates)).astype(
            np.float32
        ) * 0.3
    )
    padded = poisson_loglik_padded(beta, nd.x, nd.y, nd.mask)
    segment = poisson_loglik_segment(
        beta, rd.x, rd.y, rd.segment_ids, rd.num_groups
    )
    # padded path: masked slots have y=0, eta arbitrary -> contribute
    # -exp(eta)*0 masked out; compare where groups match
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(segment), rtol=2e-4, atol=2e-4
    )


def test_pad_groups_to():
    ys, xs = ragged_lists(G=10)
    nd = NestedData.from_ragged(ys, xs)
    nd2 = nd.pad_groups_to(16)
    assert nd2.num_groups == 16
    assert float(nd2.mask[10:].sum()) == 0.0
    C = 3
    beta = jnp.zeros((C, 16, nd.num_covariates))
    ll = logistic_loglik_padded(beta, nd2.x, nd2.y, nd2.mask)
    assert np.all(np.asarray(ll[:, 10:]) == 0.0)


def test_nested3_wiring():
    G, spg, n, p = 4, 3, 5, 2
    ys = [
        [RNG.poisson(2.0, size=n).astype(np.float32) for _ in range(spg)]
        for _ in range(G)
    ]
    xs = [
        [RNG.normal(size=(n, p)).astype(np.float32) for _ in range(spg)]
        for _ in range(G)
    ]
    d3 = NestedData3.from_ragged(ys, xs)
    assert d3.num_subjects == G * spg
    assert d3.num_groups == G
    np.testing.assert_array_equal(
        np.asarray(d3.subjects_per_group()), [spg] * G
    )
    np.testing.assert_array_equal(
        np.asarray(d3.subject_group),
        np.repeat(np.arange(G), spg),
    )


def test_bucket_by_size():
    ys, xs = ragged_lists(G=30, max_n=64)
    buckets = bucket_by_size(ys, xs)
    seen = np.concatenate([np.asarray(idx) for _, idx in buckets])
    assert sorted(seen.tolist()) == list(range(30))
    for nd, idx in buckets:
        for row, orig in enumerate(np.asarray(idx)):
            assert int(nd.sizes[row]) == len(ys[orig])
            assert nd.max_obs >= int(nd.sizes[row])


def test_pytree_registration():
    ys, xs = ragged_lists(G=6)
    nd = NestedData.from_ragged(ys, xs)
    out = jax.jit(lambda d: jnp.sum(d.y * d.mask))(nd)
    assert np.isfinite(float(out))
    rd = RaggedData.from_ragged(ys, xs)
    out = jax.jit(lambda d: jnp.sum(d.y))(rd)
    assert np.isfinite(float(out))
