"""ops/smallchol unrolled packed-Cholesky algebra vs dense numpy linalg."""

import numpy as np
import pytest

import jax.numpy as jnp

from nestmc.ops import smallchol as sc


@pytest.mark.parametrize("p", [1, 2, 3, 4, 6, 8])
def test_chol_solve_logdet_parity(p):
    rng = np.random.default_rng(p)
    A = rng.normal(size=(7, 5, p, p))
    spd = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(p)
    packed = sc.pack_dense(jnp.asarray(spd), p)

    L = sc.chol_packed(packed, p)
    Lnp = np.linalg.cholesky(spd)
    tril = np.tril(np.ones((p, p)))
    np.testing.assert_allclose(
        np.asarray(sc.unpack_dense(L, p)) * tril, Lnp, atol=1e-5
    )

    b = rng.normal(size=(7, 5, p))
    np.testing.assert_allclose(
        np.asarray(sc.spd_solve(L, jnp.asarray(b), p)),
        np.linalg.solve(spd, b[..., None])[..., 0],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sc.solve_lower(L, jnp.asarray(b), p)),
        np.linalg.solve(Lnp, b[..., None])[..., 0],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sc.solve_upper_t(L, jnp.asarray(b), p)),
        np.linalg.solve(np.swapaxes(Lnp, -1, -2), b[..., None])[..., 0],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sc.lt_vec(L, jnp.asarray(b), p)),
        (np.swapaxes(Lnp, -1, -2) @ b[..., None])[..., 0],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sc.half_logdet(L, p)),
        0.5 * np.linalg.slogdet(spd)[1],
        atol=1e-5,
    )


def test_pack_unpack_roundtrip():
    p = 4
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, p, p))
    A = (A + np.swapaxes(A, -1, -2)) / 2
    packed = sc.pack_dense(jnp.asarray(A), p)
    assert packed.shape == (3, sc.packed_dim(p))
    np.testing.assert_allclose(
        np.asarray(sc.unpack_dense(packed, p)), A, atol=1e-6
    )


def test_pack_diag():
    p = 3
    d = jnp.asarray([[1.0, 2.0, 3.0]])
    full = np.asarray(sc.unpack_dense(sc.pack_diag(d, p), p))
    np.testing.assert_allclose(full[0], np.diag([1.0, 2.0, 3.0]))
