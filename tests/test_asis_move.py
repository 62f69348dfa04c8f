"""Single-launch ASIS move kernel (ops/pallas/asis_move.py): bitwise
parity against the eval+select composition it replaced.

The kernel is fully deterministic (the log-uniform accept draw and the
prior delta arrive as operands), so CPU interpret mode can check EXACT
equality — pass 0's VMEM-parked likelihood/grad, the in-kernel accept at
the last group tile, and pass 1's select must reproduce
sweep_logistic.asis_eval_t + asis_select_t output for output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.ops.pallas.asis_move import asis_move_t
from nestmc.ops.pallas.sweep_logistic import (
    asis_eval_t,
    asis_select_t,
    pad_groups_to_multiple as padm,
)


def _operands(C, G, n, p, seed=0):
    ks = jax.random.split(jax.random.key(seed), 9)
    beta = padm(0.4 * jax.random.normal(ks[0], (G, p, C)), G)
    g = padm(0.2 * jax.random.normal(ks[2], (G, p, C)), G)
    mu = 0.3 * jax.random.normal(ks[3], (p, C))
    ratio = jnp.exp(0.05 * jax.random.normal(ks[4], (p, C)))
    x = padm(jax.random.normal(ks[5], (G, n, p)), G)
    y = padm(
        jax.random.bernoulli(ks[6], 0.5, (G, n)).astype(jnp.float32), G
    )
    mask = padm(jnp.ones((G, n), jnp.float32), G)
    # carried loglik = true loglik of beta, so accept/reject both occur
    v, _, _ = asis_eval_t(beta, jnp.zeros_like(beta[:, 0]), mu,
                          jnp.ones_like(ratio), x, y, mask,
                          interpret=True)
    pd = 0.3 * jax.random.normal(ks[7], (C,))
    logu = jnp.log(jax.random.uniform(ks[8], (C,), minval=1e-8))
    return beta, v, g, mu, ratio, pd, logu, x, y, mask


@pytest.mark.parametrize("dims", [(16, 21, 9, 3), (8, 70, 12, 4),
                                  (128, 40, 6, 2)])
@pytest.mark.parametrize("dense", [False, True])
def test_bitwise_parity_vs_composition(dims, dense):
    C, G, n, p = dims
    beta, v, g, mu, ratio, pd, logu, x, y, mask = _operands(
        C, G, n, p, seed=p
    )
    lik_new, g_new, dsum = asis_eval_t(beta, v, mu, ratio, x, y, mask,
                                       interpret=True, dense=dense)
    la = dsum[0] + pd
    acc = (logu < la).astype(jnp.float32)
    b2, v2, g2 = asis_select_t(beta, v, g, lik_new, g_new, mu, ratio,
                               acc[None, :], mask, interpret=True)
    alpha_ref = jnp.where(jnp.isnan(la), 0.0,
                          jnp.exp(jnp.minimum(la, 0.0)))

    nb, nv, ng, alpha, acc_out = asis_move_t(
        beta, v, g, mu, ratio, pd, logu, x, y, mask,
        interpret=True, dense=dense,
    )
    assert 0.05 < float(acc.mean()) < 0.95, "both branches must occur"
    for a, b in [(nb, b2), (nv, v2), (ng, g2), (alpha, alpha_ref),
                 (acc_out, acc)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # pad rows stay exactly zero (streaming R-hat invariant)
    assert np.all(np.asarray(nb)[G:] == 0.0)
    assert np.all(np.asarray(ng)[G:] == 0.0)
    assert np.all(np.asarray(nv)[G:] == 0.0)


def test_nan_delta_rejects():
    C, G, n, p = 8, 21, 9, 3
    beta, v, g, mu, ratio, pd, logu, x, y, mask = _operands(C, G, n, p)
    pd = jnp.full((C,), jnp.nan)
    nb, nv, ng, alpha, acc_out = asis_move_t(
        beta, v, g, mu, ratio, pd, logu, x, y, mask, interpret=True,
    )
    assert np.all(np.asarray(acc_out) == 0.0)
    assert np.all(np.asarray(alpha) == 0.0)
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(beta))
