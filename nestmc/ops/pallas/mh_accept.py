"""Fully fused RW-MH step for the hierarchical-logistic group block.

One Pallas kernel performs, per (group-tile, chain-tile):
  1. proposal noise from the on-core PRNG (Box-Muller over prng_random_bits),
  2. proposal  beta' = beta + exp(log_scale) * eps,
  3. the Bernoulli-logit log-likelihood of beta' (obs-axis reduction),
  4. the Gaussian group-prior delta (log-tau terms cancel; only quadratics),
  5. the accept/reject draw and the select,
writing the new beta, the refreshed likelihood cache, and the acceptance
probabilities — the entire group-block MH update touches HBM once per
operand (BASELINE.json:5 'all proposal/accept-reject state kept on-device',
here kept in VMEM registers within a single kernel).

The current position's likelihood comes from the carried cache
(nestmc/kernels/rwmh.py cond_cached mechanics), so NO second likelihood
evaluation happens anywhere in the sweep for this block.

RNG: the kernel uses the TPU per-core PRNG seeded from (key, grid cell), a
DIFFERENT stream than the threefry path — draws are deterministic given the
key but not bitwise-equal to the unfused kernel; the unfused path remains
the default (KernelConfig.fused_accept opts in). Statistical equivalence is
tested (tests/test_fused_accept.py; moment tests for the Box-Muller
normals).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nestmc.ops.pallas.loglik_logistic import (
    _eta_vpu,
    _group_tile,
    _pad_groups,
    _pick_tile,
    _r8,
    _r128,
)

_TWO_PI = 2.0 * math.pi


def _uniform_01(shape, mix=None):
    """Uniform in (0, 1): top 24 bits of the PRNG, offset off exact 0.

    Mosaic has no uint32->f32 cast; shift clears the top byte, so a bitcast
    to int32 is value-preserving and int32->f32 lowers fine.

    mix: optional int32 scalar xored into the raw bits. prng_seed takes one
    32-bit scalar (Mosaic rejects multi-operand prng_set_seed_32), so the
    64-bit threefry key would otherwise collapse to 32 bits and two sweeps
    could replay an identical stream (birthday ~0.4% at 6k sweeps). Xoring
    the second key word into the bits is a bijection per draw (keeps exact
    uniformity and cross-cell distinctness) and makes the stream a function
    of the FULL key.
    """
    bits = pltpu.prng_random_bits(shape)
    if mix is not None:
        bits = bits ^ mix
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    u24i = pltpu.bitcast(u24, jnp.int32)
    return u24i.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal(shape, mix=None):
    """Box-Muller standard normals from two uniform draws."""
    u1 = _uniform_01(shape, mix)
    u2 = _uniform_01(shape, mix)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _seed_words(key):
    """(1, 2) int32 SMEM operand: [prng_seed word, bit-mix word].

    Word 0 (xor of the threefry halves) preserves the round-2 seeding
    stream; word 1 carries the second 32 bits of the key into the xor mix
    so distinct 64-bit keys yield distinct noise streams.
    """
    kd = jax.random.key_data(key).astype(jnp.uint32)
    return jnp.stack(
        [kd[..., 0] ^ kd[..., 1], kd[..., 1]], axis=-1
    ).astype(jnp.int32).reshape(1, 2)


def _make_fused_kernel(p: int):
  def _fused_kernel(
    seed_ref,                     # (1, 2) int32 in SMEM [seed, mix]
    x_ref, y_ref, mask_ref,       # (TG,n,p), (TG,n), (TG,n)
    beta_ref,                     # (TG, p, TC)
    lik_ref,                      # (TG, TC) carried loglik of current beta
    ls_ref,                       # (TG, TC) log proposal scales
    mu_ref, itau2_ref,            # (p, TC) mu and 1/tau^2 (chains-minor)
    out_beta_ref, out_lik_ref, out_alpha_ref,
):
    # single-scalar seed: Mosaic rejects multi-operand prng_set_seed_32.
    # Distinct grid cells get distinct seeds (pid1 < 126 in practice);
    # the second key word enters via the bit mix (see _uniform_01).
    pltpu.prng_seed(
        seed_ref[0, 0]
        + pl.program_id(0) * jnp.int32(1000003)
        + pl.program_id(1) * jnp.int32(7919)
    )
    mix = seed_ref[0, 1]
    beta = beta_ref[:]                                   # (TG, p, TC)
    step = jnp.exp(ls_ref[:])[:, None, :] * _normal(beta.shape, mix)
    prop = beta + step

    eta = _eta_vpu(x_ref[:], prop, p)                    # (TG, n, TC)
    y = y_ref[:][:, :, None]
    m = mask_ref[:][:, :, None]
    lik_prop = jnp.sum((y * eta - nn.softplus(eta)) * m, axis=1)

    mu = mu_ref[:][None, :, :]                           # (1, p, TC)
    itau2 = itau2_ref[:][None, :, :]
    dp = prop - mu
    db = beta - mu
    gprior_delta = jnp.sum(-0.5 * (dp * dp - db * db) * itau2, axis=1)

    log_alpha = lik_prop - lik_ref[:] + gprior_delta     # (TG, TC)
    logu = jnp.log(_uniform_01(log_alpha.shape, mix))
    accept = logu < log_alpha                            # NaN -> reject

    out_beta_ref[:] = jnp.where(accept[:, None, :], prop, beta)
    out_lik_ref[:] = jnp.where(accept, lik_prop, lik_ref[:])
    alpha = jnp.exp(jnp.minimum(log_alpha, 0.0))
    out_alpha_ref[:] = jnp.where(jnp.isnan(log_alpha), 0.0, alpha)

  return _fused_kernel


def fused_rwmh_logistic_step(
    key, beta, lik_cache, log_scale, mu, log_tau, x, y, mask,
    interpret: bool | None = None,
):
    """(new_beta (C,G,p), new_lik (C,G), alpha (C,G)) in one kernel pass.

    log_scale: (C, G) or (C, 1) per-(chain, group) RW scales.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, G, p = beta.shape
    n = x.shape[1]
    TC = _pick_tile(C, (256, 128, 64, 32, 16, 8))
    TG = _group_tile(n, p, TC, G, n_inter=2,
                     extra_out=_r8(p) * _r128(TC) * 4 + 2 * _r128(TC) * 4,
                     max_tg=64)

    seed = _seed_words(key)

    bt = jnp.transpose(beta, (1, 2, 0))                  # (G, p, C)
    lik_t = lik_cache.T                                  # (G, C)
    ls_t = jnp.broadcast_to(log_scale, (C, G)).T         # (G, C)
    mu_t = mu.T                                          # (p, C)
    itau2_t = jnp.exp(-2.0 * log_tau).T                  # (p, C)
    (x_p, y_p, mask_p, bt_p, lik_p, ls_p), Gp = _pad_groups(
        [x, y, mask, bt, lik_t, ls_t], G, TG
    )

    grid = (Gp // TG, C // TC)
    new_bt, new_lik, alpha = pl.pallas_call(
        _make_fused_kernel(p),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 2), lambda g, c: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((TG, n, p), lambda g, c: (g, 0, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, n), lambda g, c: (g, 0)),
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((p, TC), lambda g, c: (0, c)),
            pl.BlockSpec((p, TC), lambda g, c: (0, c)),
        ],
        out_specs=[
            pl.BlockSpec((TG, p, TC), lambda g, c: (g, 0, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
            pl.BlockSpec((TG, TC), lambda g, c: (g, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Gp, p, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
            jax.ShapeDtypeStruct((Gp, C), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * C * Gp * n * p + 12 * C * Gp * (n + p),
            bytes_accessed=4 * (Gp * n * p + 2 * Gp * n
                                + 2 * C * Gp * p + 6 * C * Gp),
            transcendentals=C * Gp * (n + 3 * p + 2),
        ),
    )(seed, x_p, y_p, mask_p, bt_p, lik_p, ls_p, mu_t, itau2_t)
    return (
        jnp.transpose(new_bt[:G], (2, 0, 1)),
        new_lik[:G].T,
        alpha[:G].T,
    )
