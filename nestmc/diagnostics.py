"""Convergence diagnostics (L7): split R-hat, ESS, MCSE — on device.

Everything is jit-compatible and shape-static; the Geyer initial-positive /
monotone truncation (data-dependent in textbook form) is implemented with
cumprod/cummin masking, so diagnostics run as one fused XLA program over all
parameters with no host round-trips (BASELINE.json:5).

Formulas follow Vehtari, Gelman, Simpson, Carpenter & Buerkner (2021)
"Rank-normalization, folding, and localization: an improved R-hat"; golden
tests against a float64 numpy reference in tests/test_diagnostics.py.

Input convention: ``draws`` is (chains, draws) or (chains, draws, *param);
reductions broadcast over trailing parameter dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri


def _split_chains(x):
    """(C, D, ...) -> (2C, D//2, ...); drops the last draw if D is odd."""
    C, D = x.shape[0], x.shape[1]
    half = D // 2
    x = x[:, : 2 * half]
    return x.reshape((C * 2, half) + x.shape[2:])


def _within_between(x):
    """W, B, var_plus over (M, N, ...) split sequences."""
    N = x.shape[1]
    seq_means = jnp.mean(x, axis=1)                      # (M, ...)
    w = jnp.mean(jnp.var(x, axis=1, ddof=1), axis=0)     # (...,)
    b = N * jnp.var(seq_means, axis=0, ddof=1)           # (...,)
    var_plus = (N - 1) / N * w + b / N
    return w, b, var_plus


def split_rhat(draws):
    """Classic split R-hat: sqrt(var_plus / W). draws: (C, D, ...)."""
    x = _split_chains(jnp.asarray(draws))
    w, _, var_plus = _within_between(x)
    return jnp.sqrt(var_plus / jnp.where(w > 0, w, 1.0))


def _rank_normalize(x):
    """Fractional-rank -> standard-normal transform over pooled draws.

    x: (C, D, ...); ranks pooled over (C*D) per trailing index.
    """
    shape = x.shape
    flat = x.reshape((shape[0] * shape[1],) + shape[2:])
    n = flat.shape[0]
    order = jnp.argsort(flat, axis=0)
    ranks = jnp.argsort(order, axis=0).astype(flat.dtype)
    z = ndtri((ranks + 1.0 - 0.375) / (n + 0.25))
    return z.reshape(shape)


def rhat(draws, rank_normalized: bool = True):
    """R-hat; rank-normalized+folded variant (max of bulk/tail) by default."""
    x = jnp.asarray(draws)
    if not rank_normalized:
        return split_rhat(x)
    z = _rank_normalize(x)
    med = jnp.median(x.reshape((-1,) + x.shape[2:]), axis=0)
    zf = _rank_normalize(jnp.abs(x - med))
    return jnp.maximum(split_rhat(z), split_rhat(zf))


def _autocov_fft(x):
    """Per-chain biased autocovariances via FFT. x: (M, N, ...) -> same."""
    N = x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    # next power of two >= 2N for linear (non-circular) autocorrelation
    size = 1
    while size < 2 * N:
        size *= 2
    f = jnp.fft.rfft(xc, n=size, axis=1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=1)[:, :N]
    return jnp.real(acov) / N


def ess(draws, split: bool = True):
    """Bulk-style effective sample size (un-normalized draws).

    Vehtari et al. combined autocorrelation + Geyer initial-monotone
    truncation, computed with cumprod/cummin masking (jit-safe).
    draws: (C, D, ...) -> ESS per trailing index.
    """
    x = jnp.asarray(draws)
    if split:
        x = _split_chains(x)
    M, N = x.shape[0], x.shape[1]
    acov = _autocov_fft(x)                                # (M, N, ...)
    mean_acov = jnp.mean(acov, axis=0)                    # (N, ...)
    w = jnp.mean(acov[:, 0] * N / (N - 1.0), axis=0)      # (...,)
    seq_means = jnp.mean(x, axis=1)
    b = N * jnp.var(seq_means, axis=0, ddof=1)
    var_plus = (N - 1.0) / N * w + b / N
    var_plus = jnp.where(var_plus > 0, var_plus, 1.0)

    rho = 1.0 - (w - mean_acov) / var_plus                # (N, ...)
    # Geyer pairs P_k = rho_{2k} + rho_{2k+1}; K pairs starting at t=0.
    K = N // 2
    pairs = rho[: 2 * K].reshape((K, 2) + rho.shape[1:]).sum(axis=1)
    positive = jnp.cumprod(pairs > 0.0, axis=0).astype(pairs.dtype)
    pairs = pairs * positive
    # initial monotone sequence: running minimum, floored at 0
    mono = jnp.maximum(jax.lax.cummin(pairs, axis=0), 0.0)
    # keep P_0 even if negative-ish numerically: tau >= 1/(M*N) guard below
    tau = -1.0 + 2.0 * jnp.sum(mono, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(M * N, x.dtype)))
    return jnp.minimum(M * N / tau, jnp.asarray(M * N, x.dtype))


def ess_bulk(draws):
    """Rank-normalized split-chain ESS (the headline ESS)."""
    return ess(_rank_normalize(jnp.asarray(draws)))


def ess_tail(draws, prob: float = 0.05):
    """min ESS of the two tail-quantile indicator chains."""
    x = jnp.asarray(draws)
    pooled = x.reshape((-1,) + x.shape[2:])
    qlo = jnp.quantile(pooled, prob, axis=0)
    qhi = jnp.quantile(pooled, 1.0 - prob, axis=0)
    e_lo = ess(_rank_normalize((x <= qlo).astype(x.dtype)))
    e_hi = ess(_rank_normalize((x <= qhi).astype(x.dtype)))
    return jnp.minimum(e_lo, e_hi)


def mcse_mean(draws):
    """Monte-Carlo standard error of the posterior mean."""
    x = jnp.asarray(draws)
    sd = jnp.std(x.reshape((-1,) + x.shape[2:]), axis=0, ddof=1)
    return sd / jnp.sqrt(ess(x))


def diagnose(draws_dict: dict) -> dict:
    """Full diagnostic table for a dict of (C, D, ...) draw arrays.

    Returns {name: {rhat, ess_bulk, ess_tail, mcse_mean, mean, sd}} with
    per-parameter arrays (trailing dims of each block).
    """
    out = {}
    for name, x in draws_dict.items():
        x = jnp.asarray(x)
        pooled = x.reshape((-1,) + x.shape[2:])
        out[name] = {
            "rhat": rhat(x),
            "ess_bulk": ess_bulk(x),
            "ess_tail": ess_tail(x),
            "mcse_mean": mcse_mean(x),
            "mean": jnp.mean(pooled, axis=0),
            "sd": jnp.std(pooled, axis=0, ddof=1),
        }
    return out
