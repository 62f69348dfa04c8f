"""Float64 numpy reference implementations of the diagnostics.

Mirrors nestmc/diagnostics.py conventions exactly (same split, same Geyer
masking) but in straightforward numpy with Python control flow — the golden
oracle for tests/test_diagnostics.py. No arviz in the environment; formulas
from Vehtari et al. (2021).
"""

import numpy as np
import scipy.stats


def np_rank_normalize(x):
    """Average-rank (scipy rankdata) -> normal quantile, pooled per param.

    Independent of the jnp implementation: scipy.stats.rankdata handles the
    tie convention, scipy.stats.norm.ppf the normal transform.
    """
    x = np.asarray(x, np.float64)
    shape = x.shape
    n = shape[0] * shape[1]
    flat = x.reshape((n, -1))
    ranks = np.stack(
        [scipy.stats.rankdata(flat[:, j], method="average")
         for j in range(flat.shape[1])], axis=1
    )
    z = scipy.stats.norm.ppf((ranks - 0.375) / (n + 0.25))
    return z.reshape(shape)


def np_ess_tail(x, prob=0.05):
    """Reference tail-ESS: min ESS of the raw 0/1 tail-indicator chains."""
    x = np.asarray(x, np.float64)
    pooled = x.reshape((-1,) + x.shape[2:])
    qlo = np.quantile(pooled, prob, axis=0)
    qhi = np.quantile(pooled, 1.0 - prob, axis=0)
    return np.minimum(np_ess((x <= qlo).astype(np.float64)),
                      np_ess((x <= qhi).astype(np.float64)))


def np_split_chains(x):
    C, D = x.shape[:2]
    half = D // 2
    return x[:, : 2 * half].reshape((2 * C, half) + x.shape[2:])


def np_split_rhat(x):
    x = np_split_chains(np.asarray(x, np.float64))
    N = x.shape[1]
    seq_means = x.mean(axis=1)
    w = np.var(x, axis=1, ddof=1).mean(axis=0)
    b = N * np.var(seq_means, axis=0, ddof=1)
    var_plus = (N - 1) / N * w + b / N
    return np.sqrt(var_plus / np.where(w > 0, w, 1.0))


def np_autocov(x):
    """Per-chain biased autocovariance, direct O(N^2) computation."""
    M, N = x.shape[:2]
    xc = x - x.mean(axis=1, keepdims=True)
    out = np.zeros_like(xc)
    for t in range(N):
        out[:, t] = np.sum(
            xc[:, : N - t] * xc[:, t:], axis=1
        ) / N
    return out


def np_ess(x, split=True):
    """Matches nestmc.diagnostics.ess (raw draws, split chains)."""
    x = np.asarray(x, np.float64)
    if split:
        x = np_split_chains(x)
    M, N = x.shape[:2]
    acov = np_autocov(x)
    mean_acov = acov.mean(axis=0)
    w = (acov[:, 0] * N / (N - 1)).mean(axis=0)
    seq_means = x.mean(axis=1)
    b = N * np.var(seq_means, axis=0, ddof=1)
    var_plus = (N - 1) / N * w + b / N
    if not np.all(var_plus > 0):
        var_plus = np.where(var_plus > 0, var_plus, 1.0)
    rho = 1.0 - (w - mean_acov) / var_plus
    K = N // 2
    pairs = rho[: 2 * K].reshape((K, 2) + rho.shape[1:]).sum(axis=1)
    # initial positive sequence
    mask = np.cumprod(pairs > 0, axis=0).astype(np.float64)
    pairs = pairs * mask
    # monotone non-increasing, floored at 0
    mono = np.maximum(np.minimum.accumulate(pairs, axis=0), 0.0)
    tau = -1.0 + 2.0 * mono.sum(axis=0)
    tau = np.maximum(tau, 1.0 / np.log10(M * N))
    return np.minimum(M * N / tau, M * N)
