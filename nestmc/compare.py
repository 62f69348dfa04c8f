"""Model comparison: WAIC and PSIS-LOO from group-level log-likelihood draws.

For nested data the natural exchangeable prediction unit is the GROUP
(leave-one-group-out): every model here already computes the per-group
likelihood (C, G) as its hot kernel, and `make_hier_logistic` exposes it as
the derived quantity ``group_loglik`` — collect it per retained draw

    RunConfig(collect={"group_loglik": None, ...})

and feed ``post.draws["group_loglik"]`` (C, D, G) to :func:`waic` /
:func:`psis_loo`. Both run on host (numpy): they are one-shot reductions
over already-collected draws, not hot-loop work.

References (formulas, not code): Watanabe (2010) for WAIC; Vehtari, Gelman
& Gabry (2017) for PSIS-LOO; Zhang & Stephens (2009) for the generalized
Pareto fit used to smooth the importance-weight tails.
"""

from __future__ import annotations

import numpy as np


def _pool(loglik_draws) -> np.ndarray:
    """(C, D, G) or (S, G) draws -> (S, G) float64 (log-scale stability)."""
    ll = np.asarray(loglik_draws, dtype=np.float64)
    if ll.ndim == 3:
        ll = ll.reshape(-1, ll.shape[-1])
    if ll.ndim != 2:
        raise ValueError(
            f"loglik draws must be (C, D, G) or (S, G); got {ll.shape}"
        )
    return ll


def _logmeanexp(ll: np.ndarray, axis=0) -> np.ndarray:
    m = np.max(ll, axis=axis, keepdims=True)
    out = np.log(np.mean(np.exp(ll - m), axis=axis)) + np.squeeze(m, axis)
    return out


def waic(loglik_draws) -> dict:
    """Widely-applicable information criterion over prediction units.

    Returns {elpd_waic, p_waic, waic, elpd_i, p_i, se} where elpd_i / p_i
    are per-unit arrays, waic = -2 elpd_waic, and se is the standard error
    of elpd_waic (sqrt(G * var(elpd_i))).
    """
    ll = _pool(loglik_draws)
    lpd_i = _logmeanexp(ll, axis=0)          # log pointwise pred density
    p_i = np.var(ll, axis=0, ddof=1)         # effective params (var form)
    elpd_i = lpd_i - p_i
    g = ll.shape[1]
    return {
        "elpd_waic": float(np.sum(elpd_i)),
        "p_waic": float(np.sum(p_i)),
        "waic": float(-2.0 * np.sum(elpd_i)),
        "elpd_i": elpd_i,
        "p_i": p_i,
        "se": float(np.sqrt(g * np.var(elpd_i, ddof=1))) if g > 1 else 0.0,
    }


def gpdfit(x: np.ndarray) -> tuple[float, float]:
    """Fit a generalized Pareto (k, sigma) to exceedances x > 0.

    Zhang & Stephens (2009) quadrature over the profile likelihood of
    theta = -k/sigma: fast, no optimizer, the standard estimator for PSIS
    tail smoothing. Returns (k, sigma); k is the shape (xi) with k > 0 a
    heavy tail. Includes the weakly-informative prior regularization on k
    used for PSIS (shrink toward 0.5 by 10 pseudo-observations).
    """
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 5:
        return np.inf, np.nan
    m = 30 + int(np.sqrt(n))
    prior_b = 3.0
    q1 = x[int(n / 4 + 0.5) - 1]  # first-quartile order statistic
    theta = 1.0 / x[-1] + (
        1.0 - np.sqrt(m / (np.arange(1, m + 1) - 0.5))
    ) / (prior_b * q1)
    # profile log-likelihood of each theta candidate; k in the xi
    # convention (k > 0 = heavy tail), so k = +mean(log1p(-theta x)) and
    # sigma = -k/theta (the Zhang-Stephens paper's k is -xi)
    k_cand = np.mean(np.log1p(-theta[:, None] * x[None, :]), axis=1)
    l_prof = n * (np.log(-theta / k_cand) - k_cand - 1.0)
    l_prof -= np.max(l_prof)
    w = np.exp(l_prof) / np.sum(np.exp(l_prof))
    theta_hat = np.sum(theta * w)
    k = np.mean(np.log1p(-theta_hat * x))
    sigma = -k / theta_hat
    # regularize k for stability at small tail sizes (Vehtari et al. 2017)
    k = (n * k + 10.0 * 0.5) / (n + 10.0)
    return float(k), float(sigma)


def _psis_smooth_tail(logw: np.ndarray) -> tuple[np.ndarray, float]:
    """Pareto-smooth one unit's log importance weights; returns
    (smoothed log-weights, k-hat)."""
    s = logw.size
    tail_len = int(min(0.2 * s, 3.0 * np.sqrt(s)))
    if tail_len < 5:
        return logw, np.inf
    order = np.argsort(logw)
    tail_ids = order[-tail_len:]
    cutoff = logw[order[-tail_len - 1]]
    exc = np.exp(logw[tail_ids]) - np.exp(cutoff)
    keep = exc > 0
    if keep.sum() < 5:
        return logw, np.inf
    k, sigma = gpdfit(exc[keep])
    if not np.isfinite(k):
        return logw, k
    # replace tail weights by expected GPD order statistics above cutoff
    p = (np.arange(1, tail_len + 1) - 0.5) / tail_len
    if abs(k) < 1e-12:
        q = -np.log1p(-p) * sigma
    else:
        # GPD quantile sigma*((1-p)^{-k} - 1)/k, valid for either sign of k
        q = sigma * np.expm1(-k * np.log1p(-p)) / k
    smoothed = np.log(q + np.exp(cutoff))
    out = logw.copy()
    # assign in ascending order so ranks are preserved
    out[tail_ids] = np.minimum(smoothed, np.max(logw))
    return out, k


def psis_loo(loglik_draws) -> dict:
    """Pareto-smoothed importance-sampling leave-one-GROUP-out.

    Returns {elpd_loo, p_loo, looic, elpd_i, k_hat, se}; k_hat > 0.7 for a
    unit flags an unreliable importance approximation for that group
    (refit without it, or trust WAIC even less there).
    """
    ll = _pool(loglik_draws)
    s, g = ll.shape
    lpd_i = _logmeanexp(ll, axis=0)
    elpd_i = np.empty(g)
    k_hat = np.empty(g)
    for j in range(g):
        logw = -ll[:, j]                       # raw log ratios 1/p
        logw = logw - np.max(logw)
        logw, k = _psis_smooth_tail(logw)
        k_hat[j] = k
        lse = _logmeanexp((logw + ll[:, j])[:, None], axis=0)[0]
        norm = _logmeanexp(logw[:, None], axis=0)[0]
        elpd_i[j] = lse - norm
    p_loo = lpd_i - elpd_i
    return {
        "elpd_loo": float(np.sum(elpd_i)),
        "p_loo": float(np.sum(p_loo)),
        "looic": float(-2.0 * np.sum(elpd_i)),
        "elpd_i": elpd_i,
        "k_hat": k_hat,
        "se": float(np.sqrt(g * np.var(elpd_i, ddof=1))) if g > 1 else 0.0,
    }


def compare(results: dict) -> list[dict]:
    """Rank models by elpd: {name: waic()/psis_loo() result dict} ->
    rows sorted best-first with pairwise elpd_diff and diff_se vs the
    winner (computed from the PAIRED per-unit differences)."""
    def _elpd(r):
        return r["elpd_loo"] if "elpd_loo" in r else r["elpd_waic"]

    ranked = sorted(results.items(), key=lambda kv: -_elpd(kv[1]))
    best = ranked[0][1]["elpd_i"]
    rows = []
    for name, r in ranked:
        d = best - r["elpd_i"]
        g = d.size
        rows.append({
            "model": name,
            "elpd": float(_elpd(r)),
            "elpd_diff": float(np.sum(d)),
            "diff_se": float(np.sqrt(g * np.var(d, ddof=1)))
            if g > 1 else 0.0,
        })
    return rows
