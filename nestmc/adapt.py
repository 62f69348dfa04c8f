"""Warmup adaptation (Robbins-Monro scale tuning + diagonal preconditioning).

All adaptation state lives inside the scan carry (per chain, per block, per
unit), so warmup runs entirely on device. Adaptation freezes when sampling
begins — the simplest ergodicity-safe choice (diminishing adaptation is
unnecessary when warmup draws are discarded).

Formulas (SURVEY.md appendix A):
  log s_{t+1} = log s_t + c * (t + t0)^(-kappa) * (alpha_t - alpha*)
  with kappa = 0.6, t0 = 10, c = 1 by default; alpha* = 0.234 / 0.44 (RW by
  dimension) or 0.574 (MALA).
"""

from __future__ import annotations

import jax.numpy as jnp

from nestmc.config import KernelConfig


def rm_step_size(t, cfg: KernelConfig):
    """Robbins-Monro gain at adaptation step t (0-based, traced int)."""
    return cfg.adapt_c * (t + 1.0 + cfg.adapt_t0) ** (-cfg.adapt_kappa)


def adapt_log_scale(log_scale, alpha, t, target, cfg: KernelConfig):
    """One RM update of per-(chain, unit) log proposal scales.

    alpha: (C, U) realized acceptance probabilities this sweep.
    """
    gamma = rm_step_size(t, cfg)
    new = log_scale + gamma * (alpha - target)
    # Keep scales in a sane dynamic range; runaway scales (e.g. a flat
    # conditional early in warmup) would otherwise poison later adaptation.
    return jnp.clip(new, -12.0, 8.0)


def init_precond(value, cfg: KernelConfig, unit_dim: int = 1):
    """Adaptation-moment state: None | diagonal EMA | full Haario EMA.

    'full' keeps per-(chain, unit) EMA mean and (d, d) covariance (Haario,
    Saksman & Tamminen 2001 adaptive Metropolis, EMA variant); falls back to
    'diag' for scalar-per-unit blocks where a matrix is pointless.
    """
    if cfg.precond == "full" and unit_dim > 1:
        d = value.shape[-1]
        eye = jnp.broadcast_to(
            jnp.eye(d, dtype=value.dtype), value.shape + (d,)
        )
        return {
            # copies: carry leaves must not alias under buffer donation
            "mean": jnp.array(value),
            "cov": jnp.array(eye),
            "count": jnp.zeros(value.shape[:1], value.dtype),
        }
    if cfg.precond in ("diag", "full"):
        return {
            "mean": jnp.array(value),
            "var": jnp.ones_like(value),
            "count": jnp.zeros(value.shape[:1], value.dtype),
        }
    return None


def update_precond(pc, value, cfg: KernelConfig):
    """EMA update of posterior moment estimates (diag var or full cov)."""
    if pc is None:
        return None
    g = cfg.precond_decay
    mean = pc["mean"] + g * (value - pc["mean"])
    if "cov" in pc:
        d_new = value - mean
        d_old = value - pc["mean"]
        outer = d_new[..., :, None] * d_old[..., None, :]
        cov = pc["cov"] + g * (outer - pc["cov"])
        return {"mean": mean, "cov": cov, "count": pc["count"] + 1.0}
    var = pc["var"] + g * ((value - mean) * (value - pc["mean"]) - pc["var"])
    return {"mean": mean, "var": var, "count": pc["count"] + 1.0}


def _ready_gate(pc, like, warm_steps):
    ready = (pc["count"] >= warm_steps).astype(like.dtype)
    return ready.reshape(ready.shape + (1,) * (like.ndim - 1))


def precond_std(pc, cfg: KernelConfig, warm_steps: int = 50):
    """Proposal shape multiplier: None | per-coordinate std (diag) |
    lower-Cholesky of the EMA covariance (full). Identity until the EMA has
    seen enough sweeps to be meaningful.

    The RW/MALA kernels apply a diag multiplier elementwise; a full factor
    is applied as eps -> L @ eps over the trailing dim (kernels detect the
    extra matrix dimension).
    """
    if pc is None:
        return None
    if "cov" in pc:
        d = pc["cov"].shape[-1]
        eye = jnp.eye(d, dtype=pc["cov"].dtype)
        chol = jnp.linalg.cholesky(
            pc["cov"] + cfg.precond_reg * eye
        )
        ready = _ready_gate(pc, pc["cov"], warm_steps)
        return ready * chol + (1.0 - ready) * eye
    std = jnp.sqrt(pc["var"] + cfg.precond_reg)
    ready = _ready_gate(pc, std, warm_steps)
    return ready * std + (1.0 - ready)
