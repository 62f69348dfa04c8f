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


def init_precond(value, cfg: KernelConfig):
    """EMA mean/variance state for diagonal preconditioning, or None."""
    if cfg.precond != "diag":
        return None
    return {
        # copy: carry leaves must not alias (buffer donation would see the
        # same buffer twice)
        "mean": jnp.array(value),
        "var": jnp.ones_like(value),
        "count": jnp.zeros(value.shape[:1], value.dtype),  # per chain
    }


def update_precond(pc, value, cfg: KernelConfig):
    """EMA update of per-coordinate posterior variance estimates."""
    if pc is None:
        return None
    g = cfg.precond_decay
    mean = pc["mean"] + g * (value - pc["mean"])
    var = pc["var"] + g * ((value - mean) * (value - pc["mean"]) - pc["var"])
    return {"mean": mean, "var": var, "count": pc["count"] + 1.0}


def precond_std(pc, cfg: KernelConfig, warm_steps: int = 50):
    """Proposal std multiplier sqrt(var + reg); identity until the EMA has
    seen enough sweeps to be meaningful."""
    if pc is None:
        return None
    std = jnp.sqrt(pc["var"] + cfg.precond_reg)
    ready = (pc["count"] >= warm_steps).astype(std.dtype)
    ready = ready.reshape(ready.shape + (1,) * (std.ndim - 1))
    return ready * std + (1.0 - ready)
