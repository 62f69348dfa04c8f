"""Verification run for the two contested diagnostic conventions
(VERDICT r3 items 4 + 8), in ONE judged-shape (or config-5-shape) run:

1. **min-ESS floor coverage**: the min-ESS convention's floor claim
   ("log_tau[1] is the slowest parameter") was an extrapolation from ~40
   collected scalars out of 4,008. This run collects a SEEDED RANDOM
   sample of beta group units (RunConfig.collect now takes explicit index
   tuples) alongside mu/log_tau and checks whether any sampled beta
   scalar's bulk ESS undercuts the log_tau floor.

2. **R-hat statistic asymmetry**: the streamed full-parameter gate uses
   classic split R-hat while collected-scalar diagnostics use the
   stricter rank-normalized+folded variant. On the same collected draws
   this computes BOTH and reports the worst-case per-scalar delta.

    /opt/venv/bin/python -m benchmarks.verify_floor [--preset judged]
        [--sample-groups 64] [--chains N] [--out benchmarks/results]

Defaults run the exact judged configuration (preset 'judged' ==
bench.py); `--preset mala-100k` verifies config 5's floor the same way.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="judged")
    ap.add_argument("--sample-groups", type=int, default=64,
                    help="seeded random beta group units to collect "
                         "(64 groups x p coords = the 'few hundred random "
                         "betas' check at judged p=4)")
    ap.add_argument("--sample-seed", type=int, default=2026)
    ap.add_argument("--chains", type=int)
    ap.add_argument("--warmup", type=int)
    ap.add_argument("--draws", type=int)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--out", default="benchmarks/results")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nestmc.diagnostics import rhat, split_rhat
    from nestmc.engine import sample
    from nestmc.presets import get_preset, override_run

    model, data, cfg = get_preset(args.preset, seed=0, scale=args.scale)
    overrides = {
        k: v for k, v in (
            ("chains", args.chains), ("warmup", args.warmup),
            ("draws", args.draws),
        ) if v is not None
    }
    if overrides:
        cfg = override_run(cfg, **overrides)

    # which block holds the per-group params in this preset's model
    beta_block = "beta" if "beta" in cfg.run.collect else "beta_s"
    G = {
        b.name: b.units for b in model.blocks
    }.get(beta_block)
    rng = np.random.default_rng(args.sample_seed)
    k = min(args.sample_groups, G)
    idx = tuple(int(i) for i in rng.choice(G, size=k, replace=False))
    collect = dict(cfg.run.collect)
    collect[beta_block] = idx
    cfg = override_run(cfg, collect=collect)

    t0 = time.perf_counter()
    post = sample(model, data, cfg)
    wall = time.perf_counter() - t0

    diag = post.diagnostics()
    sample_s = post.timings["sample_s"]
    n_dev = jax.device_count()

    # ---- 1. floor coverage over the random beta sample ----
    tau_block = "log_tau" if "log_tau" in diag else "log_tau_g"
    tau_ess = np.asarray(diag[tau_block]["ess_bulk"])
    beta_ess = np.asarray(diag[beta_block]["ess_bulk"])
    floor = post.min_ess_argmin()
    tau_floor = float(tau_ess.min())
    beta_min = float(beta_ess.min())
    beta_min_idx = np.unravel_index(int(beta_ess.argmin()), beta_ess.shape)
    # map the sampled row back to the true group id for attribution
    beta_min_group = idx[int(beta_min_idx[0])]
    floor_holds = beta_min > tau_floor

    # ---- 2. classic vs rank-normalized+folded R-hat on the same draws ----
    # Chunk over scalars: rank normalization sorts the pooled (C*D) draws
    # per scalar, and take_along_axis on the full (1024, 4096, 64, 4)
    # judged beta array OOMs the chip — 16 scalars at a time is ~260 MB
    # peak and produces identical per-scalar statistics.
    stats = {}
    worst_delta = 0.0
    for name, x in post.draws.items():
        arr = np.asarray(x)
        C, D = arr.shape[:2]
        flat = arr.reshape(C, D, -1)
        classic_parts, ranknorm_parts = [], []
        for s in range(0, flat.shape[-1], 16):
            chunk = jnp.asarray(flat[:, :, s:s + 16])
            classic_parts.append(np.asarray(split_rhat(chunk)))
            ranknorm_parts.append(np.asarray(rhat(chunk)))
        classic = np.concatenate(classic_parts)
        ranknorm = np.concatenate(ranknorm_parts)  # rank-norm + folded
        stats[name] = {
            "classic_max": float(classic.max()),
            "ranknorm_max": float(ranknorm.max()),
            "max_abs_delta": float(np.abs(ranknorm - classic).max()),
        }
        worst_delta = max(worst_delta, stats[name]["max_abs_delta"])

    result = {
        "preset": args.preset,
        "chains": cfg.run.chains,
        "warmup": cfg.run.warmup,
        "draws": cfg.run.draws,
        "sampled_groups": k,
        "sampled_beta_scalars": int(beta_ess.size),
        "sample_seed": args.sample_seed,
        "tau_floor_block": tau_block,
        "tau_floor_ess": tau_floor,
        "tau_floor_index": [int(i) for i in np.unravel_index(
            int(tau_ess.argmin()), tau_ess.shape)],
        # global argmin over EVERYTHING collected (incl. the beta sample)
        "global_floor": floor,
        "beta_sample_min_ess": beta_min,
        "beta_sample_min_group": int(beta_min_group),
        "beta_sample_min_coord": [int(i) for i in beta_min_idx[1:]],
        "floor_holds": bool(floor_holds),
        "beta_over_tau_ratio": beta_min / max(tau_floor, 1e-9),
        "min_ess_per_sec_per_chip": min(beta_min, tau_floor)
        / sample_s / n_dev,
        "rhat_statistics": stats,
        "rhat_worst_abs_delta": worst_delta,
        "worst_rhat_all_params": post.worst_rhat(),
        "timings": {k2: round(v, 3) for k2, v in post.timings.items()},
        "wall_s": round(wall, 1),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip() or "nogit"
        ts = time.strftime("%Y%m%d_%H%M%S")
        path = os.path.join(
            args.out, f"verify-floor-{args.preset}_{git}_{ts}.json"
        )
        with open(path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"[verify_floor] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
