"""A/B on config 3 (nested Poisson GLMM, BASELINE.json:9): the fused
single-kernel beta_s steps (ops/pallas/poisson_accept.py) vs the op-by-op
updates, per kernel algorithm — all variants in ONE process so the axon
per-process handshake and first-execution variance cancel out.

    /opt/venv/bin/python -m benchmarks.poisson_fused_ab \
        [--variants rwmh,rwmh-fused,mala,mala-fused,newton,newton-fused] \
        [--chains 512] [--warmup 500] [--draws 1024]

Reports sample sweeps/s, both ESS/s conventions over the collected
scalars, the log_tau_g floor rate, worst R-hat, and acceptance; one JSON
line per variant (append --out to also write an artifact).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--draws", type=int, default=1024)
    ap.add_argument("--variants", default=(
        "rwmh,rwmh-fused,mala,mala-fused,newton,newton-fused"
    ))
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import numpy as np

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models.nested_poisson import (
        make_nested_poisson, synth_poisson3,
    )

    data, _ = synth_poisson3(
        jax.random.key(3000), G=1000, subjects_per_group=4, n=10, p=3,
    )
    model = make_nested_poisson(data, tau_prior="invgamma")
    n_dev = jax.device_count()
    lines = []
    for variant in args.variants.split(","):
        algorithm, _, f = variant.partition("-")
        fused = f == "fused"
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm=algorithm, fused_accept=fused),
            run=RunConfig(
                chains=args.chains, warmup=args.warmup, draws=args.draws,
                seed=0, segment_size=4096,
                collect={"mu": None, "log_tau_g": None, "log_tau_s": None,
                         "beta_g": 8, "beta_s": 8},
                log_every_segment=False,
            ),
        )
        t0 = time.perf_counter()
        post = sample(model, data, cfg)
        wall = time.perf_counter() - t0
        sample_s = post.timings["sample_s"]
        d = post.diagnostics()
        tau_g_ess = np.asarray(d["log_tau_g"]["ess_bulk"])
        line = {
            "variant": variant,
            "sample_sweeps_per_s": round(args.draws / sample_s, 1),
            "ess_per_sec_per_chip": round(
                post.total_ess() / sample_s / n_dev, 1
            ),
            "min_ess_per_sec_per_chip": round(
                post.min_ess() / sample_s / n_dev, 1
            ),
            "min_ess_floor": post.min_ess_argmin(),
            "min_tau_g_ess_per_s": round(
                float(tau_g_ess.min()) / sample_s / n_dev, 1
            ),
            "worst_rhat": round(post.worst_rhat(), 4),
            "accept_beta_s": round(
                float(post.accept_rates["beta_s"].mean()), 4
            ),
            "timings": {k: round(v, 2) for k, v in post.timings.items()},
            "wall_s": round(wall, 1),
        }
        print(json.dumps(line), flush=True)
        lines.append(line)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip() or "nogit"
        path = os.path.join(
            args.out,
            f"poisson-fused-ab_{git}_{time.strftime('%Y%m%d_%H%M%S')}"
            ".jsonl",
        )
        with open(path, "w") as fh:
            for ln in lines:
                fh.write(json.dumps(ln) + "\n")
        print(f"[poisson_fused_ab] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
