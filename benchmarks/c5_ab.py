"""Config-5 (G=100k, BASELINE.json:11) Newton-vs-MALA re-litigation with
the round-3 confounds CLOSED (VERDICT r3 item 1):

- fused single-kernel steps in BOTH arms (the round-3 Newton rejection ran
  op-by-op packed-Cholesky at (C,G,6) — the per-op-latency regime);
- SAME tau prior in both arms (round 3 compared invgamma-Newton against
  halfnormal-MALA — different posteriors);
- the frozen-metric sampling program never materializes Hessian-refresh
  buffers (fused step: the whole update is ONE kernel, so the ~15
  op-by-op (C,G,T) temps that OOM'd the C=512 warmup are gone).

    /opt/venv/bin/python -m benchmarks.c5_ab \
        [--variants mala-halfnormal,mala-invgamma,newton-invgamma] \
        [--chains 512] [--warmup 300] [--draws 512]

All variants run in ONE process (handshake + first-execution variance
cancel). Probe schedule by default; full-schedule artifacts come from
`benchmarks.run --preset mala-100k ...` once a winner is known.
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
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--draws", type=int, default=512)
    ap.add_argument("--groups", type=int, default=100_000)
    ap.add_argument("--variants", default=(
        "mala-halfnormal,mala-invgamma,newton-invgamma"
    ))
    # ≤45 s per device execution on the axon tunnel (CLAUDE.md: ~76 s
    # single calls kill the worker; Newton warmup ~6.6 sweeps/s, rK
    # variants slower still)
    ap.add_argument("--segment-size", type=int, default=200)
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import numpy as np

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models import make_hier_logistic, synth_logistic

    # the mala-100k preset's exact data (presets.py _mala_100k)
    data, _ = synth_logistic(
        jax.random.key(5000), G=args.groups, n=20, p=3
    )
    n_dev = jax.device_count()
    lines = []
    for variant in args.variants.split(","):
        # "<algorithm>-<prior>[-rK]" — rK sets asis_repeats=K (extra
        # interweave passes per sweep: each costs one likelihood pass and
        # multiplies tau ESS/sweep, the min-ESS floor lever at G=100k)
        parts = variant.split("-")
        algorithm = parts[0]
        prior = parts[1] if len(parts) > 1 else "halfnormal"
        repeats = 1
        if len(parts) > 2 and parts[2].startswith("r"):
            repeats = int(parts[2][1:])
        model = make_hier_logistic(
            data, tau_prior=prior, asis_repeats=repeats
        )
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm=algorithm, fused_accept=True),
            run=RunConfig(
                chains=args.chains, warmup=args.warmup, draws=args.draws,
                seed=0, segment_size=args.segment_size,
                collect={"mu": None, "log_tau": None, "beta": 8},
                log_every_segment=False,
            ),
        )
        t0 = time.perf_counter()
        try:
            post = sample(model, data, cfg)
        except Exception as e:  # OOM etc. — record, keep going
            line = {"variant": variant, "chains": args.chains,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(json.dumps(line), flush=True)
            lines.append(line)
            continue
        wall = time.perf_counter() - t0
        sample_s = post.timings["sample_s"]
        warm_s = post.timings["warmup_s"]
        d = post.diagnostics()
        tau_ess = np.asarray(d["log_tau"]["ess_bulk"])
        line = {
            "variant": variant,
            "chains": args.chains,
            "sample_sweeps_per_s": round(args.draws / sample_s, 2),
            "warmup_sweeps_per_s": round(args.warmup / max(warm_s, 1e-9), 2),
            "ess_per_sec_per_chip": round(
                post.total_ess() / sample_s / n_dev, 1
            ),
            "min_ess_per_sec_per_chip": round(
                post.min_ess() / sample_s / n_dev, 1
            ),
            "min_ess_floor": post.min_ess_argmin(),
            "min_tau_ess_per_s": round(
                float(tau_ess.min()) / sample_s / n_dev, 1
            ),
            "worst_rhat_collected": round(post.worst_rhat(), 4),
            "accept_beta": round(
                float(post.accept_rates["beta"].mean()), 4
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
            f"c5-ab_{git}_{time.strftime('%Y%m%d_%H%M%S')}.jsonl",
        )
        with open(path, "w") as fh:
            for ln in lines:
                fh.write(json.dumps(ln) + "\n")
        print(f"[c5_ab] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
