"""A/B on config 3 (nested Poisson GLMM): interweaving-repeat schedules
for the min-ESS floor mode log_tau_g.

asis_tau_g touches NO data (O(C S p) elementwise vs the O(C S n)
transcendental obs pass), so extra repeats are cheap — unlike the judged
config where each tau interweaving pass costs an obs-pass likelihood
eval. This measures whether the tau_g floor saturates the same way
(BASELINE.md round 3: tau ESS sublinear in passes because the conjugate
draw re-tethers tau to the spread statistic's own mixing).

    /opt/venv/bin/python -m benchmarks.poisson_ab --repeats 4,8,16
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=512)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--draws", type=int, default=4096)
    ap.add_argument("--repeats", default="4,8,16")
    ap.add_argument(
        "--algorithm", default="rwmh",
        help="beta_s kernel: 'rwmh' (BASELINE.json:9's adaptive-MH pin) or "
             "'mala' (beyond-spec variant; beta_s has a cached fused "
             "logp+grad, so MALA costs no extra obs passes — candidate "
             "lift for the log_tau_g floor, which is capped by beta_s "
             "mixing)",
    )
    args = ap.parse_args()

    import jax
    import numpy as np

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.diagnostics import ess
    from nestmc.engine import sample
    from nestmc.models.nested_poisson import (
        make_nested_poisson, synth_poisson3,
    )

    data, _ = synth_poisson3(
        jax.random.key(3000), G=1000, subjects_per_group=4, n=10, p=3,
    )
    for rep in [int(r) for r in args.repeats.split(",")]:
        model = make_nested_poisson(
            data, tau_prior="invgamma", asis_tau_g_repeats=rep,
        )
        cfg = SamplerConfig(
            kernel=KernelConfig(algorithm=args.algorithm),
            run=RunConfig(
                chains=args.chains, warmup=args.warmup, draws=args.draws,
                seed=0, segment_size=4096,
                collect={"log_tau_g": None, "log_tau_s": None, "mu": None},
                log_every_segment=False,
            ),
        )
        t0 = time.perf_counter()
        post = sample(model, data, cfg)
        wall = time.perf_counter() - t0
        sample_s = post.timings["sample_s"]
        lt = np.asarray(post.draws["log_tau_g"])
        e = [float(ess(lt[..., k])) for k in range(lt.shape[-1])]
        print(json.dumps({
            "algorithm": args.algorithm,
            "asis_tau_g_repeats": rep,
            "tau_g_ess": [round(v, 1) for v in e],
            "min_tau_g_ess_per_s": round(min(e) / sample_s, 1),
            "sample_s": round(sample_s, 2),
            "sweeps_per_sec": round(args.draws / sample_s, 1),
            "accept_asis_tau_g": round(
                float(post.accept_rates["asis_tau_g"].mean()), 4
            ),
            "wall_s": round(wall, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
