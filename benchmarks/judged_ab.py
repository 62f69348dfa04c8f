"""A/B on the judged config (1k-group hier logistic): fused MALA step
kernel on/off x tau prior (halfnormal MH+ASIS vs invgamma conjugate), plus
the Newton-MH path ('newton-invgamma', or 'newtonN-...' for N ASIS
repeats; N=0 drops the interweave).

    /opt/venv/bin/python -m benchmarks.judged_ab [--chains 256] [--draws 2048]

Reports sweeps/s (VERDICT round-1 item 5: fused >= 1.5x unfused at C=256),
ESS/s/chip (both conventions), worst R-hat, and acceptance rates per
variant; one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--draws", type=int, default=2048)
    ap.add_argument("--variants", default=(
        "unfused-halfnormal,fused-halfnormal,"
        "unfused-invgamma,fused-invgamma"
    ))
    args = ap.parse_args()

    import jax

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models import make_hier_logistic, synth_logistic

    data, _ = synth_logistic(jax.random.key(2000), G=1000, n=50, p=4)
    for variant in args.variants.split(","):
        fused_s, tau_s = variant.split("-")
        # variant grammar: <path>-<tau_prior> with path one of
        # unfused / fused / sweep (all MALA) or newton / newtonN (Newton-MH
        # with N ASIS interweaving repeats, default 1; N=0 drops the move;
        # frozen-Hessian sampling phase per KernelConfig.newton_freeze) or
        # rnewton[N] (refreshing Newton: newton_freeze=False, the Hessian
        # obs pass runs every sampling sweep)
        algorithm = "mala"
        asis_repeats = 1
        newton_freeze = True
        tok = fused_s
        if tok.startswith("rnewton"):
            algorithm = "newton"
            newton_freeze = False
            if tok != "rnewton":
                asis_repeats = int(tok[len("rnewton"):])
        elif tok.startswith("newton"):
            algorithm = "newton"
            if tok != "newton":
                asis_repeats = int(tok[len("newton"):])
        model = make_hier_logistic(
            data, tau_prior=tau_s, asis_repeats=asis_repeats
        )
        cfg = SamplerConfig(
            kernel=KernelConfig(
                algorithm=algorithm,
                newton_freeze=newton_freeze,
                # newton engages its own fused step kernel through the
                # same flag (fused_updates_newton table)
                fused_accept=(fused_s == "fused" or algorithm == "newton"),
            ),
            run=RunConfig(
                chains=args.chains, warmup=args.warmup, draws=args.draws,
                seed=0, segment_size=2048,
                collect={"mu": None, "log_tau": None, "beta": 8},
                log_every_segment=False,
            ),
        )
        t0 = time.perf_counter()
        post = sample(model, data, cfg)
        wall = time.perf_counter() - t0
        sample_s = post.timings["sample_s"]
        hot_s = post.timings["warmup_s"] + sample_s
        print(json.dumps({
            "variant": variant,
            "sweeps_per_sec": round(
                (args.warmup + args.draws) / hot_s, 2
            ),
            "sample_sweeps_per_sec": round(args.draws / sample_s, 2),
            "ess_per_sec_per_chip": round(post.total_ess() / sample_s, 1),
            "min_ess_per_sec_per_chip": round(
                post.min_ess() / sample_s, 1
            ),
            "worst_rhat": round(float(post.worst_rhat()), 5),
            "accept": {
                k: round(float(v.mean()), 4)
                for k, v in post.accept_rates.items()
            },
            "timings": {k: round(v, 3) for k, v in post.timings.items()},
            "wall_s": round(wall, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
