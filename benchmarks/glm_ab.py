"""A/B: the generic GLM surface's fused delegation vs its jnp path
(VERDICT r4 item 8 "Done" criterion: a measured statement of what the
jnp path costs vs the fused stack at a representative shape).

Runs make_hier_glm twice at a judged-like shape (G=1000, n=50, p=4,
trials=10 for binomial) with identical schedules:

  arm 'fused': the round-5 kernel routing — binomial/bernoulli delegate
      to hier_logistic's single-kernel Pallas steps via exact
      trials-reweighting (models/hier_glm.py _make_logistic_delegate);
      poisson wires the nested_poisson fused steps directly
      (bg_s = broadcast(mu))
  arm 'plain': fused=False — the generic op-by-op jnp path every
      non-kernel family (gaussian/negbin) runs

    /opt/venv/bin/python -m benchmarks.glm_ab [--chains 1024]
        [--family binomial|poisson] [--algorithm newton]
        [--out benchmarks/results]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--draws", type=int, default=2048)
    ap.add_argument(
        "--algorithm", default="newton", choices=["rwmh", "mala", "newton"]
    )
    ap.add_argument(
        "--family", default="binomial", choices=["binomial", "poisson"]
    )
    ap.add_argument("--out", default="benchmarks/results")
    args = ap.parse_args()

    import jax

    from nestmc.config import KernelConfig, RunConfig, SamplerConfig
    from nestmc.engine import sample
    from nestmc.models.hier_glm import make_hier_glm, synth_glm

    data, _ = synth_glm(
        jax.random.key(77), family=args.family, G=1000, n=50, p=4,
        trials=10,
    )
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm=args.algorithm, fused_accept=True),
        run=RunConfig(
            chains=args.chains, warmup=args.warmup, draws=args.draws,
            seed=0, segment_size=1024,
            collect={"mu": None, "log_tau": None, "beta": 8},
            full_rhat=True, log_every_segment=False,
        ),
    )
    n_dev = jax.device_count()
    results = {}
    for arm, fused in (("fused", True), ("plain", False)):
        model = make_hier_glm(
            data, family=args.family, tau_prior="invgamma", fused=fused
        )
        t0 = time.perf_counter()
        post = sample(model, data, cfg)
        wall = time.perf_counter() - t0
        s = post.timings["sample_s"]
        floor_all = post.min_ess_all_params()
        results[arm] = {
            "loglik_impl": model.loglik_impls.get("selected", "jnp"),
            "fused_tables": sorted(model.fused_updates),
            "total_ess": post.total_ess(),
            "min_ess": post.min_ess(),
            "worst_rhat_all_params": post.worst_rhat(),
            "ess_per_sec_per_chip": post.total_ess() / s / n_dev,
            "min_ess_per_sec_per_chip": post.min_ess() / s / n_dev,
            "min_ess_all_params": floor_all,
            "sweeps_per_sec": (args.warmup + args.draws) / (
                post.timings["warmup_s"] + s
            ),
            "timings": {k: round(v, 3) for k, v in post.timings.items()},
            "wall_s": round(wall, 1),
        }
        print(f"[glm-ab] {arm}: {json.dumps(results[arm], default=str)}",
              flush=True)
    f, p = results["fused"], results["plain"]
    results["speedup"] = {
        "sum_ess_rate": f["ess_per_sec_per_chip"] / max(
            p["ess_per_sec_per_chip"], 1e-9
        ),
        "sweeps_per_sec": f["sweeps_per_sec"] / max(
            p["sweeps_per_sec"], 1e-9
        ),
    }
    out = {
        "shape": {"family": args.family, "G": 1000, "n": 50, "p": 4,
                  "trials": 10, "chains": args.chains,
                  "warmup": args.warmup, "draws": args.draws,
                  "algorithm": args.algorithm},
        **results,
    }
    print(json.dumps(out, indent=2, default=str))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip() or "nogit"
        path = os.path.join(
            args.out,
            f"glm-ab-{args.family}_{git}_"
            f"{time.strftime('%Y%m%d_%H%M%S')}.json",
        )
        with open(path, "w") as fh:
            json.dump(out, fh, indent=2, default=str)
        print(f"[glm-ab] wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
