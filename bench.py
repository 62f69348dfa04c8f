"""Driver benchmark: the judged metric on the judged model.

Runs the 1k-group hierarchical logistic model (BASELINE.json:2) on whatever
hardware is available and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: effective samples/sec/chip = sum of bulk-ESS over all collected
scalar parameters / sampling wall-seconds / chips. Conventions (fixed once,
SURVEY.md section 7.3 item 6): compile time excluded (reported separately in
stderr), warmup time excluded from the denominator, ESS measured on retained
draws only, collected params = mu (4) + log_tau (4) + first 8 groups' beta
(32) = 40 scalars.

Baseline: the reference publishes no numbers (BASELINE.json:13 "published":
{}); the anchor is the driver's north-star target of >= 1M aggregate
effective samples/sec on v5e-8, i.e. 125k ESS/s/chip. vs_baseline is
value / 125_000 — >= 1.0 means the north-star per-chip rate is met.
"""

import json
import os
import sys
import time


def main() -> int:
    os.environ.setdefault("NESTMC_BENCH", "1")
    import jax

    import nestmc  # noqa: F401  (enables partitionable RNG)
    from nestmc.config import (
        KernelConfig,
        RunConfig,
        SamplerConfig,
        ShardingConfig,
    )
    from nestmc.engine import sample
    from nestmc.models import make_hier_logistic, synth_logistic

    n_dev = jax.device_count()
    backend = jax.default_backend()

    # The judged model: 1k groups x 50 obs, p=4.
    data, _ = synth_logistic(jax.random.key(2000), G=1000, n=50, p=4)
    # 1024 chains/chip: argmax of the frozen-Newton chain scan on v5e
    # (2026-08-18, this file at c898ffe, sum / min-ESS per s/chip):
    # C=512 7.32M/75.6k, C=1024 7.64M/79.0k, C=1536 4.93M/50.9k (off the
    # power-of-2 tiling), C=2048 7.25M/74.8k, C=3072 7.08M/73.0k. The
    # surface is flat within tunnel variance for power-of-2 C >= 512;
    # 1024 also minimizes wall time (61.8s vs 108.3s at 3072). The old
    # MALA-path argmax was 3072.
    chains_per_chip = int(
        os.environ.get("NESTMC_BENCH_CHAINS_PER_CHIP", 1024)
    )
    warmup = int(os.environ.get("NESTMC_BENCH_WARMUP", 1500))
    draws = int(os.environ.get("NESTMC_BENCH_DRAWS", 4096))
    # FROZEN-METRIC NEWTON (round 3): Laplace-proposal group updates with
    # the likelihood Hessian refreshed during warmup and frozen for the
    # sampling phase (KernelConfig.newton_freeze) — the sampling obs pass
    # costs the same as MALA's while beta mixes near-IID (acceptance
    # ~0.86) and the joint (mu, tau) interweave runs parameter-free off
    # the same metric. Measured A/B at C=256 (benchmarks/judged_ab.py,
    # 2026-08-18): mala 5.34M sum / 54.0k min ESS/s/chip -> newton-frozen
    # 9.84M / 100.6k at sample sweep rates within 6% (1530 vs 1632/s);
    # the round-2 refresh-Newton was 2x slower per sweep and lost on both
    # conventions. MALA (the former default) remains one env var away.
    algorithm = os.environ.get("NESTMC_BENCH_ALGORITHM", "newton")
    # Round-2 A/B on this config at C=256 (benchmarks/judged_ab.py):
    # conjugate invgamma tau beats halfnormal+MH by 33% min-ESS/s (the tau
    # block was the ESS floor) at equal sweep cost; the fused single-kernel
    # MALA step adds ~2.5% sweeps/s. Both on by default, env-overridable.
    tau_prior = os.environ.get("NESTMC_BENCH_TAU_PRIOR", "invgamma")
    asis_repeats = int(os.environ.get("NESTMC_BENCH_ASIS_REPEATS", 1))
    fused = os.environ.get("NESTMC_BENCH_FUSED", "1") == "1"
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm=algorithm, fused_accept=fused),
        run=RunConfig(
            chains=chains_per_chip * n_dev,
            warmup=warmup,
            draws=draws,
            seed=0,
            segment_size=2048,
            collect={"mu": None, "log_tau": None, "beta": 8},
            # stream split R-hat over EVERY unit of every block (all 1000
            # groups' betas, not just the 8 collected) so the <1.01 gate
            # below covers all parameters (SURVEY.md section 3.5)
            full_rhat=True,
            log_every_segment=False,
        ),
        sharding=ShardingConfig(chain_shards=n_dev),
    )
    model = make_hier_logistic(
        data, tau_prior=tau_prior, asis_repeats=asis_repeats
    )

    t0 = time.perf_counter()
    post = sample(model, data, cfg)
    wall = time.perf_counter() - t0

    sample_s = post.timings["sample_s"]
    total_ess = post.total_ess()
    min_ess = post.min_ess()
    floor = post.min_ess_argmin()
    # worst split R-hat over ALL parameters (streamed full_rhat covers every
    # beta unit; the diagnostics pass covers the collected scalars)
    worst_rhat = post.worst_rhat()
    value = total_ess / sample_s / n_dev
    min_ess_rate = min_ess / sample_s / n_dev

    print(
        f"[bench] backend={backend} devices={n_dev} "
        f"chains={cfg.run.chains} wall={wall:.1f}s "
        f"sample={sample_s:.2f}s warmup={post.timings['warmup_s']:.2f}s "
        f"compile={post.timings.get('warmup_compile_s', 0) + post.timings.get('sample_compile_s', 0):.1f}s "
        f"total_ess={total_ess:.0f} min_ess={min_ess:.0f} "
        f"worst_rhat={worst_rhat:.4f} "
        f"sweeps/s={(warmup + draws) / (post.timings['warmup_s'] + sample_s):.0f}",
        file=sys.stderr,
    )
    if floor is not None:
        # attribute the min-ESS floor so it is an actionable target, not
        # just a rate (VERDICT r2 item 2)
        print(
            f"[bench] min-ESS floor: block={floor['block']} "
            f"index={floor['index']} ess={floor['ess']:.0f}",
            file=sys.stderr,
        )
    # measured min ESS over ALL parameters (cross-chain mean-functional
    # estimator on the streamed full-R-hat accumulators + one-sided 95%
    # lower confidence bound) — the floor is no longer an extrapolation
    # from collected scalars (VERDICT r4 item 5)
    floor_all = post.min_ess_all_params()
    if floor_all is not None:
        print(
            f"[bench] all-param ESS floor (cross-chain): "
            f"block={floor_all['block']} index={floor_all['index']} "
            f"ess={floor_all['ess']:.0f} ess_lb95={floor_all['ess_lb']:.0f}",
            file=sys.stderr,
        )

    # Convergence gate (SURVEY.md section 3.5 / BASELINE.json:5): the
    # throughput number is meaningless if the chains have not converged.
    assert worst_rhat < 1.01, (
        f"worst split R-hat {worst_rhat:.4f} >= 1.01 over all parameters — "
        "benchmark rejected"
    )

    print(json.dumps({
        "metric": "effective_samples_per_sec_per_chip "
                  "(1k-group hierarchical logistic; worst split R-hat over "
                  f"ALL {4 + 4 + 1000 * 4} params {worst_rhat:.4f}; "
                  "sum-of-bulk-ESS over 40 collected scalars convention; "
                  f"min-ESS convention: {min_ess_rate:.0f}/s/chip)",
        "value": round(value, 1),
        "unit": "ESS/s/chip",
        "vs_baseline": round(value / 125_000.0, 4),
        "min_ess_per_sec_per_chip": round(min_ess_rate, 1),
        "worst_rhat_all_params": round(worst_rhat, 5),
        "min_ess_floor": (
            f"{floor['block']}{list(floor['index'])}" if floor else None
        ),
        # measured over ALL 4008 params via the streamed cross-chain
        # estimator (mean-functional; see nestmc/diagnostics.py): the
        # min-ESS convention's floor with a 95% lower confidence bound
        "min_ess_all_params": (
            round(floor_all["ess"], 1) if floor_all else None
        ),
        "min_ess_all_params_lb95_per_sec_per_chip": (
            round(floor_all["ess_lb"] / sample_s / n_dev, 1)
            if floor_all else None
        ),
        "min_ess_all_floor": (
            f"{floor_all['block']}{list(floor_all['index'])}"
            if floor_all else None
        ),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
