"""Named presets for the five BASELINE.json:7-11 benchmark configs.

Each preset builds (model, data, SamplerConfig) from a seed. Sizes follow the
driver spec; `scale` lets the CLI/benchmarks shrink a preset for smoke tests.
"""

from __future__ import annotations

import dataclasses
from dataclasses import replace

import jax

from nestmc.config import (
    KernelConfig,
    RunConfig,
    SamplerConfig,
    ShardingConfig,
)
from nestmc.models import (
    make_eight_schools,
    make_hier_logistic,
    make_nested_poisson,
    synth_logistic,
    synth_poisson3,
)


def _eight_schools(seed: int, scale: float):
    """Config 1 (BASELINE.json:7): 8-schools, 4 chains x 10k draws, RW-MH."""
    model, data = make_eight_schools()
    # one scan segment: at 4 chains the model sweeps >10k/s; per-segment
    # host syncs would dominate wall time otherwise (see config 2 note)
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="rwmh"),
        run=RunConfig(
            chains=4,
            warmup=max(100, int(1000 * scale)),
            draws=max(100, int(10_000 * scale)),
            seed=seed,
            segment_size=10_000,
        ),
    )
    return model, data, cfg


def _hier_logistic_100(seed: int, scale: float):
    """Config 2 (BASELINE.json:8): 100 groups x 50 obs, 64 chains.

    FROZEN-METRIC NEWTON default (since 2026-08-18): BASELINE.json:8 pins
    'MH-within-Gibbs', which Newton-MH satisfies (it IS an MH block move,
    with a Laplace proposal) — and it wins both ESS conventions 6.3x/6.6x
    over the round-2 adaptive-RW state (18.17M vs 2.89M sum, 166.2k vs
    25.2k min ESS/s/chip at all-param R-hat 1.0005 vs 1.0062; artifact
    `hier-logistic-100-newton_3ef7c20`). The RW floor was beta[13,2] — a
    group-block mixing floor, exactly what the Laplace proposal attacks.
    The RW state stays reproducible as `hier-logistic-100-rw`."""
    data, _ = synth_logistic(
        jax.random.key(seed + 1000), G=100, n=50, p=4
    )
    model = make_hier_logistic(data, tau_prior="invgamma")
    # big scan segments: this tiny model sweeps at ~7000/s on-chip, so
    # per-segment host syncs through the remote tunnel dominate wall time
    # at the default segment_size=500
    # 1500/4096: the converged schedule (worst all-param split R-hat
    # 1.0005, artifact hier-logistic-100-newton_3ef7c20) — the preset
    # reproduces the committed artifact with no overrides
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton"),
        run=RunConfig(
            chains=64,
            warmup=max(50, int(1500 * scale)),
            draws=max(50, int(4096 * scale)),
            seed=seed,
            segment_size=4096,
            collect={"mu": None, "log_tau": None, "beta": 16},
        ),
    )
    return model, data, cfg


def _hier_logistic_100_rw(seed: int, scale: float):
    """Config-2 round-2 state: adaptive RW-MH + half-normal tau MH block
    (converged artifact `hier-logistic-100_0e5e574`: all-param R-hat
    1.0062, 2.89M ESS/s/chip, floor beta[13,2] at 25.2k/s)."""
    _, data, cfg = _hier_logistic_100(seed, scale)
    model = make_hier_logistic(data)
    return model, data, dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, algorithm="rwmh")
    )


def _hier_logistic_1k(seed: int, scale: float):
    """The judged-metric model (BASELINE.json:2,5): 1k groups, many chains.

    FROZEN-METRIC NEWTON default (round 3, matching bench.py): Laplace
    group proposals off a carried {v, g, packed-H} cache, Hessian
    refreshed during warmup and frozen for sampling (KernelConfig
    .newton_freeze) so the sampling obs pass costs the same as MALA's
    while beta mixes near-IID — measured A/B at C=256
    (benchmarks/judged_ab.py, 2026-08-18): MALA 5.34M sum / 54.0k min
    ESS/s/chip -> Newton-frozen 9.84M / 100.6k, sweep rates within 6%.
    Conjugate invgamma tau (+33% min-ESS/s over halfnormal+MH, round-2
    A/B) and the fused single-kernel step stay on; the round-2 MALA
    state is `hier-logistic-1k-mala`."""
    data, _ = synth_logistic(
        jax.random.key(seed + 2000), G=1000, n=50, p=4
    )
    model = make_hier_logistic(data, tau_prior="invgamma")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton", fused_accept=True),
        run=RunConfig(
            chains=256,
            warmup=max(50, int(1000 * scale)),
            draws=max(50, int(2048 * scale)),
            seed=seed,
            segment_size=2048,
            collect={"mu": None, "log_tau": None, "beta": 8},
        ),
    )
    return model, data, cfg


def _judged(seed: int, scale: float):
    """The EXACT bench.py configuration (VERDICT r3 item 6): byte-for-byte
    the driver-judged headline run, so `python -m benchmarks.run --preset
    judged` reproduces BENCH_r03-style artifacts with no overrides.

    Differences from `hier-logistic-1k` (which keeps its own committed
    artifacts reproducible): 1024 chains PER CHIP (bench chain-scan argmax,
    2026-08-18), 1500/4096 schedule, and full_rhat streaming ON so the
    <1.01 gate covers all 4,008 parameters. Data key, model (invgamma tau,
    asis_repeats=1), kernel (frozen Newton + fused step), segment size and
    collect spec match bench.py exactly at seed=0."""
    data, _ = synth_logistic(
        jax.random.key(seed + 2000), G=1000, n=50, p=4
    )
    model = make_hier_logistic(data, tau_prior="invgamma")
    n_dev = len(jax.devices())
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="newton", fused_accept=True),
        run=RunConfig(
            chains=(1024 * n_dev) if scale >= 1.0 else 8 * max(n_dev, 1),
            warmup=max(50, int(1500 * scale)),
            draws=max(50, int(4096 * scale)),
            seed=seed,
            segment_size=2048,
            collect={"mu": None, "log_tau": None, "beta": 8},
            full_rhat=True,
            log_every_segment=False,
        ),
        sharding=ShardingConfig(chain_shards=max(n_dev, 1)),
    )
    return model, data, cfg


def _nested_poisson_1k(seed: int, scale: float):
    """Config 3 (BASELINE.json:9): 3-level Poisson GLMM, 1k groups, 512 chains."""
    data, _ = synth_poisson3(
        jax.random.key(seed + 3000),
        G=max(8, int(1000 * min(scale * 10, 1.0))),
        subjects_per_group=4, n=10, p=3,
    )
    # inverse-gamma tau priors -> exact conjugate Gibbs draws for both
    # scale levels (measured: 7x the tau ESS of half-normal + MH)
    model = make_nested_poisson(data, tau_prior="invgamma")
    # 16384 draws: the converged schedule (worst split R-hat 1.0090,
    # artifact nested-poisson-1k_2349409; log_tau_g is the slowest mode
    # and R-hat scales ~1/draws). Sampling is only ~70 s at 512 chains.
    # fused_accept: the single-kernel beta_s step (ops/pallas/
    # poisson_accept.py, round 4) — same adaptive-RW kernel the spec pins,
    # one Pallas launch instead of the op-by-op update. Probe A/B at
    # C=512 (poisson-fused-ab_d54b1ed, real v5e, 2026-08-19, in-process):
    # rwmh 239.1 -> 241.8 sweeps/s, floor 547 -> 582/s; the mala/newton
    # variants gain more (+12%/+22% floor) because their updates carry
    # more op-by-op algebra.
    cfg = SamplerConfig(
        kernel=KernelConfig(fused_accept=True),
        run=RunConfig(
            chains=512 if scale >= 1.0 else 32,
            warmup=max(50, int(1000 * scale)),
            draws=max(50, int(16384 * scale)),
            seed=seed,
            segment_size=1024,
            collect={
                "mu": None, "log_tau_g": None, "log_tau_s": None,
                "beta_g": 8, "beta_s": 8,
            },
        ),
    )
    return model, data, cfg


def _ragged_10k(seed: int, scale: float):
    """Config 4 (BASELINE.json:10): ragged segment data, 10k groups,
    1024 chains sharded over ICI (chains axis).

    Default kernel: frozen-metric Newton + conjugate invgamma tau
    (BASELINE.json:10 pins no kernel). The Newton obs pass runs through
    the bucketed padded kernels (ops/bucket.py::
    bucketed_logistic_logp_grad_hess); with KernelConfig.newton_freeze
    (default) the Hessian passes only run during warmup and the
    sampling-phase obs pass is the bucketed MALA one. Measured at spec
    scale (all-param R-hat, real v5e, 2026-08-18): newton 539k sum /
    5,028 min ESS/s/chip (`ragged-10k-newton_443f0a1`) vs the round-2
    MALA state's 400k / 3,260 (`ragged-10k_0363afd`) — newton wins both
    conventions (1.35x / 1.54x), so it is the default; the MALA state
    stays reproducible as `ragged-10k-mala`."""
    G = max(64, int(10_000 * min(scale * 10, 1.0)))
    data, _ = synth_logistic(
        jax.random.key(seed + 4000), G=G, n=30, p=3, ragged=True
    )
    model = make_hier_logistic(data, tau_prior="invgamma")
    n_dev = len(jax.devices())
    cfg = SamplerConfig(
        # Bucketed fused Newton step (ops/bucket.py, round 3) in BOTH
        # phases: the frozen sampling-phase kernel measured 1.19x (36.7
        # vs 30.8 sweeps/s at 300/512 probe scale), and the warmup-phase
        # Hessian-refresh kernel is equal-cost to op-by-op (in-process
        # steady-state probe 2026-08-19: fused 13.32 s vs unfused 13.63 s
        # per 300 warmup sweeps at C=1024/G=10k — the earlier "12 vs 20
        # sweeps/s" reading that briefly set fused_accept_warmup=False
        # here was axon per-program first-execution variance).
        kernel=KernelConfig(algorithm="newton", fused_accept=True),
        # 800/2048: the converged schedule (worst all-param split R-hat
        # 1.0070, artifact ragged-10k-newton_443f0a1)
        run=RunConfig(
            chains=1024 if scale >= 1.0 else 8 * max(n_dev, 1),
            warmup=max(50, int(800 * scale)),
            draws=max(50, int(2048 * scale)),
            seed=seed,
            segment_size=512,
            collect={"mu": None, "log_tau": None, "beta": 8},
        ),
        sharding=ShardingConfig(chain_shards=max(n_dev, 1)),
    )
    return model, data, cfg


def _ragged_10k_mala(seed: int, scale: float):
    """Config-4 round-2 state: MALA via the bucketed fused logp+grad
    path (O(C N) peak memory: fits 1024 chains on one chip, unlike the
    round-1 vjp-through-gather that OOMed and forced an RW fallback) with
    the half-normal tau MH block + Langevin ASIS. Converged artifact
    `ragged-10k_0363afd` (all-param R-hat 1.0067, 400k / 3,260)."""
    _, data, cfg = _ragged_10k(seed, scale)
    model = make_hier_logistic(data)
    return model, data, dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, algorithm="mala")
    )


def _mala_100k(seed: int, scale: float):
    """Config 5 (BASELINE.json:11): MALA with fused log-density+grad,
    100k groups on v5e-8 (chains x groups mesh)."""
    G = max(128, int(100_000 * min(scale * 20, 1.0)))
    data, _ = synth_logistic(
        jax.random.key(seed + 5000), G=G, n=20, p=3
    )
    model = make_hier_logistic(data)
    n_dev = len(jax.devices())
    gsh = 2 if (n_dev % 2 == 0 and n_dev > 1 and G % 2 == 0) else 1
    # 512 chains: at G=100k the kernels' chain tile is the LANE axis, so
    # C=64 (TC=64) idled half of every 128-wide vector — measured ESS/s/
    # chip at the converged 1500/4096 schedule: C=64 -> 22-24k, 128 ->
    # 45k, 256 -> 55k, 512 -> 63k (worst R-hat 1.0026 throughout).
    cfg = SamplerConfig(
        # fused_accept: the single-kernel MALA step measured 1.16x at
        # G=100k (68.1k vs 58.5k ESS/s/chip, floor 967 vs 723/s, worst
        # all-param R-hat 1.0015; artifact `mala-100k_20e173a_212709`,
        # 2026-08-18) — it was off here through round 2 purely because it
        # was never A/B'd at this scale (the round-3 Newton rejection
        # named it as a confound, now resolved).
        kernel=KernelConfig(algorithm="mala", fused_accept=True),
        # 1500/4096: the converged schedule (worst split R-hat 1.0026,
        # artifact mala-100k_a41740d_20260817_074655) — `--preset
        # mala-100k` must reproduce the committed artifact with no
        # overrides (VERDICT r2 item 5). ~160 s sampling at 512 chains.
        run=RunConfig(
            chains=512 if scale >= 1.0 else 16,
            warmup=max(50, int(1500 * scale)),
            draws=max(50, int(4096 * scale)),
            seed=seed,
            collect={"mu": None, "log_tau": None, "beta": 8},
            # full-R-hat gating baked in (the committed artifact is
            # all-param-gated; `--preset mala-100k` with no overrides must
            # reproduce it — VERDICT r2 item 5). Streaming over ~300k
            # params at thin=1 costs ~19% via the jnp path (53.1k vs
            # 63.3k ESS/s/chip) and ~11% via the round-4 in-kernel fold
            # (61.6k): at G=100k the Welford STATE traffic (4x position
            # per fold) is itself the cost. thin=4 runs the post-sweep
            # cond-gated jnp update (67.0k) — a cond-gated IN-KERNEL fold
            # at thin=4 measured SLOWER (55.8k: the cond re-materializes
            # the accumulators every sweep), so rhat_fold_names disables
            # the fold when full_rhat_thin > 1. 1024 thinned draws/chain
            # drive the same split-R-hat gate.
            full_rhat=True,
            full_rhat_thin=4,
        ),
        sharding=ShardingConfig(
            chain_shards=max(n_dev // gsh, 1), group_shards=gsh
        ),
    )
    return model, data, cfg


def _mala_100k_newton(seed: int, scale: float):
    """Config-5 variant: frozen-metric Newton at G=100k, the round-4
    CONFOUND-CLOSED re-litigation of the round-3 rejection (VERDICT r3
    item 1). The round-3 arm ran op-by-op (≈15 (C,G,T) temps in the
    warmup program — HBM-OOM at C=512) with a different tau prior than
    the MALA arm. With the fused single-kernel Newton step (the whole
    update is ONE kernel: no op-by-op temps ever materialize) C=512 runs
    fine and the probe A/B (`c5-ab_1f17266`, 300/512 schedule, both arms
    fused) measured Newton-invgamma 96.2k ESS/s/chip sum vs
    MALA-halfnormal 73.0k (+32%) — but floor 758/s vs MALA's 1,034/s:
    Newton's extra tau-conditional likelihood passes cost floor mixing
    at G=100k. Per DESIGN.md §5a, Newton is NOT "MALA" (BASELINE.json:11
    pin), so `mala-100k` (MALA) stays the default and this ships as the
    sum-convention-optimal variant.

    Round-5 settlement: at MALA's inherited 1500/4096 schedule the
    all-param gate FAILS (1.0143, `mala-100k-newton_3102ff0`) — a tail
    beta group under the frozen metric needs more draws. 1500/8192
    PASSES (1.0073) at 96.1k/s sum (`mala-100k-newton_1ab8957_091214`),
    so 8192 is the baked schedule: the preset reproduces a CONVERGED
    artifact. Trade-off vs the default, both converged: +41% sum,
    all-param floor 84/s vs MALA's 518/s (6.2x)."""
    _, data, cfg = _mala_100k(seed, scale)
    model = make_hier_logistic(data, tau_prior="invgamma")
    return model, data, dataclasses.replace(
        cfg,
        kernel=dataclasses.replace(cfg.kernel, algorithm="newton"),
        # segment_size 256, NOT the inherited 500: Newton warmup runs
        # ~6.6 sweeps/s at this shape, so a 500-sweep segment is a ~76 s
        # single device execution — which reproducibly (3/3, 2026-08-19)
        # kills the axon TPU worker ("TPU worker process crashed or
        # restarted"); every ≤48 s execution succeeded, and the same
        # 500-sweep warmup split into two 250-sweep segments ran clean.
        # Keep per-segment wall time under ~45 s on this tunnel.
        # draws 8192: the smallest schedule that passes the all-param
        # gate under frozen Newton at G=100k (see docstring).
        run=dataclasses.replace(cfg.run, segment_size=256, draws=8192),
    )


def _nested_poisson_1k_mala(seed: int, scale: float):
    """Config-3 variant beyond the spec pin: MALA on beta_s.

    BASELINE.json:9 pins 'adaptive MH' (kept as the default preset's RW
    kernel; DESIGN.md 5a); beta_s carries a fused logp+grad cache, so
    MALA costs no extra obs passes and lifts the binding log_tau_g
    min-ESS floor ~3x. Round-4 state (fused single-kernel step, full
    schedule, all-param R-hat 1.0027): 687.4k ESS/s/chip, floor 2,013/s
    (artifact `nested-poisson-1k-mala_d54b1ed_121101`)."""
    model, data, cfg = _nested_poisson_1k(seed, scale)
    return model, data, dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, algorithm="mala")
    )


def _nested_poisson_1k_newton(seed: int, scale: float):
    """Config-3 variant beyond the spec pin: NEWTON-MH on beta_s.

    The obs-level conditional gets the Laplace proposal built from the
    analytic Poisson curvature w = exp(eta) (zero extra transcendentals),
    and with KernelConfig.newton_freeze (default) the sampling-phase obs
    pass costs the same as MALA's. The tau_s interweave upgrades to the
    parameter-free p-dim Gauss-Newton Laplace move off the carried
    Hessian. Config 3's min-ESS floor (log_tau_g) is capped by beta_s's
    own mixing (BASELINE.md round 3) — this is the strongest beta_s
    kernel in the design space. Round-4 state (fused single-kernel step,
    full schedule, all-param R-hat 1.0017): 933.6k ESS/s/chip, floor
    2,570/s (artifact `nested-poisson-1k-newton_d54b1ed_121737`)."""
    model, data, cfg = _nested_poisson_1k(seed, scale)
    return model, data, dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, algorithm="newton")
    )


def _hier_logistic_1k_mala(seed: int, scale: float):
    """The judged preset's round-2 state: MALA group updates (fused
    single-kernel step, carried gradient cache) + bound-metric Langevin
    ASIS interweave. Superseded as the default by frozen-metric Newton
    (see `_hier_logistic_1k`), which wins BOTH ESS conventions at a
    sweep rate within 6%; kept reproducible for A/Bs
    (benchmarks/judged_ab.py) and as the reference point for the
    round-2 artifacts (BENCH_r02, `bench-gradasis-r1_aa016ec`)."""
    model, data, cfg = _hier_logistic_1k(seed, scale)
    return model, data, dataclasses.replace(
        cfg, kernel=dataclasses.replace(cfg.kernel, algorithm="mala")
    )


PRESETS = {
    "eight-schools": _eight_schools,
    "hier-logistic-100": _hier_logistic_100,
    # back-compat alias: the newton variant IS the default since 2026-08-18
    "hier-logistic-100-newton": _hier_logistic_100,
    "hier-logistic-100-rw": _hier_logistic_100_rw,
    "hier-logistic-1k": _hier_logistic_1k,
    # back-compat alias: the newton variant IS the default since 2026-08-18
    "hier-logistic-1k-newton": _hier_logistic_1k,
    "hier-logistic-1k-mala": _hier_logistic_1k_mala,
    # byte-for-byte the bench.py judged headline (VERDICT r3 item 6)
    "judged": _judged,
    "nested-poisson-1k": _nested_poisson_1k,
    "nested-poisson-1k-mala": _nested_poisson_1k_mala,
    "nested-poisson-1k-newton": _nested_poisson_1k_newton,
    "ragged-10k": _ragged_10k,
    # back-compat alias: the newton variant IS the default since 2026-08-18
    "ragged-10k-newton": _ragged_10k,
    "ragged-10k-mala": _ragged_10k_mala,
    "mala-100k": _mala_100k,
    "mala-100k-newton": _mala_100k_newton,
}


def get_preset(name: str, seed: int = 0, scale: float = 1.0):
    """(model, data, SamplerConfig) for a named preset."""
    if name not in PRESETS:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}"
        )
    return PRESETS[name](seed, scale)


def override_run(cfg: SamplerConfig, **kwargs) -> SamplerConfig:
    return dataclasses.replace(cfg, run=replace(cfg.run, **kwargs))
