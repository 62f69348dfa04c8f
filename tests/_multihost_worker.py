"""One process of a REAL 2-process jax.distributed run (spawned by
tests/test_multihost.py).

Each worker forces 4 CPU devices; after `multihost.initialize()` (driven
entirely by the NESTMC_* env vars — the exact production path) the global
topology is 2 processes x 4 devices = 8. Two modes (NESTMC_WORKER_MODE):

  chains (default): 8-schools with the CHAINS axis sharded over the
    process-spanning mesh — zero hot-loop collectives; the end-of-run
    moment reductions are the cross-process (DCN-analog) traffic.
  groups (VERDICT r4 item 6): hierarchical logistic (G=64, p=3) with the
    GROUPS axis sharded over all 8 devices — 4 per process, so the design's
    one hot-loop collective (the psum of the hyper-block sufficient
    statistics over groups, every sweep's conjugate mu/tau draws) crosses
    the process boundary on every one of the 80 sweeps.

Prints one `MULTIHOST_RESULT {json}` line per process.
"""

import json
import os
import sys

# invoked by script path: python puts tests/ on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from nestmc.parallel import multihost

    multihost.initialize()  # reads NESTMC_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID

    import jax
    import jax.numpy as jnp

    from nestmc.config import RunConfig, SamplerConfig, ShardingConfig
    from nestmc.engine import sample

    assert jax.process_count() == int(os.environ["NESTMC_NUM_PROCESSES"]), (
        jax.process_count()
    )
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * jax.process_count(), jax.device_count()

    mode = os.environ.get("NESTMC_WORKER_MODE", "chains")
    if mode == "groups":
        from nestmc.models import make_hier_logistic, synth_logistic

        data, _ = synth_logistic(jax.random.key(9), G=64, n=12, p=3)
        model = make_hier_logistic(data)
        cfg = SamplerConfig(
            run=RunConfig(
                chains=8, warmup=30, draws=50, seed=7, segment_size=50,
                log_every_segment=False,
                collect={"mu": None, "log_tau": None},
            ),
            # ('chains'=1, 'groups'=8) mesh: make_mesh reshapes the global
            # device list (process 0's four devices, then process 1's) to
            # (1, 8), so the groups axis SPANS both processes and the
            # per-sweep suff-stat psum rides the cross-process path
            sharding=ShardingConfig(
                chain_shards=1, group_shards=jax.device_count()
            ),
        )
    else:
        from nestmc.models import make_eight_schools

        model, data = make_eight_schools()
        cfg = SamplerConfig(
            run=RunConfig(
                chains=8, warmup=40, draws=80, seed=7, segment_size=80,
                log_every_segment=False,
                collect={"mu": None, "log_tau": None},
            ),
            sharding=ShardingConfig(chain_shards=jax.device_count()),
        )
    post = sample(model, data, cfg)

    # global reductions over the process-spanning chains axis; the results
    # are fully replicated scalars, so float() is legal on every process
    stats = jax.jit(
        lambda a, b: {
            "mu_mean": jnp.mean(a), "mu_var": jnp.var(a),
            "log_tau_mean": jnp.mean(b), "log_tau_var": jnp.var(b),
        }
    )(post.draws["mu"], post.draws["log_tau"])
    out = {k: float(v) for k, v in stats.items()}
    out["process_index"] = jax.process_index()
    out["process_count"] = jax.process_count()
    out["device_count"] = jax.device_count()
    out["local_device_count"] = jax.local_device_count()
    out["is_primary"] = multihost.is_primary()
    print("MULTIHOST_RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
