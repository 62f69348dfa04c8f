"""Same seed => bitwise-identical draws; sharding-invariance of the RNG."""

import numpy as np

import jax
import jax.numpy as jnp

from nestmc import RunConfig, SamplerConfig, ShardingConfig, sample
from nestmc.models import make_hier_logistic, synth_logistic


def _run(cfg_sharding=None, seed=9, chains=16):
    data, _ = synth_logistic(jax.random.key(21), G=16, n=12, p=2)
    model = make_hier_logistic(data)
    cfg = SamplerConfig(
        run=RunConfig(
            chains=chains, warmup=60, draws=60, seed=seed,
            log_every_segment=False,
        ),
        sharding=cfg_sharding or ShardingConfig(),
    )
    return sample(model, data, cfg)


def test_same_seed_bitwise_identical():
    a = _run()
    b = _run()
    for k in a.draws:
        np.testing.assert_array_equal(
            np.asarray(a.draws[k]), np.asarray(b.draws[k])
        )


def test_different_seed_differs():
    a = _run(seed=9)
    b = _run(seed=10)
    assert not np.array_equal(
        np.asarray(a.draws["mu"]), np.asarray(b.draws["mu"])
    )


def test_chain_sharded_matches_unsharded(devices8):
    """Chain-axis sharding must not change a single bit of the draws:
    per-chain computation is local, RNG is partitionable."""
    a = _run()
    b = _run(cfg_sharding=ShardingConfig(chain_shards=8))
    for k in a.draws:
        np.testing.assert_array_equal(
            np.asarray(a.draws[k]), np.asarray(b.draws[k]), err_msg=k
        )


def test_group_sharded_statistically_identical(devices8):
    """Group-axis sharding changes reduction order (psum), so bitwise
    equality is not guaranteed — but acceptance rates and posteriors must
    agree statistically."""
    a = _run(chains=32)
    b = _run(
        chains=32,
        cfg_sharding=ShardingConfig(chain_shards=4, group_shards=2),
    )
    for k in a.accept_rates:
        ra, rb = (
            float(jnp.mean(a.accept_rates[k])),
            float(jnp.mean(b.accept_rates[k])),
        )
        assert abs(ra - rb) < 0.15, (k, ra, rb)
    ma, mb = np.asarray(a.mean("mu")), np.asarray(b.mean("mu"))
    assert np.all(np.abs(ma - mb) < 1.0)
