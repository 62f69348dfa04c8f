"""Sharding semantics on the 8-device simulated mesh.

(Chain-sharded bitwise-equality and group-sharded statistical-equality live
in test_determinism.py; here: the collective path itself, placement, and
ragged/3-level models under sharding.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nestmc.config import RunConfig, SamplerConfig, ShardingConfig
from nestmc.engine import sample
from nestmc.kernels.state import init_kernel_state
from nestmc.models import (
    make_hier_logistic,
    make_nested_poisson,
    synth_logistic,
    synth_poisson3,
)
from nestmc.parallel.sharding import (
    data_shardings,
    make_mesh,
    shard_inputs,
    state_shardings,
)


def test_pop_block_cond_matches_across_shardings(devices8):
    """The psum-over-groups path: a population-block conditional evaluated
    on group-sharded state must equal the unsharded evaluation."""
    data, _ = synth_logistic(jax.random.key(5), G=32, n=8, p=3)
    model = make_hier_logistic(data, loglik_impl="jnp")
    cfg = SamplerConfig(
        run=RunConfig(chains=16),
        sharding=ShardingConfig(chain_shards=4, group_shards=2),
    )
    state = init_kernel_state(model, cfg, jax.random.key(0), data)
    ref = np.asarray(
        model.cond_logdensity("mu", state.position["mu"], state.position, data)
    )
    mesh = make_mesh(cfg)
    sstate, sdata = shard_inputs(state, data, model, cfg, mesh)

    out = jax.jit(
        lambda pos, d: model.cond_logdensity("mu", pos["mu"], pos, d)
    )(sstate.position, sdata)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_state_sharding_placement(devices8):
    data, _ = synth_logistic(jax.random.key(5), G=32, n=8, p=3)
    model = make_hier_logistic(data, loglik_impl="jnp")
    cfg = SamplerConfig(
        run=RunConfig(chains=16),
        sharding=ShardingConfig(chain_shards=4, group_shards=2),
    )
    mesh = make_mesh(cfg)
    shardings = state_shardings(model, cfg, mesh)
    assert shardings.position["beta"].spec == P("chains", "groups")
    assert shardings.position["mu"].spec == P("chains")
    state = init_kernel_state(model, cfg, jax.random.key(0), data)
    sstate, sdata = shard_inputs(state, data, model, cfg, mesh)
    assert sstate.position["beta"].sharding.spec == P("chains", "groups")
    assert sdata.x.sharding.spec == P("groups")


def test_nested_poisson_sharded_run(devices8):
    """3-level model with subjects AND groups blocks sharded over 'groups'
    (segment_sum crosses shards -> compiler collectives)."""
    data, _ = synth_poisson3(
        jax.random.key(6), G=8, subjects_per_group=4, n=6, p=2
    )
    model = make_nested_poisson(data, loglik_impl="jnp")
    cfg = SamplerConfig(
        run=RunConfig(
            chains=8, warmup=30, draws=30, log_every_segment=False,
            collect={"mu": None, "log_tau_g": None},
        ),
        sharding=ShardingConfig(chain_shards=4, group_shards=2),
    )
    post = sample(model, data, cfg)
    assert np.all(np.isfinite(np.asarray(post.draws["mu"])))


def test_ragged_chain_sharded_run(devices8):
    data, _ = synth_logistic(
        jax.random.key(7), G=40, n=12, p=2, ragged=True
    )
    model = make_hier_logistic(data)
    assert model.loglik_impls["selected"] == "jnp-segment"
    cfg = SamplerConfig(
        run=RunConfig(
            chains=16, warmup=30, draws=30, log_every_segment=False,
            collect={"mu": None},
        ),
        sharding=ShardingConfig(chain_shards=8),
    )
    post = sample(model, data, cfg)
    assert np.all(np.isfinite(np.asarray(post.draws["mu"])))


def test_mesh_size_validation():
    cfg = SamplerConfig(
        sharding=ShardingConfig(chain_shards=64, group_shards=2)
    )
    with pytest.raises(ValueError, match="devices"):
        make_mesh(cfg)
