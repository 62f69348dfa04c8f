"""Bucketed fused MALA/Newton steps on ragged data (ops/bucket.py).

Config 4's hot update: the padded single-kernel propose+lik+accept steps
(ops/pallas/{mala,newton}_accept.py) launched once per size bucket with
gather/scatter glue. Contracts:

1. CPU exact parity (interpret mode, EXTERNAL noise): with the same
   (eps, log-u) arrays the bucketed fused step must reproduce the unfused
   kernels/{mala,newton}.py update on the ragged model to float
   tolerance — every bucket partitions the conditionally-independent
   group block, so the composition IS the whole-block update.
2. Coverage guard: a size-0 group falls in no bucket but still needs its
   prior-only MH move each sweep, so the model must NOT expose the
   bucketed fused updates when coverage is partial.
3. TPU statistical tier lives in the sampler-level equivalence tests
   (fused on-core PRNG vs threefry; see test_mala_accept_fused.py's tier
   for the padded analog).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.data import RaggedData
from nestmc.kernels.mala import mala_update
from nestmc.kernels.newton import newton_update
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_hier_logistic, synth_logistic
from nestmc.ops.bucket import (
    BucketLayout,
    bucketed_fused_mala_step,
    bucketed_fused_newton_step,
    covers_all_groups,
)


def _setup(algorithm, C=8, G=23, n=9, p=3, seed=11):
    # min_obs=1 spreads sizes over several power-of-2 buckets
    data, _ = synth_logistic(
        jax.random.key(seed), G=G, n=n, p=p, ragged=True, min_obs=1
    )
    model = make_hier_logistic(
        data, loglik_impl="bucket", tau_prior="invgamma"
    )
    layout = BucketLayout.build(
        np.asarray(data.segment_ids), data.num_groups, min_groups=4
    )
    assert covers_all_groups(layout)
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm=algorithm),
        run=RunConfig(chains=C, log_every_segment=False),
    )
    state = init_kernel_state(model, cfg, jax.random.key(1), data)
    return data, model, layout, state


def _noise(key, C, G, p):
    """The unfused update's internal noise, replicated (kernels/mala.py
    and kernels/newton.py both split key -> (eps, u))."""
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (C, G, p), jnp.float32)
    logu = jnp.log(jax.random.uniform(
        k_u, (C, G), jnp.float32, minval=jnp.finfo(jnp.float32).tiny
    ))
    return eps, logu


def test_mala_exact_parity_external_noise():
    data, model, layout, state = _setup("mala")
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(7)
    log_scale = jnp.full((C, G), -1.1)
    eps, logu = _noise(key, C, G, p)

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = mala_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"],
    )

    c = state.cache["beta"]
    nb, nv, ng, alpha = bucketed_fused_mala_step(
        key, beta, c["v"], c["g"], log_scale,
        state.position["mu"], state.position["log_tau"],
        data.x, data.y, layout, noise=(eps, logu),
    )
    assert 0.02 < float(jnp.mean(ref_alpha)) < 0.999
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(nb), np.asarray(ref_beta), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(nv), np.asarray(ref_cache["v"]), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ng), np.asarray(ref_cache["g"]), rtol=1e-3, atol=5e-4
    )


@pytest.mark.parametrize("frozen", [False, True])
def test_newton_exact_parity_external_noise(frozen):
    data, model, layout, state = _setup("newton")
    beta = state.position["beta"]
    C, G, p = beta.shape
    key = jax.random.key(42)
    log_scale = state.log_scale["beta"]                  # zeros (c = 1)
    eps, logu = _noise(key, C, G, p)

    block = model.block("beta")
    ref_beta, ref_alpha, ref_cache = newton_update(
        key, block, model, state.position, log_scale, None, data,
        cache=state.cache["beta"], frozen=frozen,
    )

    c = state.cache["beta"]
    nb, nv, ng, nh, alpha = bucketed_fused_newton_step(
        key, beta, c["v"], c["g"], c["h"], log_scale,
        state.position["mu"], state.position["log_tau"],
        data.x, data.y, layout, noise=(eps, logu), frozen=frozen,
    )
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(ref_alpha), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(nb), np.asarray(ref_beta), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(nv), np.asarray(ref_cache["v"]), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ng), np.asarray(ref_cache["g"]), atol=2e-4
    )
    if frozen:
        # the frozen metric passes through IDENTICALLY (no write)
        assert nh is c["h"]
    else:
        np.testing.assert_allclose(
            np.asarray(nh), np.asarray(ref_cache["h"]), atol=2e-4
        )


def test_model_exposes_bucketed_fused_updates():
    data, _ = synth_logistic(
        jax.random.key(3), G=40, n=12, p=3, ragged=True
    )
    model = make_hier_logistic(data, loglik_impl="bucket")
    assert "beta" in model.fused_updates_mala
    assert "beta" in model.fused_updates_newton
    # the RW fused step stays padded-only
    assert model.fused_updates == {}


def test_zero_size_group_disables_fused_updates():
    """A size-0 group needs its prior-only MH move; the bucketed fused
    step would skip it, so the model must withhold the fused tables."""
    data, _ = synth_logistic(
        jax.random.key(3), G=40, n=12, p=3, ragged=True
    )
    # renumber groups so id 0 has no observations
    gapped = RaggedData(
        y=data.y,
        segment_ids=data.segment_ids + 1,
        num_groups=data.num_groups + 1,
        x=data.x,
    )
    layout = BucketLayout.build(
        np.asarray(gapped.segment_ids), gapped.num_groups
    )
    assert not covers_all_groups(layout)
    model = make_hier_logistic(gapped, loglik_impl="bucket")
    assert model.fused_updates_mala == {}
    assert model.fused_updates_newton == {}
