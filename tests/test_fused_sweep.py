"""Whole-sweep fused path (models/hier_logistic_fused.py +
ops/pallas/sweep_logistic.py).

Tiers (mirroring tests/test_mala_accept_fused.py):

1. CPU exact parity, EXTERNAL noise: in external-noise mode the fused
   sweep derives every random draw from the SAME threefry keys as the
   unfused kernels/gibbs.py sweep, so one full sweep (MALA beta +
   conjugate mu + conjugate invgamma tau + ASIS interweave, adaptation
   on and off) must reproduce the unfused KernelState to f32 op-order
   tolerance — position, scales, acceptance bookkeeping, carried caches.
2. Engine integration (CPU, forced interpret): sample() through the
   fused path produces canonical-layout draws/state, streams full R-hat
   correctly with chains-minor leaves, and matches the unfused engine
   run draw-for-draw at small scale.
3. TPU statistical equivalence (NESTMC_TPU_TESTS=1, on-core PRNG) lives
   in tests/test_tpu_smoke.py-style gating below.

Pad-row invariant: the fused carry is group-padded; a dedicated test
checks pad rows stay exactly zero across sweeps (streaming R-hat
correctness depends on it).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nestmc.config import KernelConfig, RunConfig, SamplerConfig
from nestmc.engine import sample
from nestmc.kernels.gibbs import make_sweep
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_hier_logistic, synth_logistic

TPU = os.environ.get("NESTMC_TPU_TESTS") == "1"


def _setup(C=8, G=21, n=9, p=3, seed=3):
    data, _ = synth_logistic(jax.random.key(seed), G=G, n=n, p=p)
    model = make_hier_logistic(data, tau_prior="invgamma",
                               loglik_impl="jnp")
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="mala", fused_sweep=True),
        run=RunConfig(chains=C, seed=seed + 1),
    )
    return model, data, cfg


def _forced(model):
    """Model whose fused factory runs in interpret + external-noise mode
    (the only valid mode off-TPU)."""
    return dataclasses.replace(
        model,
        fused_sweep=lambda c, d: model.fused_sweep(
            c, d, interpret=True, external_noise=True
        ),
    )


@pytest.mark.parametrize("adapt", [True, False])
@pytest.mark.parametrize("dims", [(8, 21, 9, 3), (16, 13, 5, 2),
                                  (8, 70, 12, 4)])
def test_one_sweep_exact_parity(dims, adapt):
    C, G, n, p = dims
    model, data, cfg = _setup(C, G, n, p, seed=3 + p)
    state = init_kernel_state(model, cfg, jax.random.key(9), data)

    ref = make_sweep(model, cfg)(state, data, adapt=adapt)

    impl = model.fused_sweep(cfg, data, interpret=True,
                             external_noise=True)
    fout = impl.sweep(impl.to_fused(state), impl.prep_data(data),
                      adapt=adapt)
    back = impl.from_fused(fout)

    def close(a, b, tol=5e-4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol)

    for k in ref.position:
        close(ref.position[k], back.position[k])
    for k in ref.log_scale:
        close(ref.log_scale[k], back.log_scale[k])
    for k in ref.accept_sum:
        close(ref.accept_sum[k], back.accept_sum[k])
    close(ref.cache["beta"]["v"], back.cache["beta"]["v"])
    close(ref.cache["beta"]["g"], back.cache["beta"]["g"], tol=2e-3)
    assert int(back.t) == int(ref.t)
    assert bool(jnp.all(
        jax.random.key_data(back.key) == jax.random.key_data(ref.key)
    ))
    # both accept and reject branches exercised somewhere
    a = np.asarray(back.accept_sum["beta"])
    assert 0.01 < a[a > 0].mean() < 0.999


def test_pad_rows_stay_zero():
    model, data, cfg = _setup(C=8, G=21, n=9, p=3)
    state = init_kernel_state(model, cfg, jax.random.key(9), data)
    impl = model.fused_sweep(cfg, data, interpret=True,
                             external_noise=True)
    fstate, fdata = impl.to_fused(state), impl.prep_data(data)
    for _ in range(3):
        fstate = impl.sweep(fstate, fdata, adapt=True)
    G = impl.G
    for leaf in (fstate.position["beta"], fstate.cache["beta"]["v"],
                 fstate.cache["beta"]["g"], fstate.accept_sum["beta"]):
        pad = np.asarray(leaf)[G:]
        assert pad.size and np.all(pad == 0.0), "pad rows drifted"


def test_roundtrip_layout():
    model, data, cfg = _setup()
    state = init_kernel_state(model, cfg, jax.random.key(4), data)
    impl = model.fused_sweep(cfg, data, interpret=True,
                             external_noise=True)
    back = impl.from_fused(impl.to_fused(state))
    for k in state.position:
        np.testing.assert_array_equal(np.asarray(state.position[k]),
                                      np.asarray(back.position[k]))
    np.testing.assert_array_equal(
        np.asarray(state.log_scale["beta"]),
        np.asarray(back.log_scale["beta"]),
    )
    np.testing.assert_array_equal(
        np.asarray(state.cache["beta"]["g"]),
        np.asarray(back.cache["beta"]["g"]),
    )


@pytest.mark.slow
def test_engine_integration_matches_unfused():
    model, data, cfg = _setup(C=8, G=21, n=9, p=3)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, warmup=40, draws=30, segment_size=16,
        collect={"mu": None, "log_tau": None, "beta": 5},
        full_rhat=True, log_every_segment=False,
    ))
    post_f = sample(_forced(model), data, cfg)
    cfg_u = dataclasses.replace(cfg, kernel=dataclasses.replace(
        cfg.kernel, fused_sweep=False
    ))
    post_u = sample(model, data, cfg_u)

    assert {k: v.shape for k, v in post_f.draws.items()} == \
           {k: v.shape for k, v in post_u.draws.items()}
    for k in post_f.draws:
        # identical threefry noise -> identical trajectories up to f32
        # op-order drift (short horizon keeps accept flips improbable)
        np.testing.assert_allclose(
            np.asarray(post_f.draws[k]), np.asarray(post_u.draws[k]),
            rtol=5e-3, atol=5e-3,
        )
    # canonical-layout outputs
    assert post_f.final_state.position["beta"].shape == (8, 21, 3)
    assert post_f.full_rhat["beta"].shape == (21, 3)
    assert np.isfinite(post_f.worst_rhat())
    for k, v in post_f.accept_rates.items():
        assert v.shape == post_u.accept_rates[k].shape


def test_streaming_rhat_chain_axes_equivalence():
    """finalize(chain_axes=...) over a chains-minor stream must equal the
    canonical split_rhat of the same draws."""
    from nestmc.diagnostics import (
        split_rhat,
        streaming_rhat_finalize,
        streaming_rhat_init,
        streaming_rhat_update,
    )

    C, D, G, p = 6, 40, 5, 3
    draws = jax.random.normal(jax.random.key(0), (C, D, G, p)) + \
        0.3 * jnp.arange(C)[:, None, None, None]
    pos_t = [jnp.transpose(draws[:, i], (1, 2, 0)) for i in range(D)]
    acc = streaming_rhat_init({"beta": pos_t[0]})
    for i in range(D):
        acc = streaming_rhat_update(acc, {"beta": pos_t[i]}, i, D // 2)
    got = streaming_rhat_finalize(acc, chain_axes={"beta": 2})["beta"]
    want = split_rhat(draws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ineligible_configs_fall_back():
    model, data, cfg = _setup()
    # rwmh -> ineligible
    c2 = dataclasses.replace(cfg, kernel=dataclasses.replace(
        cfg.kernel, algorithm="rwmh"
    ))
    assert model.fused_sweep(c2, data, interpret=True,
                             external_noise=True) is None
    # group sharding -> ineligible
    from nestmc.config import ShardingConfig

    c3 = dataclasses.replace(cfg, sharding=ShardingConfig(group_shards=2))
    assert model.fused_sweep(c3, data, interpret=True,
                             external_noise=True) is None
    # halfnormal tau (no conjugate draw) -> no factory at all
    m2 = make_hier_logistic(data, tau_prior="halfnormal",
                            loglik_impl="jnp")
    assert m2.fused_sweep is None
    # off-TPU without external noise -> None (core PRNG stubbed)
    if jax.default_backend() != "tpu":
        assert model.fused_sweep(cfg, data) is None


@pytest.mark.skipif(not TPU, reason="TPU-only tier (on-core PRNG)")
def test_tpu_statistical_equivalence():
    """Fused sweep (on-core PRNG) vs unfused (threefry) on-chip: one
    moderate run each; posterior moments and acceptance rates agree."""
    data, _ = synth_logistic(jax.random.key(11), G=64, n=16, p=3)
    model = make_hier_logistic(data, tau_prior="invgamma")
    run = RunConfig(chains=64, warmup=400, draws=600, seed=0,
                    segment_size=512, log_every_segment=False,
                    collect={"mu": None, "log_tau": None})
    post_f = sample(model, data, SamplerConfig(
        kernel=KernelConfig(algorithm="mala", fused_sweep=True), run=run))
    post_u = sample(model, data, SamplerConfig(
        kernel=KernelConfig(algorithm="mala"), run=run))
    for k in ("mu", "log_tau"):
        mf = np.asarray(jnp.mean(post_f.draws[k], axis=(0, 1)))
        mu_ = np.asarray(jnp.mean(post_u.draws[k], axis=(0, 1)))
        sf = np.asarray(jnp.std(post_f.draws[k], axis=(0, 1)))
        tol = 4.0 * sf / 30.0 + 0.02  # ~4 z of a crude ESS guess
        assert np.all(np.abs(mf - mu_) < tol), (k, mf, mu_, tol)
    af = float(np.mean(np.asarray(post_f.accept_rates["beta"])))
    au = float(np.mean(np.asarray(post_u.accept_rates["beta"])))
    assert abs(af - au) < 0.05
