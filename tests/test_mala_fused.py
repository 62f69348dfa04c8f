"""MALA with the fused Pallas logp+grad path == generic vjp path.

Full trajectories diverge chaotically from ~1e-5 kernel reassociation noise
(one flipped accept decorrelates everything after), so the contract is:
(1) one-step acceptance probabilities match tightly, (2) long runs agree
statistically (posterior moments within Monte-Carlo tolerance).
"""

import pytest
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from nestmc import KernelConfig, RunConfig, SamplerConfig, sample
from nestmc.kernels.mala import mala_update
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_hier_logistic, synth_logistic


def _models():
    data, _ = synth_logistic(jax.random.key(17), G=16, n=10, p=2)
    fused = make_hier_logistic(data, loglik_impl="pallas")
    assert fused.cond_value_and_grad is not None
    # plain: no fused kernel, no carried grad cache — pure vjp each step
    plain = dataclasses.replace(
        make_hier_logistic(data, loglik_impl="jnp"),
        cond_value_and_grad=None,
        cond_cached_grad={},
    )
    return data, fused, plain


def test_one_step_alphas_match():
    data, fused, plain = _models()
    cfg = SamplerConfig(kernel=KernelConfig(algorithm="mala"),
                        run=RunConfig(chains=8))
    state = init_kernel_state(plain, cfg, jax.random.key(0), data)
    block = plain.block("beta")
    key = jax.random.key(42)
    outs = []
    for model in (fused, plain):
        _, alpha, _ = mala_update(
            key, block, model, state.position,
            state.log_scale["beta"], None, data,
        )
        outs.append(np.asarray(alpha))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_long_runs_statistically_agree():
    data, fused, plain = _models()
    cfg = SamplerConfig(
        kernel=KernelConfig(algorithm="mala"),
        run=RunConfig(
            chains=16, warmup=400, draws=600, seed=3,
            log_every_segment=False, collect={"mu": None, "log_tau": None},
        ),
    )
    a = sample(fused, data, cfg)
    b = sample(plain, data, cfg)
    for k in ("mu", "log_tau"):
        ma, mb = np.asarray(a.mean(k)), np.asarray(b.mean(k))
        da = np.asarray(a.diagnostics()[k]["mcse_mean"])
        db = np.asarray(b.diagnostics()[k]["mcse_mean"])
        tol = 5 * np.sqrt(da**2 + db**2)
        assert np.all(np.abs(ma - mb) < tol), (k, ma, mb, tol)
    from nestmc.kernels.gibbs import joint_move_target

    for k in a.accept_rates:
        ra = float(np.mean(np.asarray(a.accept_rates[k])))
        rb = float(np.mean(np.asarray(b.accept_rates[k])))
        if k in fused.joint_moves:
            # the grad-cache model runs the LANGEVIN interweave (target
            # 0.574), the stripped model the RW one (0.234): same invariant
            # distribution (moment agreement above) but different proposals
            # by design — check each against its own resolved adaptation
            # target instead of against each other
            assert abs(ra - joint_move_target(fused, k, cfg)) < 0.12, (k, ra)
            assert abs(rb - joint_move_target(plain, k, cfg)) < 0.12, (k, rb)
        else:
            assert abs(ra - rb) < 0.08, (k, ra, rb)
