"""Checkpoint completeness for gated runs (VERDICT r4 item 7).

Sample-phase checkpoints of full_rhat runs carry the streaming R-hat/ESS
accumulators alongside the kernel carry, and the engine's ``init_acc`` +
``draws_offset`` resume path continues them over the FULL schedule. With
the counter-based RNG this is exact: a run resumed mid-schedule finalizes
the identical all-param R-hat / ESS maps as the uninterrupted run. The
serialization round-trips through the real npz files (the only thing a
SIGKILL adds over this is process death, which tests/test_fault_injection.py
already covers for the carry path).
"""

import json
import os

import jax
import numpy as np
import pytest

from nestmc.checkpoint import load_checkpoint
from nestmc.config import RunConfig, SamplerConfig
from nestmc.engine import sample
from nestmc.models import make_hier_logistic, synth_logistic


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    ckdir = str(tmp_path_factory.mktemp("ck"))
    data, _ = synth_logistic(jax.random.key(11), G=10, n=8, p=2)
    model = make_hier_logistic(data)
    cfg = SamplerConfig(run=RunConfig(
        chains=8, warmup=80, draws=120, seed=3, segment_size=30,
        collect={"mu": None, "log_tau": None},
        full_rhat=True, checkpoint_dir=ckdir, checkpoint_every=1,
        log_every_segment=False,
    ))
    post_full = sample(model, data, cfg)
    return model, data, cfg, ckdir, post_full


def test_sample_checkpoints_carry_accumulators(setup):
    _, _, _, ckdir, _ = setup
    metas = sorted(f for f in os.listdir(ckdir) if f.startswith("meta_sample"))
    assert len(metas) == 4  # 120 draws / segment 30, checkpoint_every=1
    with open(os.path.join(ckdir, metas[1])) as f:
        meta = json.load(f)
    assert meta["has_acc"] is True
    assert meta["draws_done"] == 60


def _acc_template(model, cfg, data):
    from functools import partial

    from nestmc.diagnostics import fold_rhat_init, streaming_rhat_init
    from nestmc.kernels.gibbs import rhat_fold_names
    from nestmc.kernels.state import init_kernel_state

    state_t = init_kernel_state(
        model, cfg, jax.random.key(cfg.run.seed), data
    )
    fold_names = rhat_fold_names(model, cfg)
    std_pos = {
        k: v for k, v in state_t.position.items() if k not in fold_names
    }
    acc_t = (
        jax.jit(streaming_rhat_init)(std_pos),
        jax.jit(partial(fold_rhat_init, names=fold_names))(
            state_t.position
        ),
    )
    return {"state": state_t, "acc": acc_t}


def test_resume_finalizes_identical_gate(setup):
    model, data, cfg, ckdir, post_full = setup
    template = _acc_template(model, cfg, data)
    loaded, meta = load_checkpoint(ckdir, "sample_000002", template)
    assert meta["draws_done"] == 60
    post_res = sample(
        model, data, cfg,
        init_state=loaded["state"], skip_warmup=True,
        init_acc=loaded["acc"], draws_offset=60,
    )
    # the resumed run certifies the gate over the FULL 120-draw schedule
    assert post_res.full_rhat is not None
    for name in post_full.full_rhat:
        np.testing.assert_allclose(
            np.asarray(post_res.full_rhat[name]),
            np.asarray(post_full.full_rhat[name]),
            rtol=1e-6, err_msg=f"full_rhat[{name}]",
        )
    for name in post_full.full_ess:
        np.testing.assert_allclose(
            np.asarray(post_res.full_ess[name]["ess"]),
            np.asarray(post_full.full_ess[name]["ess"]),
            rtol=1e-6, err_msg=f"full_ess[{name}]",
        )
    # only the remainder was re-collected
    assert post_res.draws["mu"].shape[1] == 60


def test_resume_collects_nothing_when_done(setup):
    model, data, cfg, ckdir, post_full = setup
    template = _acc_template(model, cfg, data)
    loaded, meta = load_checkpoint(ckdir, "sample_000004", template)
    assert meta["draws_done"] == 120
    post_res = sample(
        model, data, cfg,
        init_state=loaded["state"], skip_warmup=True,
        init_acc=loaded["acc"], draws_offset=120,
    )
    assert post_res.draws == {}
    # the finalized gate still certifies the full schedule from the
    # loaded accumulators (the pending-draw flush is consistent: the
    # fold path's lagged draw is the carry's current position)
    for name in post_full.full_rhat:
        np.testing.assert_allclose(
            np.asarray(post_res.full_rhat[name]),
            np.asarray(post_full.full_rhat[name]),
            rtol=1e-6, err_msg=f"full_rhat[{name}]",
        )
