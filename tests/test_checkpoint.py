"""Checkpoint / resume: a resumed run continues bitwise-identically
(the fault-injection / restart-recovery test of SURVEY.md section 5.3/5.4)."""

import numpy as np

import jax

from nestmc import RunConfig, SamplerConfig, sample
from nestmc.checkpoint import latest_tag, load_checkpoint, save_checkpoint
from nestmc.kernels.state import init_kernel_state
from nestmc.models import make_eight_schools


def test_resume_is_bitwise_identical(tmp_path):
    model, data = make_eight_schools()
    ckdir = str(tmp_path / "ck")

    cfg_full = SamplerConfig(
        run=RunConfig(
            chains=6, warmup=40, draws=40, seed=5, segment_size=20,
            checkpoint_dir=ckdir, checkpoint_every=1,
            log_every_segment=False,
        ),
    )
    full = sample(model, data, cfg_full)

    # "crash" after the first sampling segment; resume from its checkpoint
    template = init_kernel_state(
        model, cfg_full, jax.random.key(cfg_full.run.seed), data
    )
    carry, meta = load_checkpoint(ckdir, "sample_000001", template)
    assert meta["phase"] == "sample" and meta["draws_done"] == 20

    cfg_resume = SamplerConfig(
        run=RunConfig(
            chains=6, warmup=40, draws=20, seed=5, segment_size=20,
            log_every_segment=False,
        ),
    )
    resumed = sample(
        model, data, cfg_resume, init_state=carry, skip_warmup=True
    )

    for k in full.draws:
        np.testing.assert_array_equal(
            np.asarray(full.draws[k][:, 20:]),
            np.asarray(resumed.draws[k]),
            err_msg=f"resumed draws differ for {k}",
        )


def test_latest_tag_prefers_sample_phase(tmp_path):
    d = str(tmp_path)
    x = {"a": np.zeros(3)}
    save_checkpoint(d, "warmup_000002", x, {"phase": "warmup"})
    save_checkpoint(d, "sample_000001", x, {"phase": "sample"})
    assert latest_tag(d) == "sample_000001"


def test_checkpoint_shape_validation(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, "t", {"a": np.zeros(3)}, {})
    try:
        load_checkpoint(d, "t", {"a": np.zeros(4)})
        raise AssertionError("expected shape mismatch error")
    except ValueError as e:
        assert "shape" in str(e)
