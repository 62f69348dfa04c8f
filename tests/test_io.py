"""Native C++ CSV ingest == Python loader, plus error paths."""

import numpy as np
import pytest

from nestmc.io import load_csv
from nestmc.io.build import native_lib

RNG = np.random.default_rng(3)


def _write_csv(path, G=50, p=3, max_n=20):
    rows = []
    for g in range(G):
        n = RNG.integers(1, max_n + 1)
        for _ in range(n):
            x = RNG.normal(size=p)
            y = float(RNG.integers(0, 2))
            rows.append(
                f"{g * 7 + 3},{y}," + ",".join(f"{v:.6f}" for v in x)
            )
    path.write_text("\n".join(rows) + "\n")
    return len(rows), G


def test_native_builds():
    assert native_lib() is not None, "g++ build of native ingest failed"


def test_native_matches_python(tmp_path):
    f = tmp_path / "d.csv"
    n_rows, G = _write_csv(f)
    a = load_csv(str(f), native=True)
    b = load_csv(str(f), native=False)
    assert a.num_obs == n_rows == b.num_obs
    assert a.num_groups == G == b.num_groups
    np.testing.assert_allclose(np.asarray(a.y), np.asarray(b.y))
    np.testing.assert_allclose(
        np.asarray(a.x), np.asarray(b.x), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(a.segment_ids), np.asarray(b.segment_ids)
    )


def test_no_covariates(tmp_path):
    f = tmp_path / "d.csv"
    f.write_text("1,0.5\n1,1.5\n2,2.5\n")
    d = load_csv(str(f), native=True)
    assert d.x is None and d.num_groups == 2 and d.num_obs == 3
    np.testing.assert_allclose(np.asarray(d.y), [0.5, 1.5, 2.5])


def test_parse_error_reports_line(tmp_path):
    f = tmp_path / "bad.csv"
    f.write_text("1,0.5,1.0\n1,abc,2.0\n")
    with pytest.raises(ValueError, match="line 2"):
        load_csv(str(f), native=True)


def test_ragged_column_count_rejected(tmp_path):
    f = tmp_path / "bad.csv"
    f.write_text("1,0.5,1.0\n1,0.5\n")
    with pytest.raises(ValueError):
        load_csv(str(f), native=True)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        load_csv("/definitely/not/here.csv", native=True)


def test_end_to_end_sampling_from_csv(tmp_path):
    import jax

    from nestmc import RunConfig, SamplerConfig, sample
    from nestmc.models import make_hier_logistic

    f = tmp_path / "d.csv"
    _write_csv(f, G=12, p=2, max_n=8)
    data = load_csv(str(f))
    model = make_hier_logistic(data)
    post = sample(model, data, SamplerConfig(run=RunConfig(
        chains=4, warmup=30, draws=30, log_every_segment=False,
        collect={"mu": None},
    )))
    assert np.all(np.isfinite(np.asarray(post.draws["mu"])))
