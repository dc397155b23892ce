"""Work-dir / checkpoint / log tooling tests (host-side, no model compile)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.checkpoint_tools import publish, convert, rename_work_dirs
from tools.analyze_logs import load_log, series, cal_train_time, plot_curve


@pytest.fixture()
def fake_ckpt(tmp_path):
    import orbax.checkpoint as ocp
    tree = {
        "step": np.int32(40000),
        "params": {"backbone": {"w": np.ones((4, 4), np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
        "ema_params": {"backbone": {"w": np.full((4, 4), 2.0, np.float32)}},
        "opt_state": {"mu": {"backbone": {"w": np.zeros((4, 4), np.float32)}}},
    }
    path = tmp_path / "iter_40000"
    ocp.PyTreeCheckpointer().save(str(path), tree, force=True)
    return str(path)


def test_publish_strips_teacher_and_opt(fake_ckpt, tmp_path):
    out = publish(fake_ckpt, str(tmp_path / "published"))
    assert "-" in os.path.basename(out)  # content-hash suffix
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(out)
    assert set(tree) == {"params", "batch_stats", "step"}
    np.testing.assert_array_equal(tree["params"]["backbone"]["w"],
                                  np.ones((4, 4)))


def test_convert_keeps_student_only(fake_ckpt, tmp_path):
    out = convert(fake_ckpt, str(tmp_path / "student"))
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(out)
    assert set(tree) == {"params", "batch_stats"}


def test_rename_work_dirs(tmp_path):
    root = tmp_path / "work_dirs"
    wd = root / "20260816_cs2dsec"
    (wd / "test_results_4000_51.20").mkdir(parents=True)
    (wd / "test_results_40000_60.05").mkdir()
    done = root / "older_run[59.00]"
    done.mkdir()
    renamed = rename_work_dirs(str(root))
    assert len(renamed) == 1
    assert renamed[0].endswith("20260816_cs2dsec[60.05]")
    assert done.exists()  # already-scored dirs untouched


@pytest.fixture()
def fake_log(tmp_path):
    path = tmp_path / "x.log.json"
    recs = [
        {"env": {}, "config": "tiny", "max_iters": 10},
        {"loss": 5.0, "iter": 1, "time": 30.0, "data_time": 0.2},
        {"loss": 4.0, "iter": 2, "time": 1.0, "data_time": 0.1},
        {"loss": 3.5, "iter": 3, "time": 1.2, "data_time": 0.1},
        {"iter": 4, "eval": {"mIoU": 0.42, "aAcc": 0.8}},
    ]
    path.write_text("\n".join(json.dumps(r) for r in recs))
    return str(path)


def test_log_series_and_train_time(fake_log):
    records = load_log(fake_log)
    its, vals = series(records, "loss")
    assert its == [1, 2, 3] and vals[0] == 5.0
    its, vals = series(records, "mIoU")
    assert its == [4] and vals == [0.42]
    stats = cal_train_time(fake_log)
    assert stats["n_records"] == 3
    assert abs(stats["mean_iter_time_s"] - 1.1) < 1e-9
    assert stats["first_iter_time_s"] == 30.0


def test_plot_curve_writes_png(fake_log, tmp_path):
    out = plot_curve([fake_log], ["loss", "mIoU"],
                     out=str(tmp_path / "c.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 0
