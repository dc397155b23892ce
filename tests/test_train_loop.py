"""End-to-end training-shell test: tiny config + synthetic data, a few
iterations, eval, checkpoint save/restore."""
import json
import os

import numpy as np
import jax

from cmda_tpu.config import tiny_test_config, replace
from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
from cmda_tpu.data.uda import UDAPairDataset
from cmda_tpu.train.loop import (
    TrainLoop, evaluate_fusion, save_checkpoint, load_checkpoint)


def test_train_loop_end_to_end(tmp_path):
    cfg = tiny_test_config()
    cfg = replace(cfg, eval_interval=3, checkpoint_interval=3, log_interval=1)
    src = SyntheticSource(crop_size=(64, 64), length=8)
    tgt = SyntheticTarget(crop_size=(64, 64), length=8)
    val = SyntheticTarget(crop_size=(64, 64), length=2, test_mode=True)
    dataset = UDAPairDataset(src, tgt, seed=0)
    loop = TrainLoop(cfg, dataset=dataset, val_dataset=val,
                     work_dir=str(tmp_path / "run"), num_workers=1)
    state = loop.run(max_iters=3)
    assert int(state.step) == 3
    # log file written with loss records + eval record
    records = [json.loads(l) for l in open(loop.log_path)]
    assert any("loss" in r for r in records)
    evals = [r for r in records if "eval" in r]
    assert evals and 0.0 <= evals[0]["eval"]["mIoU"] <= 1.0
    # code snapshot
    assert os.path.exists(os.path.join(loop.work_dir, "code.tar.gz"))
    # checkpoint round-trip
    ckpt = os.path.join(loop.work_dir, "iter_3")
    assert os.path.exists(ckpt)
    fresh = loop.trainer.init_state(jax.random.PRNGKey(0))
    restored = load_checkpoint(fresh, ckpt)
    assert int(restored.step) == 3
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_evaluate_fusion_shapes():
    cfg = tiny_test_config()
    from cmda_tpu.uda.dacs import DACSTrainer
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    val = SyntheticTarget(crop_size=(64, 64), length=2, test_mode=True)
    summary = evaluate_fusion(trainer, state, val)
    assert "mIoU" in summary and "mIoU_18cls" in summary
    assert len(summary["per_class_iou"]) == 19


def test_evaluate_fusion_aug_test():
    """--aug-test TTA grid (reference tools/test.py:118-123): the averaged
    multi-scale+flip path produces a valid summary, and slide+aug_test is
    rejected."""
    import pytest
    cfg = tiny_test_config()
    from cmda_tpu.uda.dacs import DACSTrainer
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    val = SyntheticTarget(crop_size=(64, 64), length=1, test_mode=True)
    summary = evaluate_fusion(trainer, state, val, aug_test=True)
    assert 0.0 <= summary["mIoU"] <= 1.0
    with pytest.raises(ValueError):
        evaluate_fusion(trainer, state, val, aug_test=True,
                        inference="slide")
