"""Train-type variant smoke tests: raw-isr_split, raw-isr_no-fusion (edge),
d2n-isr, and the image-only OrgDACS trainer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.config import tiny_test_config, replace
from cmda_tpu.uda.dacs import DACSTrainer
from cmda_tpu.uda.org_dacs import OrgDACSTrainer
from cmda_tpu.uda.transforms import seg_label_to_edge_label
from tests.test_dacs import synth_batch


def cz_cfg(train_type, **uda_kw):
    cfg = tiny_test_config()
    model_kw = dict(train_type=train_type, fusion="", fusion_isr="")
    if train_type == "cs2dz_image+raw-isr_split":
        model_kw["split_cls"] = True
    if train_type == "cs2dz_image+raw-isr_no-fusion":
        model_kw.update(split_cls=True, events_classes=2)
    return replace(cfg, model=replace(cfg.model, **model_kw),
                   uda=replace(cfg.uda, **uda_kw))


def test_split_type_step():
    cfg = cz_cfg("cs2dz_image+raw-isr_split")
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    new_state, logs = trainer.train_step(state, synth_batch(0, with_events=False),
                                         jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    assert "src/loss_events" in logs and "mix/loss_image" in logs


def test_nofusion_edge_type_step():
    cfg = cz_cfg("cs2dz_image+raw-isr_no-fusion", isr_edge=True,
                 lambda_isr_features=1.0)
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    new_state, logs = trainer.train_step(state, synth_batch(1, with_events=False),
                                         jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["loss"]))
    assert "mix/loss_feat_consis" in logs


def test_d2n_type_step():
    cfg = cz_cfg("cs2dz_image+d2n-isr")
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = synth_batch(2, with_events=False)
    g = np.random.default_rng(9)
    batch["target"]["day_image"] = jnp.asarray(
        g.normal(size=(2, 64, 64, 3)).astype(np.float32))
    batch["target"]["day_isr"] = jnp.asarray(
        np.clip(g.normal(size=(2, 64, 64, 3)), -1, 1).astype(np.float32))
    new_state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["loss"]))


def test_org_dacs_image_only():
    cfg = tiny_test_config()
    cfg = replace(cfg, model=replace(cfg.model, train_type="cs2dz_image",
                                     fusion="", fusion_isr=""))
    trainer = OrgDACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = synth_batch(3, with_events=False)
    new_state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert np.any(np.asarray(p0) != np.asarray(p1))


def test_edge_label_semantics():
    lbl = np.zeros((1, 8, 8), np.int32)
    lbl[0, :, 4:] = 3
    edge = np.asarray(seg_label_to_edge_label(jnp.asarray(lbl)))
    # boundary columns flagged, interior not
    assert edge[0, 2, 0] == 0 and edge[0, 2, 7] == 0
    assert edge[0, 2, 4] == 1 or edge[0, 2, 3] == 1
    # ignore regions suppress edges
    lbl[0, :, :2] = 255
    edge2 = np.asarray(seg_label_to_edge_label(jnp.asarray(lbl)))
    assert edge2[0, 4, 1] == 0
