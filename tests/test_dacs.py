"""DACS fused train-step smoke tests (tiny model, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.config import tiny_test_config, replace
from cmda_tpu.uda.dacs import DACSTrainer


def synth_batch(rng, b=2, h=64, w=64, with_events=True):
    ks = np.random.default_rng(rng)

    def img():
        return jnp.asarray(ks.normal(size=(b, h, w, 3)).astype(np.float32))

    label = ks.integers(0, 19, size=(b, h, w)).astype(np.int32)
    label[ks.random(size=label.shape) < 0.05] = 255
    src = {"image": img(), "img_self_res": img(), "label": jnp.asarray(label)}
    tgt = {"image": img(), "isr": img()}
    if with_events:
        src["img_time_res"] = img()
        tgt["events"] = img()
    return {"source": src, "target": tgt}


@pytest.fixture(scope="module")
def together_setup():
    cfg = tiny_test_config()
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


def test_train_step_runs_and_updates(together_setup):
    trainer, state = together_setup
    step = trainer.jit_train_step(donate=False)
    batch = synth_batch(0)
    new_state, logs = step(state, batch, jax.random.PRNGKey(42))
    assert int(new_state.step) == 1
    assert np.isfinite(float(logs["loss"]))
    assert 0.0 <= float(logs["pseudo_weight"]) <= 1.0
    # params moved
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert np.any(np.asarray(p0) != np.asarray(p1))
    # step 0: alpha=0 -> teacher == pre-update student
    e1 = jax.tree.leaves(new_state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(p0), atol=1e-7)

    # second step: teacher becomes a blend, loss still finite
    state2, logs2 = step(new_state, synth_batch(1), jax.random.PRNGKey(42))
    assert np.isfinite(float(logs2["loss"]))
    e2 = jax.tree.leaves(state2.ema_params)[0]
    assert np.any(np.asarray(e2) != np.asarray(jax.tree.leaves(state2.params)[0]))


def test_all_stream_losses_present(together_setup):
    trainer, state = together_setup
    _, logs = trainer.train_step(state, synth_batch(2), jax.random.PRNGKey(1))
    for key in ["src/loss_image", "src/loss_events", "src/loss_fusion",
                "src/loss_isr", "mix/loss_seg", "src/acc_seg"]:
        assert key in logs, sorted(logs)


def test_cs2dz_rawisr_step():
    cfg = tiny_test_config()
    cfg = replace(cfg, model=replace(cfg.model, train_type="cs2dz_image+raw-isr",
                                     fusion="attention", fusion_isr=""),
                  uda=replace(cfg.uda,
                              loss_weight_image=0.7, loss_weight_events=0.7,
                              loss_weight_fusion=0.7,
                              pseudo_weight_ignore_top=4,
                              pseudo_weight_ignore_bottom=8))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = synth_batch(3, with_events=False)
    new_state, logs = trainer.train_step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(logs["loss"]))
    assert "src/loss_events" in logs and "src/loss_isr" not in logs


def test_grads_flow_to_both_backbones(together_setup):
    """Both backbones + fusion + head must receive nonzero grads."""
    trainer, state = together_setup
    batch = synth_batch(4)

    new_state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(3))
    for mod in ["backbone_image", "backbone_events", "fusion_module",
                "decode_head"]:
        before = jax.tree.leaves(state.params[mod])
        after = jax.tree.leaves(new_state.params[mod])
        changed = any(np.any(np.asarray(a) != np.asarray(b))
                      for a, b in zip(before, after))
        assert changed, f"no update in {mod}"
