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
                 lambda_isr_features=1.0, isr_edge_class_weight=0.9)
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


def test_isr_another_fusion_together():
    """ISR-coin steps route fusion through fusion_isr (ref dacs.py:499-507).

    Runs EAGER (disable_jit): the lax.cond of two full grad graphs takes
    >20 min to compile on this CPU, while eager execution is ~5 min — the
    numerics are identical."""
    from cmda_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    # without_isd forces the ISR branch deterministically
    cfg_v = replace(cfg, uda=replace(cfg.uda, isr_another_fusion=True,
                                     without_events=True))
    trainer = DACSTrainer(cfg_v)
    state = trainer.init_state(jax.random.PRNGKey(0))
    with jax.disable_jit():
        new_state, logs = trainer.train_step(state, synth_batch(5),
                                             jax.random.PRNGKey(5))
    assert np.isfinite(float(logs["loss"]))
    assert float(logs["use_events"]) == 0.0
    # the fusion_isr module must receive grads on the ISR branch
    before = jax.tree.leaves(state.params["fusion_isr_module"])
    after = jax.tree.leaves(new_state.params["fusion_isr_module"])
    assert any(np.any(np.asarray(a) != np.asarray(b))
               for a, b in zip(before, after)), \
        "fusion_isr_module got no grads on the ISR branch"


def test_isr_no_fusion_gates_fusion_loss():
    from cmda_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    cfg = replace(cfg, model=replace(cfg.model,
                                     train_type="cs2dsec_image+events"),
                  uda=replace(cfg.uda, isr_no_fusion=True, without_events=True))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    with jax.disable_jit():
        _, logs = trainer.train_step(state, synth_batch(6),
                                     jax.random.PRNGKey(6))
    assert np.isfinite(float(logs["loss"]))
    # ISR branch chosen -> gated fusion weight: loss excludes the fusion term
    total = float(logs["src/loss_seg"])
    no_fusion_sum = (0.5 * float(logs["src/loss_image"])
                     + 0.5 * float(logs["src/loss_events"]))
    assert abs(total - no_fusion_sum) < 1e-4


def test_shift_3_channel_and_isr_noise():
    from cmda_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    cfg = replace(cfg, uda=replace(cfg.uda, shift_3_channel=True,
                                   isr_noise_dacs_type="noise+blur"))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    _, P = trainer._prepare(state, synth_batch(7), jax.random.PRNGKey(8))
    assert P["mixed_isr"].shape[-1] == 3
    assert float(jnp.max(jnp.abs(P["mixed_isr"]))) <= 1.0 + 1e-5
    # the 3 channels are a repeat of the degraded channel 0 (ref :753-755)
    np.testing.assert_array_equal(np.asarray(P["mixed_isr"][..., 0]),
                                  np.asarray(P["mixed_isr"][..., 1]))
    with jax.disable_jit():
        _, logs = trainer.train_step(state, synth_batch(7),
                                     jax.random.PRNGKey(8))
    assert np.isfinite(float(logs["loss"]))


def test_deflare_teacher_inputs():
    cfg = cz_cfg("cs2dz_image+raw-isr", deflare_aug=True)
    cfg = replace(cfg, model=replace(cfg.model, fusion="attention"))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = synth_batch(8, with_events=False)
    g = np.random.default_rng(11)
    batch["target"]["image_deflare"] = jnp.asarray(
        g.normal(size=(2, 64, 64, 3)).astype(np.float32))
    batch["target"]["isr_deflare"] = jnp.asarray(
        np.clip(g.normal(size=(2, 64, 64, 3)), -1, 1).astype(np.float32))
    with jax.disable_jit():
        _, logs = trainer.train_step(state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(logs["loss"]))
    # deflared teacher inputs change the pseudo-labels
    batch2 = {**batch, "target": dict(batch["target"])}
    batch2["target"]["image_deflare"] = batch["target"]["image"]
    batch2["target"]["isr_deflare"] = batch["target"]["isr"]
    _, P1 = trainer._prepare(state, batch, jax.random.PRNGKey(9))
    _, P2 = trainer._prepare(state, batch2, jax.random.PRNGKey(9))
    assert np.any(np.asarray(P1["pseudo_label"]) != np.asarray(P2["pseudo_label"]))


def test_debug_tensors_snapshot():
    from cmda_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dbg = trainer.debug_tensors(state, synth_batch(9), jax.random.PRNGKey(10))
    for k in ("day_image", "night_image", "mixed_img", "day_label",
              "pseudo_label", "mixed_lbl", "masks", "pseudo_weight",
              "mixed_weight", "mixed_isr"):
        assert k in dbg, k
    assert dbg["mixed_img"].shape == dbg["day_image"].shape
    assert dbg["masks"].dtype == jnp.bool_ or dbg["masks"].dtype == np.bool_


def test_isr_mix_aug_transforms_mixed_isr():
    """isr_mix_aug: the class-mixed ISR gets the image jitter draw in the
    (x+1)/2 domain (reference dacs.py:757-758, dacs_transforms.py:11-35);
    off = plain one_mix. Same rng -> same masks, only the aug differs."""
    base = cz_cfg("cs2dz_image+raw-isr_split", mixed_image_to_mixed_isr=False,
                  color_jitter_probability=0.0, blur=False)
    batch = synth_batch(11, with_events=False)
    with jax.disable_jit():
        t_off = DACSTrainer(base)
        s_off = t_off.init_state(jax.random.PRNGKey(0))
        off = t_off.debug_tensors(s_off, batch, jax.random.PRNGKey(5))
        t_on = DACSTrainer(replace(base, uda=replace(base.uda,
                                                     isr_mix_aug=True)))
        s_on = t_on.init_state(jax.random.PRNGKey(0))
        on = t_on.debug_tensors(s_on, batch, jax.random.PRNGKey(5))
    assert np.array_equal(np.asarray(off["masks"]), np.asarray(on["masks"]))
    assert not np.allclose(np.asarray(off["mixed_isr"]),
                           np.asarray(on["mixed_isr"]))
    # jitter in the (x+1)/2 domain keeps the ISR in a sane range
    assert np.asarray(on["mixed_isr"]).min() >= -1.5
    assert np.asarray(on["mixed_isr"]).max() <= 1.5


def test_dacs_image_trainer():
    """Source-only ISR trainer (reference dacs_image.py) — loss decreases
    over a few eager steps on a fixed batch."""
    from cmda_tpu.uda.dacs_image import DACSImageTrainer
    from cmda_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    trainer = DACSImageTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = synth_batch(10, with_events=False)
    losses = []
    with jax.disable_jit():
        for _ in range(3):
            state, logs = trainer.train_step(state, batch,
                                             jax.random.PRNGKey(2))
            losses.append(float(logs["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert int(state.step) == 3


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


def test_teacher_bf16_pseudo_label_parity():
    """uda.teacher_bf16 (perf lever: bf16-cast EMA weights for the pure-
    inference teacher forward) must leave the pseudo-label decision
    essentially unchanged: logits within bf16 rounding of the f32 teacher
    and argmax agreement well above the confidence threshold's bite."""
    from cmda_tpu.config import micro_test_config
    from cmda_tpu.uda.transforms import pseudo_label_and_weight

    cfg32 = micro_test_config()
    cfg16 = replace(cfg32, uda=replace(cfg32.uda, teacher_bf16=True))
    t32, t16 = DACSTrainer(cfg32), DACSTrainer(cfg16)
    state = t32.init_state(jax.random.PRNGKey(0))

    g = np.random.default_rng(0)
    h, w = cfg32.data.crop_size
    img = jnp.asarray(g.normal(size=(2, h, w, 3)).astype(np.float32))
    ev = jnp.asarray(g.normal(size=(2, h, w, 3)).astype(np.float32))

    with jax.disable_jit():
        lg32 = t32._teacher_logits(state, img, ev, None, "default")
        lg16 = t16._teacher_logits(state, img, ev, None, "default")
    a, b = (np.asarray(lg32["fusion_output"]),
            np.asarray(lg16["fusion_output"]))
    # bf16 has ~3 decimal digits; activations here are O(1)
    assert np.max(np.abs(a - b)) < 0.15 * max(1.0, np.max(np.abs(a)))
    pl32, pw32 = pseudo_label_and_weight(lg32["fusion_output"])
    pl16, pw16 = pseudo_label_and_weight(lg16["fusion_output"])
    agree = float(np.mean(np.asarray(pl32) == np.asarray(pl16)))
    assert agree > 0.95, agree
    assert abs(float(pw32[0, 0, 0]) - float(pw16[0, 0, 0])) < 0.05


def test_pallas_ce_step_parity(monkeypatch):
    """Full DACS step with the uda.pallas_ce phase kernels vs the XLA path:
    same state/batch/rng => same losses and pseudo-weights (float-roundoff).
    The lane-efficiency geometry gate is bypassed so the tiny CPU config
    exercises the kernels (interpret mode engages automatically off-TPU)."""
    from cmda_tpu.uda import transforms as T

    cfg = tiny_test_config()
    batch = synth_batch(0)
    rng = jax.random.PRNGKey(7)

    def run(pallas):
        t = DACSTrainer(cfg)
        state = t.init_state(jax.random.PRNGKey(0))
        if pallas:
            monkeypatch.setattr(T, "pallas_ce_supported", lambda *a: True)
            monkeypatch.setattr(T, "supported_geometry", lambda *a: True)
            monkeypatch.setattr(t, "_pallas_ce", lambda: True)
        with jax.disable_jit():
            _, logs = t.train_step(state, batch, rng)
        monkeypatch.undo()
        return logs

    ref, pal = run(False), run(True)
    assert set(ref) == set(pal)
    for k in ref:
        np.testing.assert_allclose(np.asarray(pal[k]), np.asarray(ref[k]),
                                   rtol=2e-3, atol=1e-4, err_msg=k)
