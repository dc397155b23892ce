"""Golden tests: resize vs torch F.interpolate; blur/classmix behavior."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cmda_tpu.ops.resize import resize_bilinear, resize_nearest
from cmda_tpu.ops.augment import (
    sample_class_half, class_mix_mask, one_mix, gaussian_blur,
    reference_blur_kernel_size, color_jitter, cow_masks,
)


def test_bilinear_matches_torch_align_false():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 13, 17, 4)).astype(np.float32)
    for size in [(26, 34), (52, 68), (7, 9), (13, 17)]:
        oracle = F.interpolate(torch.as_tensor(x).permute(0, 3, 1, 2),
                               size=size, mode="bilinear",
                               align_corners=False).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_bilinear_align_corners_true():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    for size in [(16, 16), (5, 7)]:
        oracle = F.interpolate(torch.as_tensor(x).permute(0, 3, 1, 2),
                               size=size, mode="bilinear",
                               align_corners=True).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize_bilinear(jnp.asarray(x), size, align_corners=True))
        np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_nearest_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 19, size=(1, 11, 13)).astype(np.float32)
    for size in [(22, 26), (6, 7), (33, 39)]:
        oracle = F.interpolate(torch.as_tensor(x)[:, None], size=size,
                               mode="nearest")[:, 0].numpy()
        ours = np.asarray(resize_nearest(jnp.asarray(x), size))
        np.testing.assert_allclose(ours, oracle)


def test_class_mix_semantics():
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray(np.array([
        [[0, 0, 1, 1], [2, 2, 3, 3], [4, 4, 255, 255], [5, 5, 6, 6]],
    ], dtype=np.int32))
    selected = sample_class_half(rng, labels)
    n_present = 8  # 7 classes + 255
    assert selected.shape == (1, 20)
    assert int(jnp.sum(selected)) == n_present // 2
    mask = class_mix_mask(labels, selected)
    # every pixel whose class is selected must be masked
    sel_ids = np.where(np.asarray(selected)[0])[0]
    ids = list(range(19)) + [255]
    lbl = np.asarray(labels)
    expect = np.isin(lbl, [ids[i] for i in sel_ids])
    np.testing.assert_array_equal(np.asarray(mask), expect)


def test_class_mix_per_sample_subsets():
    """Subsets are drawn independently per sample (ref dacs_transforms.py:101-110)
    while the present-set uses the whole batch (the torch.unique quirk)."""
    # batch of 4 samples; classes 0..5 present only via sample 0, others
    # carry a single class each -> present-set must still be the batch union
    lbl = np.full((4, 8, 8), 7, dtype=np.int32)
    lbl[0, :, :4] = np.arange(4)[:, None].repeat(2, 0).reshape(8, 1)[:8, :]
    lbl[0, 0, :6] = [0, 1, 2, 3, 4, 5]
    labels = jnp.asarray(lbl)
    selected = sample_class_half(jax.random.PRNGKey(7), labels)
    assert selected.shape == (4, 20)
    present = np.isin(np.arange(19).tolist() + [255], np.unique(lbl))
    sel = np.asarray(selected)
    # each sample selects ceil(n_present/2) ids, all from the batch present-set
    n_present = int(present.sum())
    k = (n_present + n_present % 2) // 2
    assert (sel.sum(axis=1) == k).all()
    assert not sel[:, ~present].any()
    # with 7 present ids and C(7, 4)=35 subsets, 4 iid draws almost surely
    # differ; check across several keys to make flakiness impossible
    diverse = False
    for seed in range(5):
        s = np.asarray(sample_class_half(jax.random.PRNGKey(seed), labels))
        if len({tuple(row) for row in s}) > 1:
            diverse = True
            break
    assert diverse, "per-sample subsets never differ within a batch"


def test_class_mix_distribution_matches_torch_oracle():
    """Marginal P(class selected) matches the reference get_class_masks."""
    lbl = np.zeros((2, 16, 16), dtype=np.int32)
    lbl[0] = np.random.default_rng(0).integers(0, 5, size=(16, 16))
    lbl[1] = np.random.default_rng(1).integers(3, 8, size=(16, 16))
    labels = jnp.asarray(lbl)

    # torch oracle: re-derived from dacs_transforms.py:101-117
    t_lbl = torch.as_tensor(lbl)
    n_trials = 400
    t_counts = np.zeros((2, 8))
    rng_np = np.random.default_rng(42)
    for _ in range(n_trials):
        classes_all = torch.unique(t_lbl)
        n = classes_all.shape[0]
        for b in range(2):
            choice = rng_np.choice(n, int((n + n % 2) / 2), replace=False)
            chosen = classes_all[torch.as_tensor(choice).long()]
            for c in chosen.numpy():
                t_counts[b, c] += 1

    j_counts = np.zeros((2, 8))
    for t in range(n_trials):
        s = np.asarray(sample_class_half(jax.random.PRNGKey(t), labels))
        j_counts += s[:, :8]

    # every present class has equal marginal selection prob = k/n
    np.testing.assert_allclose(j_counts / n_trials, t_counts / n_trials,
                               atol=0.1)


def test_one_mix_blend():
    src = jnp.ones((1, 4, 4, 3))
    tgt = jnp.zeros((1, 4, 4, 3))
    mask = jnp.asarray(np.array([[[1, 1, 0, 0]] * 4], dtype=np.float32))
    out = np.asarray(one_mix(mask, src, tgt))
    assert out[0, 0, 0, 0] == 1.0 and out[0, 0, 3, 0] == 0.0


def test_blur_kernel_size_rule():
    # reference formula at dacs_transforms.py:85-92; H=W=512 -> 51
    assert reference_blur_kernel_size(512) == 51
    assert reference_blur_kernel_size(400) == 39


def test_gaussian_blur_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    sigma = 0.8
    k = 7
    half = (k - 1) // 2
    xs = np.arange(-half, half + 1, dtype=np.float32)
    w1d = np.exp(-0.5 * (xs / sigma) ** 2)
    w1d = w1d / w1d.sum()
    xt = torch.as_tensor(x).permute(0, 3, 1, 2)
    xt = F.pad(xt, (0, 0, half, half), mode="reflect")
    xt = F.conv2d(xt, torch.as_tensor(w1d)[None, None, :, None].repeat(3, 1, 1, 1), groups=3)
    xt = F.pad(xt, (half, half, 0, 0), mode="reflect")
    xt = F.conv2d(xt, torch.as_tensor(w1d)[None, None, None, :].repeat(3, 1, 1, 1), groups=3)
    oracle = xt.permute(0, 2, 3, 1).numpy()
    ours = np.asarray(gaussian_blur(jnp.asarray(x), jnp.asarray(sigma), (k, k)))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_color_jitter_stays_in_range():
    rng = jax.random.PRNGKey(1)
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
    out = color_jitter(rng, img, strength=0.2)
    assert out.shape == img.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # zero-strength jitter is (nearly) identity
    out0 = color_jitter(rng, img, strength=0.0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(img), atol=1e-4)


def test_cow_masks_proportions():
    rng = jax.random.PRNGKey(3)
    masks = cow_masks(rng, 4, 64, 64)
    assert masks.shape == (4, 64, 64)
    props = np.asarray(jnp.mean(masks.astype(jnp.float32), axis=(1, 2)))
    assert np.all(props > 0.02) and np.all(props < 1.0)


def test_phase_upsample_matches_resize_values_and_grads():
    # the fixed-phase elementwise upsample (docs/PERF.md fused-resize
    # lever) must match jax.image.resize-backed resize_bilinear to float
    # roundoff, values AND gradients, incl. anisotropic factors
    from cmda_tpu.ops.resize import phase_upsample_bilinear
    rng = np.random.default_rng(3)
    for shape, size in [((2, 8, 8, 5), (32, 32)),   # x4 (the loss path)
                        ((1, 7, 5, 3), (14, 20)),   # x2 / x4 anisotropic
                        ((2, 4, 6, 2), (4, 18)),    # H identity, W x3
                        ((1, 3, 3, 1), (9, 9))]:    # odd factor
        x = rng.normal(size=shape).astype(np.float32)
        ref = np.asarray(resize_bilinear(jnp.asarray(x), size))
        got = np.asarray(phase_upsample_bilinear(jnp.asarray(x), size))
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-6)

        def loss_ref(z):
            return jnp.sum(jnp.sin(resize_bilinear(z, size)))

        def loss_phase(z):
            return jnp.sum(jnp.sin(phase_upsample_bilinear(z, size)))

        g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
        g_phase = np.asarray(jax.grad(loss_phase)(jnp.asarray(x)))
        np.testing.assert_allclose(g_phase, g_ref, atol=2e-6, rtol=1e-6)


def test_fused_upsample_toggle_routes_resize_bilinear(monkeypatch):
    from cmda_tpu.ops import resize as R
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 6, 6, 2)).astype(np.float32))
    base = np.asarray(R.resize_bilinear(x, (24, 24)))
    # Count phase_upsample_bilinear invocations: the fused and fallback
    # paths agree to roundoff, so numerics alone can't detect the routing
    # condition silently rotting (ADVICE r2).
    calls = []
    real_phase = R.phase_upsample_bilinear
    monkeypatch.setattr(R, "phase_upsample_bilinear",
                        lambda *a, **k: calls.append(a[1])
                        or real_phase(*a, **k))
    R.set_fused_int_upsample(True)
    try:
        fused = np.asarray(R.resize_bilinear(x, (24, 24)))
        # non-integer target still takes the jax.image.resize fallback
        frac = np.asarray(R.resize_bilinear(x, (9, 9)))
    finally:
        R.set_fused_int_upsample(False)
    assert calls == [(24, 24)], (
        "fused path must be taken exactly for the integer-factor case")
    np.testing.assert_allclose(fused, base, atol=2e-6, rtol=1e-6)
    oracle = F.interpolate(torch.as_tensor(np.asarray(x)).permute(0, 3, 1, 2),
                           size=(9, 9), mode="bilinear",
                           align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(frac, oracle, atol=1e-4)
