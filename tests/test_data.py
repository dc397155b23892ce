"""Data-layer tests: host/device ISR & voxel equality, dataset geometry on
fabricated corpora, RCS, pairing, loader."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from cmda_tpu.config import IsrParams
from cmda_tpu.data.host_isr import host_image_change, normalize_image
from cmda_tpu.data.dsec import (
    DSECDataset, host_voxel_grid, host_events_norm, _bilinear_resize_np)
from cmda_tpu.data.cityscapes_ic import CityscapesICDataset
from cmda_tpu.data.dark_zurich import DarkZurichDataset
from cmda_tpu.data.uda import UDAPairDataset, rcs_class_probs
from cmda_tpu.data.loader import PrefetchLoader, collate
from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
from cmda_tpu.ops.isr import image_change_from_gray
from cmda_tpu.ops.voxel import events_to_voxel_grid, events_norm


ISR = IsrParams(val_range=(0.01, 1.01), threshold=0.005, clip_range=0.1,
                shift_pixel=1)


def test_host_isr_matches_device_isr():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    pil = Image.fromarray(rgb)
    host = host_image_change(pil, val_range=ISR.val_range,
                             threshold=ISR.threshold,
                             clip_range=ISR.clip_range, shift_pixel=1,
                             shift_direction="rightdown")
    gray = np.array(pil.convert("L"), np.float32)
    dev = image_change_from_gray(jnp.asarray(gray), val_range=ISR.val_range,
                                 threshold=ISR.threshold,
                                 clip_range=ISR.clip_range, shift_pixel=1,
                                 shift_direction="rightdown")
    np.testing.assert_allclose(host, np.asarray(dev), atol=2e-3)


def test_host_voxel_matches_device():
    rng = np.random.default_rng(1)
    n = 400
    t = np.sort(rng.random(n)).astype(np.float32)
    x = (rng.random(n) * 63).astype(np.float32)
    y = (rng.random(n) * 47).astype(np.float32)
    p = rng.integers(0, 2, n).astype(np.float32)
    host = host_voxel_grid(t, x, y, p, 64, 48, 2)
    dev = events_to_voxel_grid(jnp.asarray(t), jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(p), jnp.asarray(n),
                               width=64, height=48, num_bins=2)
    np.testing.assert_allclose(host, np.asarray(dev), atol=1e-3)
    hn = host_events_norm(host, 0.5)
    dn = events_norm(jnp.asarray(host), 0.5)
    np.testing.assert_allclose(hn, np.asarray(dn), atol=1e-4)


# ---------------- fabricated corpora ----------------

@pytest.fixture(scope="module")
def cityscapes_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs")
    g = np.random.default_rng(0)
    city = root / "leftImg8bit" / "train" / "zurich"
    ic = root / "leftImg8bit_IC1" / "train" / "zurich"
    gt = root / "gtFine" / "train" / "zurich"
    for d in (city, ic, gt):
        d.mkdir(parents=True)
    for i in range(2):
        name = f"zurich_{i:06d}_000019_leftImg8bit.png"
        Image.fromarray(g.integers(0, 255, (128, 256, 3), np.uint8).astype(np.uint8)).save(city / name)
        Image.fromarray(g.integers(0, 255, (128, 256), np.uint8).astype(np.uint8)).save(
            ic / (name.replace("leftImg8bit", "leftImg8bit_IC1")[:-8] + ".png"))
        lbl = g.integers(0, 19, (128, 256), np.uint8).astype(np.uint8)
        Image.fromarray(lbl).save(
            gt / (name.replace("leftImg8bit", "gtFine")[:-4] + "_labelTrainIds.png"))
    return str(root) + "/"


def test_cityscapes_ic_dataset(cityscapes_root):
    ds = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR, shift_type="random")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (96, 96, 3)
    assert s["img_time_res"].shape == (96, 96, 3)
    assert s["img_self_res"].shape == (96, 96, 3)
    assert s["label"].shape == (96, 96) and s["label"].dtype == np.int32
    assert np.abs(s["img_self_res"]).max() <= 1.0


def test_cityscapes_ic_gray_image_mode(cityscapes_root):
    """return_GI_or_IC='gray_image': img_time_res is the grayscale frame
    itself (reference cityscapes_ic.py:201-205)."""
    ds = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR,
        return_gi_or_ic="gray_image")
    s = ds.load(0, crop_xy=(0, 0), flip=False)
    assert s["img_time_res"].shape == (96, 96, 3)
    # equals the normalized grayscale of the frame, not the IC1 PNG
    from PIL import Image
    img = Image.open(ds.files[0]).convert("L").resize(
        (256, 128), resample=Image.BILINEAR).crop((0, 0, 96, 96))
    want = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(s["img_time_res"][..., 0], want)


@pytest.fixture(scope="module")
def dsec_root(tmp_path_factory):
    import h5py
    root = tmp_path_factory.mktemp("dsec")
    seq = root / "zurich_city_09_a"
    img_dir = seq / "images" / "left" / "rectified"
    warp_dir = seq / "warp_images"
    ev_dir = seq / "events" / "left"
    lbl_dir = seq / "labels"
    for d in (img_dir, warp_dir, ev_dir, lbl_dir):
        d.mkdir(parents=True)
    g = np.random.default_rng(0)
    n_events = 5000
    with h5py.File(ev_dir / "events.h5", "w") as f:
        f["events/t"] = np.sort(g.integers(0, 10 ** 6, n_events)).astype(np.int64)
        f["events/x"] = g.integers(0, 640, n_events).astype(np.uint16)
        f["events/y"] = g.integers(0, 480, n_events).astype(np.uint16)
        f["events/p"] = g.integers(0, 2, n_events).astype(np.uint8)
    with h5py.File(ev_dir / "rectify_map.h5", "w") as f:
        yy, xx = np.mgrid[0:480, 0:640]
        f["rectify_map"] = np.stack([xx, yy], axis=-1).astype(np.float32)
    for i in range(3):
        arr = g.integers(0, 255, (480, 640, 3), np.uint8).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")
        Image.fromarray(arr).save(warp_dir / f"{i:06d}.png")
        lbl = g.integers(0, 19, (480, 640), np.uint8).astype(np.uint8)
        Image.fromarray(lbl).save(
            lbl_dir / f"zurich_city_09_a_{i:06d}_grey_gtFine_labelTrainIds.png")
    # lives under images/ (reference dsec.py:292 path construction)
    np.savetxt(seq / "images" / "images_to_events_index.txt",
               np.asarray([100, 2500, 4900]), fmt="%d")
    txt = root / "night_dataset_warp.txt"
    rows = [f"{img_dir}/{i:06d}.png {0}" for i in (1, 2)]
    txt.write_text("\n".join(rows))
    return str(txt)


def test_dsec_dataset_train(dsec_root):
    ds = DSECDataset(dsec_root, events_bins=1, crop_size=(400, 400),
                     after_crop_resize_size=(512, 512), isr_params=ISR,
                     outputs=("image", "events", "isr"))
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (512, 512, 3)
    assert s["events"].shape == (512, 512, 3)
    assert s["isr"].shape == (512, 512, 3)
    assert np.abs(s["events"]).max() <= 1.0 + 1e-6


def test_dsec_dataset_test_mode(dsec_root):
    ds = DSECDataset(dsec_root, events_bins=1, isr_params=ISR, test_mode=True,
                     outputs=("image", "events", "label"))
    s = ds[1]
    assert s["image"].shape == (440, 640, 3)
    assert s["events"].shape == (440, 640, 3)
    assert s["label"].shape == (440, 640)


@pytest.fixture(scope="module")
def darkzurich_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dz")
    g = np.random.default_rng(0)
    night = root / "rgb_anon" / "train" / "night" / "GOPR0351"
    val = root / "rgb_anon" / "val" / "night" / "GOPR0356"
    gt = root / "gt" / "val" / "night" / "GOPR0356"
    for d in (night, val, gt):
        d.mkdir(parents=True)
    for i in range(2):
        Image.fromarray(g.integers(0, 255, (540, 960, 3), np.uint8).astype(np.uint8)).save(
            night / f"GOPR0351_frame_{i:06d}_rgb_anon.png")
    Image.fromarray(g.integers(0, 255, (1080, 1920, 3), np.uint8).astype(np.uint8)).save(
        val / "GOPR0356_frame_000001_rgb_anon.png")
    Image.fromarray(g.integers(0, 19, (1080, 1920), np.uint8).astype(np.uint8)).save(
        gt / "GOPR0356_frame_000001_gt_labelTrainIds.png")
    return str(root) + "/"


def test_darkzurich_train_and_val(darkzurich_root):
    isr = IsrParams(val_range=(1, 100), threshold=0.01, clip_range=0.1,
                    shift_pixel=3)
    tr = DarkZurichDataset(darkzurich_root, split="train", isr_params=isr,
                           outputs=("image", "isr"))
    s = tr[0]
    assert s["image"].shape == (512, 512, 3) and s["isr"].shape == (512, 512, 3)
    va = DarkZurichDataset(darkzurich_root, split="val", isr_params=isr,
                           outputs=("image", "isr", "label"))
    v = va[0]
    assert v["image"].shape == (540, 960, 3)
    assert v["label"].shape == (540, 960)


def test_darkzurich_shift_3_channel(darkzurich_root):
    """3-channel multi-scale night ISR: one channel per parameter row,
    fixed rightdown direction (reference dark_zurich_ic.py:232-240)."""
    from cmda_tpu.config import DZ_ISR_PRESETS_3
    rows = DZ_ISR_PRESETS_3["night"]
    tr = DarkZurichDataset(darkzurich_root, split="train", isr_params=rows,
                           shift_3_channel=True, outputs=("image", "isr"))
    s = tr[0]
    assert s["isr"].shape == (512, 512, 3)
    # different shift_pixel / clip per channel -> distinct channels
    assert not np.allclose(s["isr"][..., 0], s["isr"][..., 2])
    # each channel equals a single-row dataset's ISR contract
    assert s["isr"].min() >= -1.0 and s["isr"].max() <= 1.0


def test_darkzurich_auto_threshold_rejected(darkzurich_root):
    """auto_threshold raises in the reference itself (utils.py:124-125)."""
    with pytest.raises(NotImplementedError):
        DarkZurichDataset(darkzurich_root, split="train",
                          isr_params=IsrParams(), auto_threshold=True)


# ---------------- RCS + pairing + loader ----------------

def test_rcs_class_probs():
    stats = {"a.png": {"0": 1000, "1": 10}, "b.png": {"1": 10}}
    classes, probs = rcs_class_probs(stats, temperature=0.01)
    assert list(classes) == [0, 1]
    assert probs[1] > probs[0]  # rare class upweighted
    assert abs(probs.sum() - 1.0) < 1e-9


def test_uda_pair_and_loader():
    src = SyntheticSource(crop_size=(64, 64), length=8)
    tgt = SyntheticTarget(crop_size=(64, 64), length=8)
    pair = UDAPairDataset(src, tgt, seed=0)
    sample = pair[0]
    assert set(sample) == {"source", "target"}
    loader = PrefetchLoader(pair, batch_size=2, num_workers=2, prefetch=2)
    batch = next(loader)
    assert batch["source"]["image"].shape == (2, 64, 64, 3)
    assert batch["target"]["events"].shape == (2, 64, 64, 3)
    loader.close()


def test_loader_deterministic_per_seed(dsec_root):
    """Per-worker rng threading: same seed => identical sample stream, and
    no draw touches the global random module (race-free)."""
    import random as _random
    ds = DSECDataset(dsec_root, events_bins=1, crop_size=(400, 400),
                     after_crop_resize_size=(128, 128), isr_params=ISR,
                     outputs=("image", "isr"))
    state_before = _random.getstate()
    a = ds.load(0, rng=_random.Random(123))
    b = ds.load(0, rng=_random.Random(123))
    c = ds.load(0, rng=_random.Random(124))
    assert _random.getstate() == state_before, "global RNG was touched"
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["isr"], b["isr"])
    assert not np.array_equal(a["image"], c["image"])  # different crop/flip

    # multi-worker loaders with equal seeds replay the same batch STREAM
    # (round-robin delivery, independent of thread scheduling)
    src = SyntheticSource(crop_size=(32, 32), length=8)
    tgt = SyntheticTarget(crop_size=(32, 32), length=8)
    pair = UDAPairDataset(src, tgt, seed=0)
    l1 = PrefetchLoader(pair, batch_size=2, num_workers=3, prefetch=2, seed=7)
    l2 = PrefetchLoader(pair, batch_size=2, num_workers=3, prefetch=2, seed=7)
    for _ in range(5):
        b1, b2 = next(l1), next(l2)
        np.testing.assert_array_equal(b1["source"]["image"],
                                      b2["source"]["image"])
        np.testing.assert_array_equal(b1["target"]["image"],
                                      b2["target"]["image"])
    l1.close(), l2.close()


def test_source_augs_numpy():
    import random as _random
    from cmda_tpu.data.source_augs import (
        isr_noise_np, cow_mask_np, sky_mask_transform_np)
    g = np.random.default_rng(0)
    isr = np.clip(g.normal(size=(64, 64)), -1, 1).astype(np.float32)

    r = _random.Random(0)
    noisy = isr_noise_np(isr, r)
    assert noisy.shape == isr.shape and np.abs(noisy).max() <= 1.0
    assert not np.array_equal(noisy, isr)

    mask = cow_mask_np((64, 64), _random.Random(1))
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # prop_range (0.7, 0.7): masked fraction near 0.7
    assert 0.4 < mask.mean() < 0.95

    label = np.zeros((64, 64), np.int32)
    label[:24] = 10  # sky on top
    out = sky_mask_transform_np(isr, label, _random.Random(2))
    assert out.shape == isr.shape and np.abs(out).max() <= 1.0
    # sky region erased+noised, far-away pixels untouched
    assert np.any(out[:24] != isr[:24])
    np.testing.assert_array_equal(out[60:], isr[60:])
    # no sky -> identity
    np.testing.assert_array_equal(
        sky_mask_transform_np(isr, np.zeros_like(label), _random.Random(3)),
        isr)


def test_cityscapes_ic_source_aug_options(cityscapes_root):
    import random as _random
    # 3-channel multi-scale ISR + noise + cow mask
    triplet = [IsrParams((1.0, 10.0), 0.025, 0.05, 1),
               IsrParams((1.0, 10.0), 0.030, 0.20, 3),
               IsrParams((1.0, 10.0), 0.040, 0.32, 5)]
    ds = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=triplet, shift_3_channel=True,
        isr_noise=True, isr_cow_mask=True)
    s = ds.load(0, rng=_random.Random(0))
    assert s["img_self_res"].shape == (96, 96, 3)
    assert np.abs(s["img_self_res"]).max() <= 1.0
    # channels differ (different shift scales)
    assert not np.array_equal(s["img_self_res"][..., 0],
                              s["img_self_res"][..., 2])

    # sky-mask aug consumes the label even when not in outputs
    ds2 = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR, sky_mask=True,
        outputs=("image", "img_self_res"))
    s2 = ds2.load(0, rng=_random.Random(1))
    assert s2["img_self_res"].shape == (96, 96, 3)

    # high-resolution ISR: raw-frame ISR with 2x shift, nearest-downsampled
    ds3 = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR, high_resolution_isr=True,
        outputs=("image", "img_self_res"))
    s3 = ds3.load(0, rng=_random.Random(2))
    assert s3["img_self_res"].shape == (96, 96, 3)
    assert np.abs(s3["img_self_res"]).max() <= 1.0


def test_rcs_pairing_with_synthetic():
    src = SyntheticSource(crop_size=(64, 64), length=4)
    tgt = SyntheticTarget(crop_size=(64, 64), length=4)
    swc = {"5": [[f"synthetic_{i:06d}_gtFine_labelTrainIds.png", 5000]
                 for i in range(4)]}
    stats = {f"synthetic_{i:06d}": {"5": 5000, "0": 100000} for i in range(4)}
    pair = UDAPairDataset(src, tgt, rcs=True, samples_with_class=swc,
                          sample_class_stats=stats, min_pixels=10,
                          min_crop_ratio=0.5, seed=0)
    s = pair[0]
    assert "label" in s["source"]


def test_decode_cache_parity(cityscapes_root, dsec_root):
    """data/cache.py: with decode_cache on, repeated draws are bit-identical
    to the uncached datasets given the same per-draw RNG — the LRU only
    memoizes the decode+fixed-resize prefix, never the randomized suffix."""
    import random as pyrandom

    def draws(ds, n=4):
        out = []
        for i in range(n):
            r = pyrandom.Random(1000 + i)
            out.append(ds.load(i % len(ds), rng=r))
        return out

    cold = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR, shift_type="random")
    hot = CityscapesICDataset(
        cityscapes_root, image_resize_size=(256, 128),
        image_crop_size=(96, 96), isr_params=ISR, shift_type="random",
        decode_cache=16)
    for a, b in zip(draws(cold), draws(hot) and draws(hot)):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    cold = DSECDataset(dsec_root, events_bins=1, crop_size=(400, 400),
                       after_crop_resize_size=(512, 512), isr_params=ISR,
                       outputs=("image", "events", "isr"))
    hot = DSECDataset(dsec_root, events_bins=1, crop_size=(400, 400),
                      after_crop_resize_size=(512, 512), isr_params=ISR,
                      outputs=("image", "events", "isr"), decode_cache=16)
    for a, b in zip(draws(cold), draws(hot) and draws(hot)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_wire_codec_roundtrip():
    """encode_wire/decode_wire: bf16+mono+uint8 wire reconstructs the batch
    (exactly for labels and f32 passthrough; within bf16 eps for floats)."""
    import jax.numpy as jnp
    from cmda_tpu.data.wire import encode_wire, decode_wire
    g = np.random.default_rng(0)
    mono = g.normal(size=(2, 16, 16)).astype(np.float32)
    batch = {
        "source": {"image": g.normal(size=(2, 16, 16, 3)).astype(np.float32),
                   "label": g.integers(0, 19, (2, 16, 16)).astype(np.int32),
                   "img_self_res": np.broadcast_to(mono[..., None],
                                                   mono.shape + (3,))},
        "target": {"isr": np.broadcast_to(mono[..., None],
                                          mono.shape + (3,))},
    }
    enc = encode_wire(batch, pack=False)
    assert enc["source"]["label"].dtype == np.uint8
    # mono on the wire, marked EXPLICITLY in the key (decode never infers)
    assert enc["source"]["mono::3::img_self_res"].shape[-1] == 1
    assert str(enc["source"]["image"].dtype) == "bfloat16"
    dec = decode_wire({k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                       for k, v in enc.items()})
    assert np.array_equal(np.asarray(dec["source"]["label"]),
                          batch["source"]["label"])
    for grp, key in (("source", "image"), ("source", "img_self_res"),
                     ("target", "isr")):
        got, want = np.asarray(dec[grp][key]), np.asarray(batch[grp][key])
        assert got.shape == want.shape and got.dtype == np.float32
        assert np.abs(got - want).max() <= 2 ** -8 * np.abs(want).max() + 1e-6
    # packed form: floats concatenate into ONE self-describing tensor
    packed = encode_wire(batch)
    pk = [k for k in packed if str(k).startswith("packed::")]
    assert len(pk) == 1 and packed[pk[0]].shape[-1] == 3 + 1 + 1
    dec_p = decode_wire({k: (jnp.asarray(v) if not isinstance(v, dict)
                             else {kk: jnp.asarray(vv)
                                   for kk, vv in v.items()})
                         for k, v in packed.items()})
    for grp, key in (("source", "image"), ("source", "img_self_res"),
                     ("target", "isr")):
        got = np.asarray(dec_p[grp][key])
        want = np.asarray(batch[grp][key])
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 2 ** -8 * np.abs(want).max() + 1e-6
    assert np.array_equal(np.asarray(dec_p["source"]["label"]),
                          batch["source"]["label"])
    # un-encoded f32 batches pass through bit-identically (trace-time no-op)
    dec2 = decode_wire({"source": {"image": jnp.asarray(
        batch["source"]["image"])}})
    assert np.array_equal(np.asarray(dec2["source"]["image"]),
                          batch["source"]["image"])
    # a genuinely-1-channel stream under a historical mono key name must
    # NOT be broadcast (decode only transforms what the encoder marked)
    one_ch = jnp.asarray(mono[..., None])
    dec3 = decode_wire({"target": {"isr": one_ch}})
    assert np.asarray(dec3["target"]["isr"]).shape == one_ch.shape


def test_wire_mono_survives_collate():
    """ADVICE r4 (medium): the real loader path runs dataset samples
    through ``collate`` before ``encode_wire`` — the stride-0 mono
    structure must survive batching so the wire actually ships one
    channel (reference streams: dsec.py:368-372 isr/events,
    cityscapes_ic.py:239-241 img_self_res/img_time_res)."""
    import jax.numpy as jnp
    from cmda_tpu.data.loader import collate
    from cmda_tpu.data.wire import encode_wire, decode_wire
    g = np.random.default_rng(1)
    samples = []
    for _ in range(3):
        m = g.normal(size=(8, 8)).astype(np.float32)
        samples.append({
            "image": g.normal(size=(8, 8, 3)).astype(np.float32),
            "isr": np.broadcast_to(m[..., None], m.shape + (3,)),
            "label": g.integers(0, 19, (8, 8)).astype(np.int32),
        })
    batch = collate(samples)
    assert batch["isr"].shape == (3, 8, 8, 3)
    assert batch["isr"].strides[-1] == 0          # mono preserved
    assert batch["image"].strides[-1] != 0        # dense stays dense
    np.testing.assert_array_equal(batch["isr"][..., 0], batch["isr"][..., 2])
    enc = encode_wire({"target": batch})
    pk = [k for k in enc if str(k).startswith("packed::")]
    assert len(pk) == 1
    # packed tensor carries 3 (image) + 1 (mono isr) channels, not 6
    assert enc[pk[0]].shape[-1] == 4, pk[0]
    assert ":1>3" in pk[0]
    dec = decode_wire({k: (jnp.asarray(v) if not isinstance(v, dict)
                           else {kk: jnp.asarray(vv)
                                 for kk, vv in v.items()})
                       for k, v in enc.items()})
    assert np.asarray(dec["target"]["isr"]).shape == (3, 8, 8, 3)
    want = batch["isr"]
    got = np.asarray(dec["target"]["isr"])
    assert np.abs(got - want).max() <= 2 ** -8 * np.abs(want).max() + 1e-6
