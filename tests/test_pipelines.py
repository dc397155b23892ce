"""mmseg-style pipeline transforms (host side)."""
import random

import numpy as np
import pytest
from PIL import Image

from cmda_tpu.data.pipelines import (
    Compose, LoadImageFromFile, LoadAnnotations, Resize, RandomCrop,
    RandomFlip, PhotoMetricDistortion, Normalize, Pad, MultiScaleFlipAug)


@pytest.fixture()
def sample(tmp_path):
    g = np.random.default_rng(0)
    img = g.integers(0, 255, (64, 96, 3), np.uint8).astype(np.uint8)
    gt = g.integers(0, 19, (64, 96), np.uint8).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "img.png")
    Image.fromarray(gt, mode="L").save(tmp_path / "gt.png")
    return {"img_path": str(tmp_path / "img.png"),
            "gt_path": str(tmp_path / "gt.png")}


def test_train_pipeline(sample):
    pipe = Compose([
        LoadImageFromFile(), LoadAnnotations(),
        Resize(img_scale=(128, 96), ratio_range=(0.8, 1.2),
               keep_ratio=True),
        RandomCrop((48, 48), cat_max_ratio=0.75),
        RandomFlip(0.5),
        PhotoMetricDistortion(),
        Normalize(),
        Pad(size=(64, 64)),
    ])
    out = pipe(sample, rng=random.Random(0))
    assert out["img"].shape == (64, 64, 3)
    assert out["gt"].shape == (64, 64)
    assert out["gt"].dtype == np.int32
    # padded label rows carry the ignore index
    assert (out["gt"][-1] == 255).all()
    # deterministic per rng seed
    out2 = pipe(sample, rng=random.Random(0))
    np.testing.assert_array_equal(out["img"], out2["img"])
    out3 = pipe(sample, rng=random.Random(5))
    assert not np.array_equal(out["img"], out3["img"])


def test_random_crop_cat_max_ratio(sample):
    pipe = Compose([LoadImageFromFile(), LoadAnnotations()])
    s = pipe(sample, rng=random.Random(0))
    # uniform-ish gt: any crop passes; a single-class gt forces 10 redraws
    s["gt"] = np.zeros_like(s["gt"])
    crop = RandomCrop((32, 32), cat_max_ratio=0.75)
    s2 = dict(s, rng=random.Random(1))
    out = crop(s2)
    assert out["img"].shape[:2] == (32, 32)  # falls through after 10 tries


def test_multi_scale_flip_aug(sample):
    load = Compose([LoadImageFromFile(), LoadAnnotations()])
    s = load(sample, rng=random.Random(0))
    aug = MultiScaleFlipAug(img_scale=(96, 64), scales=(0.5, 1.0),
                            flip=True, transforms=[Normalize()])
    outs = aug(s, rng=random.Random(0))
    assert len(outs) == 4  # 2 scales x {no-flip, flip}
    assert outs[0]["img"].shape == (32, 48, 3)
    assert outs[2]["img"].shape == (64, 96, 3)
    assert outs[1]["meta"]["flip"] and not outs[0]["meta"]["flip"]
    np.testing.assert_allclose(outs[2]["img"][:, ::-1], outs[3]["img"],
                               atol=1e-5)