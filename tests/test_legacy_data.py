"""Legacy dataset loaders (GTA/SYNTHIA/ACDC/Cityscapes-server) + converters."""
import json
import os
import random
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmda_tpu.data.legacy import (
    GTADataset, SynthiaDataset, ACDCDataset, CityscapesDataset,
    TRAINID_TO_LABELID)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gta_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("gta")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    g = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(g.integers(0, 255, (128, 256, 3), np.uint8).astype(
            np.uint8)).save(root / "images" / f"{i:05d}.png")
        # labelIds PNG (GTA uses Cityscapes ids)
        lbl = g.choice([7, 8, 11, 26, 0], size=(128, 256)).astype(np.uint8)
        Image.fromarray(lbl, mode="L").save(root / "labels" / f"{i:05d}.png")
    return str(root)


def test_gta_converter_and_dataset(gta_root):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_datasets",
                                      "gta.py"), gta_root],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(gta_root, "samples_with_class.json"))
    lbl = np.asarray(Image.open(
        os.path.join(gta_root, "labels", "00000_labelTrainIds.png")))
    assert set(np.unique(lbl)) <= {0, 1, 2, 13, 255}

    ds = GTADataset(gta_root, image_resize_size=(256, 128),
                    image_crop_size=(96, 96))
    assert len(ds) == 2
    s = ds.load(0, rng=random.Random(0))
    assert s["image"].shape == (96, 96, 3)
    assert s["label"].shape == (96, 96)


def test_synthia_converter_and_dataset(tmp_path):
    import cv2
    root = tmp_path / "synthia"
    (root / "RGB").mkdir(parents=True)
    (root / "GT" / "LABELS").mkdir(parents=True)
    g = np.random.default_rng(1)
    Image.fromarray(g.integers(0, 255, (64, 96, 3), np.uint8).astype(
        np.uint8)).save(root / "RGB" / "x.png")
    # SYNTHIA: 16-bit 3-channel PNG, class id in the LAST channel as read
    # by cv2 IMREAD_UNCHANGED (BGR order -> last channel = red = id)
    ids = g.choice([3, 4, 2, 1, 0], size=(64, 96)).astype(np.uint16)
    png = np.zeros((64, 96, 3), np.uint16)
    png[..., 2] = ids  # cv2 writes BGR; [..., -1] on read returns this
    cv2.imwrite(str(root / "GT" / "LABELS" / "x.png"), png)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_datasets",
                                      "synthia.py"), str(root)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lbl = np.asarray(Image.open(root / "GT" / "LABELS" /
                                "x_labelTrainIds.png"))
    # 3->0 road, 4->1 sidewalk, 2->2 building, 1->10 sky, 0->255
    assert set(np.unique(lbl)) <= {0, 1, 2, 10, 255}

    ds = SynthiaDataset(str(root), image_resize_size=(96, 64),
                        image_crop_size=(48, 48))
    assert len(ds) == 1
    s = ds.load(0, rng=random.Random(1))
    assert s["image"].shape == (48, 48, 3)


def test_dataset_wrappers(gta_root):
    from cmda_tpu.data.legacy import RepeatDataset, ConcatDataset
    ds = GTADataset(gta_root, image_resize_size=(256, 128),
                    image_crop_size=(96, 96))
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 3 * len(ds)
    s = rep.load(len(ds) + 1, rng=random.Random(0))
    assert s["image"].shape == (96, 96, 3)
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 2 * len(ds)
    assert cat.load(len(ds), rng=random.Random(0))["label"].shape == (96, 96)


def test_acdc_and_cityscapes_format_results(tmp_path):
    # ACDC night layout
    root = tmp_path / "acdc"
    img_dir = root / "rgb_anon" / "night" / "train" / "seq1"
    gt_dir = root / "gt" / "night" / "train" / "seq1"
    img_dir.mkdir(parents=True), gt_dir.mkdir(parents=True)
    g = np.random.default_rng(2)
    Image.fromarray(g.integers(0, 255, (64, 96, 3), np.uint8).astype(
        np.uint8)).save(img_dir / "a_rgb_anon.png")
    Image.fromarray(g.integers(0, 19, (64, 96), np.uint8).astype(
        np.uint8), mode="L").save(gt_dir / "a_gt_labelTrainIds.png")
    ds = ACDCDataset(str(root), split="train", image_resize_size=(96, 64),
                     image_crop_size=(48, 48))
    assert len(ds) == 1
    assert ds.load(0, rng=random.Random(0))["label"].shape == (48, 48)

    # Cityscapes format_results: trainId -> labelId server PNGs
    cs = tmp_path / "cs"
    d = cs / "leftImg8bit" / "val" / "frankfurt"
    d.mkdir(parents=True)
    Image.fromarray(g.integers(0, 255, (64, 96, 3), np.uint8).astype(
        np.uint8)).save(d / "frankfurt_000000_000294_leftImg8bit.png")
    ds2 = CityscapesDataset(str(cs), split="val")
    pred = np.zeros((64, 96), np.uint8)
    pred[0, 0] = 13  # car trainId -> labelId 26
    out = ds2.format_results([pred], str(tmp_path / "submit"))
    assert len(out) == 1
    arr = np.asarray(Image.open(out[0]))
    assert arr[0, 0] == 26 and arr[1, 1] == TRAINID_TO_LABELID[0] == 7
