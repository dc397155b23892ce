"""Dataset-preparation tool tests on fabricated corpora."""
import json
import os

import numpy as np
import h5py
from PIL import Image

from tools.convert_datasets.cityscapes import (
    class_stats, save_class_stats, convert_one, LABELID_TO_TRAINID)
from tools.create_dsec_dataset_txt import (
    build_images_to_events_index, build_dataset_txt)
from tools.create_cityscapes_image_change import image_change
from cmda_tpu.utils.visualization import (
    colorize_label, show_result, save_debug_grid)


def test_labelid_remap_and_stats(tmp_path):
    g = np.random.default_rng(0)
    lid = np.zeros((32, 32), np.uint8)
    lid[:16] = 7    # road -> 0
    lid[16:] = 26   # car -> 13
    src = tmp_path / "x_labelIds.png"
    Image.fromarray(lid).save(src)
    dst = convert_one(str(src))
    lbl = np.asarray(Image.open(dst))
    assert set(np.unique(lbl)) == {0, 13}
    stats = class_stats(dst)
    assert stats[0] == 16 * 32 and stats[13] == 16 * 32
    save_class_stats(str(tmp_path), [stats])
    swc = json.load(open(tmp_path / "samples_with_class.json"))
    assert "0" in swc and swc["0"][0][1] == 512


def test_images_to_events_index(tmp_path):
    n = 10000
    t = np.sort(np.random.default_rng(0).integers(0, 2_000_000, n)).astype(np.int64)
    ev_path = tmp_path / "events.h5"
    with h5py.File(ev_path, "w") as f:
        f["events/t"] = t
        f["t_offset"] = np.int64(100)
        ms = np.searchsorted(t, np.arange(0, 2001) * 1000, "left")
        f["ms_to_idx"] = ms.astype(np.int64)
    ts_path = tmp_path / "timestamps.txt"
    stamps = np.asarray([50, 500_100, 1_000_100, 5_000_000], np.int64)
    np.savetxt(ts_path, stamps, fmt="%d")
    out = build_images_to_events_index(str(ts_path), str(ev_path),
                                       str(tmp_path / "idx.txt"))
    assert out[0] == -1 and out[3] == -1  # out of range
    # index points at the last event <= timestamp
    for k, stamp in [(1, 500_000), (2, 1_000_000)]:
        i = out[k]
        assert t[i] <= stamp and (i + 1 >= n or t[i + 1] > stamp)


def test_build_dataset_txt(tmp_path):
    seq = tmp_path / "zurich_city_09_b"
    (seq / "images" / "left" / "rectified").mkdir(parents=True)
    (seq / "warp_images").mkdir()
    (seq / "labels").mkdir()
    idx = np.arange(10) * 100
    np.savetxt(seq / "images" / "images_to_events_index.txt", idx, fmt="%d")
    for i in range(10):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            seq / "warp_images" / f"{i:06d}.png")
    for i in (8, 9):
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(
            seq / "labels" / f"zurich_city_09_b_{i:06d}_grey_gtFine_labelTrainIds.png")
    rows = build_dataset_txt(str(tmp_path), str(tmp_path / "train.txt"),
                             labels_range={"09_b": (0, 7)})
    # frames 0,1 dropped (image_change_num), 0-7 dropped (labeled range)
    assert len(rows) == 2 and "000008.png" in rows[0]
    rows_t = build_dataset_txt(str(tmp_path), str(tmp_path / "test.txt"),
                               labels_txt=True)
    assert len(rows_t) == 2


def test_image_change_range():
    g = np.random.default_rng(1)
    a = g.integers(0, 256, (32, 32)).astype(np.uint8)
    b = g.integers(0, 256, (32, 32)).astype(np.uint8)
    ic = image_change(b, a)
    assert ic.dtype == np.uint8 and ic.shape == (32, 32)


def test_visualization_helpers(tmp_path):
    g = np.random.default_rng(2)
    label = g.integers(0, 19, (16, 16)).astype(np.int32)
    label[0, 0] = 255
    col = colorize_label(label)
    assert col.shape == (16, 16, 3) and tuple(col[0, 0]) == (0, 0, 0)
    img = g.normal(size=(16, 16, 3)).astype(np.float32)
    panel = show_result(img, label, gt=label,
                        events=g.normal(size=(16, 16, 3)).astype(np.float32),
                        out_path=str(tmp_path / "p" / "0.png"))
    assert panel.shape == (16, 64, 3)
    path = save_debug_grid(str(tmp_path / "dbg"), 7,
                           {"row1": [col, col], "row2": [col, col]})
    assert os.path.exists(path)
    # opacity blend (reference base.py:241-248): the pred cell becomes
    # img*(1-op) + colors*op instead of the bare color map
    blended = show_result(img, label, opacity=0.5)
    assert blended.shape == (16, 32, 3)
    from cmda_tpu.utils.visualization import denorm_to_uint8
    expect = (denorm_to_uint8(img).astype(np.float32) * 0.5
              + col.astype(np.float32) * 0.5).astype(np.uint8)
    np.testing.assert_array_equal(blended[:, 16:], expect)
