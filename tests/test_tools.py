"""Work-dir / checkpoint / log tooling tests (host-side, no model compile)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.checkpoint_tools import publish, convert, rename_work_dirs
from tools.analyze_logs import load_log, series, cal_train_time, plot_curve


@pytest.fixture()
def fake_ckpt(tmp_path):
    import orbax.checkpoint as ocp
    tree = {
        "step": np.int32(40000),
        "params": {"backbone": {"w": np.ones((4, 4), np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros(4, np.float32)}},
        "ema_params": {"backbone": {"w": np.full((4, 4), 2.0, np.float32)}},
        "opt_state": {"mu": {"backbone": {"w": np.zeros((4, 4), np.float32)}}},
    }
    path = tmp_path / "iter_40000"
    ocp.PyTreeCheckpointer().save(str(path), tree, force=True)
    return str(path)


def test_publish_strips_teacher_and_opt(fake_ckpt, tmp_path):
    out = publish(fake_ckpt, str(tmp_path / "published"))
    assert "-" in os.path.basename(out)  # content-hash suffix
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(out)
    assert set(tree) == {"params", "batch_stats", "step"}
    np.testing.assert_array_equal(tree["params"]["backbone"]["w"],
                                  np.ones((4, 4)))


def test_convert_keeps_student_only(fake_ckpt, tmp_path):
    out = convert(fake_ckpt, str(tmp_path / "student"))
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(out)
    assert set(tree) == {"params", "batch_stats"}


def test_rename_work_dirs(tmp_path):
    root = tmp_path / "work_dirs"
    wd = root / "20260816_cs2dsec"
    (wd / "test_results_4000_51.20").mkdir(parents=True)
    (wd / "test_results_40000_60.05").mkdir()
    done = root / "older_run[59.00]"
    done.mkdir()
    renamed = rename_work_dirs(str(root))
    assert len(renamed) == 1
    assert renamed[0].endswith("20260816_cs2dsec[60.05]")
    assert done.exists()  # already-scored dirs untouched


@pytest.fixture()
def fake_log(tmp_path):
    path = tmp_path / "x.log.json"
    recs = [
        {"env": {}, "config": "tiny", "max_iters": 10},
        {"loss": 5.0, "iter": 1, "time": 30.0, "data_time": 0.2},
        {"loss": 4.0, "iter": 2, "time": 1.0, "data_time": 0.1},
        {"loss": 3.5, "iter": 3, "time": 1.2, "data_time": 0.1},
        {"iter": 4, "eval": {"mIoU": 0.42, "aAcc": 0.8}},
    ]
    path.write_text("\n".join(json.dumps(r) for r in recs))
    return str(path)


def test_log_series_and_train_time(fake_log):
    records = load_log(fake_log)
    its, vals = series(records, "loss")
    assert its == [1, 2, 3] and vals[0] == 5.0
    its, vals = series(records, "mIoU")
    assert its == [4] and vals == [0.42]
    stats = cal_train_time(fake_log)
    assert stats["n_records"] == 3
    assert abs(stats["mean_iter_time_s"] - 1.1) < 1e-9
    assert stats["first_iter_time_s"] == 30.0


def test_plot_curve_writes_png(fake_log, tmp_path):
    out = plot_curve([fake_log], ["loss", "mIoU"],
                     out=str(tmp_path / "c.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_submission_export_tree(tmp_path):
    """Reference-exact DarkZurich server layout (reference
    tools/test.py:198-219): labelTrainIds/ + labelTrainIds_invalid/ (a
    copy) + confidence/ (uint16 all-65535), each 1920x1080, original
    rgb_anon basenames."""
    from types import SimpleNamespace
    import jax
    from PIL import Image
    from cmda_tpu import config as C
    from cmda_tpu.data.dark_zurich import DarkZurichDataset
    from cmda_tpu.uda.dacs import DACSTrainer
    from tools.make_fake_corpus import fabricate_dark_zurich
    from tools.test import export_submission

    root = fabricate_dark_zurich(str(tmp_path / "dz"), n_images=3,
                                 size=(128, 96))
    cfg = C.tiny_test_config(
        model=C.replace(C.tiny_test_config().model,
                        train_type="cs2dz_image+raw-isr"))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dataset = DarkZurichDataset(root, split="test",
                                image_resize_size=(128, 96),
                                isr_params=C.IsrParams(),
                                outputs=("image", "isr"))
    out = tmp_path / "submit"
    for output_type in ("image", "fusion"):
        args = SimpleNamespace(show_dir=str(out / output_type),
                               use_teacher=False, max_samples=None,
                               output_type=output_type)
        export_submission(trainer, state, dataset, args, cfg, batch_size=2)
        for sub in ("labelTrainIds", "labelTrainIds_invalid", "confidence"):
            d = out / output_type / sub
            names = sorted(os.listdir(d))
            assert len(names) == 3 and all(
                n.endswith("_rgb_anon.png") for n in names)
            im = Image.open(d / names[0])
            assert im.size == (1920, 1080)
            arr = np.asarray(im)
            if sub == "confidence":
                assert arr.dtype == np.uint16 and (arr == 65535).all()
            else:
                assert arr.dtype == np.uint8 and arr.max() < 19
        a = np.asarray(Image.open(
            out / output_type / "labelTrainIds" / names[1]))
        b = np.asarray(Image.open(
            out / output_type / "labelTrainIds_invalid" / names[1]))
        assert (a == b).all()
    # image-only vs fusion must exercise different streams (different jits)


def test_single_image_inference_api(tmp_path):
    """init_segmentor + inference_segmentor on one PNG (reference
    mmseg/apis/inference.py): on-the-fly ISR for image-only input,
    non-/32 sizes padded and cropped back, panel written."""
    from PIL import Image
    from cmda_tpu.apis import init_segmentor, inference_segmentor

    g = np.random.default_rng(0)
    img_path = tmp_path / "night.png"
    Image.fromarray(g.integers(0, 255, (90, 130, 3)).astype(np.uint8)).save(
        img_path)

    seg = init_segmentor("tiny", overrides=[
        "model.train_type=cs2dz_image+raw-isr"])
    # cs2dz default stream is 'image' (reference encoder_decoder.py:914-918)
    assert seg.output == "image"
    seg2 = init_segmentor("tiny", overrides=[
        "model.train_type=cs2dz_image+raw-isr"], output="fusion")
    panel = tmp_path / "panel.png"
    pred = inference_segmentor(seg2, str(img_path), out_file=str(panel))
    assert pred.shape == (90, 130) and pred.dtype == np.int32
    assert 0 <= pred.min() and pred.max() < 19
    assert panel.exists()
    # image-only stream needs no second modality
    pred_img = inference_segmentor(seg2, str(img_path), second=None)
    assert pred_img.shape == (90, 130)


def test_export_model_roundtrip(tmp_path):
    """AOT serving export (tools/export_model.py): trace + serialize the
    inference forward with jax.export, reload WITHOUT model code, and
    match the live forward bit-for-bit on the pred and to 1e-4 on logits."""
    import argparse
    import jax.numpy as jnp
    from tools import export_model as EM

    art = str(tmp_path / "artifact")
    args = argparse.Namespace(
        artifact=art, config="tiny", checkpoint=None, torch_checkpoint=None,
        output=None, image_only=False, batch=1, height=32, width=32,
        platforms="cpu", set=None, verify=True)
    EM.build_export(args)   # --verify asserts live == artifact internally
    assert (tmp_path / "artifact" / "fn.stablehlo").exists()
    meta = json.loads((tmp_path / "artifact" / "meta.json").read_text())
    assert meta["input_shape"] == [1, 32, 32, 3]
    assert meta["num_classes"] == 19 and len(meta["classes"]) == 19

    # run-mode entry: deserialize + call on random inputs
    logits, pred = EM.load_and_call(
        art, np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, 32, 32, 3), np.float32))
    assert logits.shape == (1, 32, 32, 19) and pred.shape == (1, 32, 32)


def test_stream_infer_prefetcher_and_event_rate(tmp_path):
    """tools/stream_infer.py plumbing: the ordered prefetcher must emit
    strictly in index order across racing threads, and event_counts must
    recover finish-start windows from images_to_events_index.txt."""
    import time as _time
    from tools.stream_infer import OrderedPrefetcher, event_counts

    class Jittery:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            _time.sleep(0.001 * ((i * 7) % 5))   # scramble completion order
            return {"i": i}

    got = [s["i"] for s in OrderedPrefetcher(Jittery(40), 40, workers=4)]
    assert got == list(range(40))

    # errors surface to the consumer instead of hanging the stream
    class Boom(Jittery):
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("bad frame")
            return {"i": i}

    with pytest.raises(ValueError, match="bad frame"):
        list(OrderedPrefetcher(Boom(8), 8, workers=2))

    # event window accounting: index txt maps frame -> cumulative event idx
    seq = tmp_path / "seq" / "images" / "left" / "rectified"
    seq.mkdir(parents=True)
    np.savetxt(tmp_path / "seq" / "images" / "images_to_events_index.txt",
               np.array([0, 100, 250, 450]), fmt="%d")
    rows = np.array([[str(seq / "000001.png"), "0"],
                     [str(seq / "000003.png"), "0"]])
    assert event_counts(rows, 1) == [100, 200]
    assert event_counts(rows[1:], 2) == [350]


def test_stream_infer_main_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/stream_infer.py main(): full serving circuit on the fabricated
    DSEC corpus — threaded decode -> voxel/ISR -> tiny fusion forward ->
    ordered PNG writes — for both wire dtypes. The bfloat16 transfer path
    (--transfer-dtype, a host-link bandwidth lever: docs/PERF.md streaming
    section) must produce predictions that overwhelmingly agree with the
    float32 path (argmax can flip only near exact logit ties)."""
    from PIL import Image
    from tools import stream_infer as SI
    from tools.make_fake_corpus import fabricate_dsec_with_labels

    # events_per_window * n_frames must exceed the fabricator's 65536-row
    # h5 chunk shape
    _, test_txt = fabricate_dsec_with_labels(
        str(tmp_path / "dsec"), n_frames=5, events_per_window=15000)
    txt = os.path.join(str(tmp_path / "dsec"), "night_dataset_warp.txt")

    # main() ends in os._exit (TPU-client teardown hang guard); in-process
    # we want a catchable exit instead.
    monkeypatch.setattr(os, "_exit", sys.exit)

    results = {}
    for wire in ("float32", "bfloat16"):
        out_dir = tmp_path / f"preds_{wire}"
        monkeypatch.setattr(sys, "argv", [
            "stream_infer.py", "--target-txt", txt, "--config", "tiny",
            "--batch", "2", "--workers", "2", "--transfer-dtype", wire,
            "--out-dir", str(out_dir)])
        with pytest.raises(SystemExit):
            SI.main()
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")][-1]
        results[wire] = json.loads(line)
        pngs = sorted(out_dir.glob("*_labelTrainIds.png"))
        assert len(pngs) == results[wire]["frames"]
        preds = np.stack([np.asarray(Image.open(p)) for p in pngs])
        assert preds.shape[1:] == (440, 640) and preds.max() < 19
        results[wire]["preds"] = preds

    for r in results.values():
        assert r["fps"] > 0 and r["frames"] == 4  # 5 frames - 1 (idx >= 1)
    agree = (results["float32"]["preds"]
             == results["bfloat16"]["preds"]).mean()
    assert agree > 0.8, f"wire-dtype prediction agreement only {agree:.2%}"
