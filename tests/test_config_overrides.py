"""Config override surface: dotted --set paths + the reference-named
ablation flags (reference my_run_experiments.py:28-90 / mmcv --options)."""
import sys

import pytest

from cmda_tpu import config as C


def test_set_by_path_scalars_and_nesting():
    cfg = C.cs2dsec_image_events_b5()
    cfg = C.set_by_path(cfg, "uda.pseudo_threshold", "0.9")
    cfg = C.set_by_path(cfg, "optim.max_iters", "123")
    cfg = C.set_by_path(cfg, "uda.blur", "false")
    cfg = C.set_by_path(cfg, "model.head.embed_dim", "128")
    assert cfg.uda.pseudo_threshold == 0.9
    assert cfg.optim.max_iters == 123
    assert cfg.uda.blur is False
    assert cfg.model.head.embed_dim == 128


def test_set_by_path_tuples_unions_and_isr_params():
    cfg = C.cs2dsec_image_events_b5()
    cfg = C.apply_overrides(cfg, [
        "data.crop_size=400,400",
        "data.events_clip_range=0.8,1.2",
        "uda.isr_params=1-100-0.01-0.1-3",
        "uda.random_choice_thres=0.9-0.1",
        "model.share_decoder=none",
    ])
    assert cfg.data.crop_size == (400, 400)
    assert cfg.data.events_clip_range == (0.8, 1.2)
    assert cfg.uda.isr_params == C.IsrParams((1.0, 100.0), 0.01, 0.1, 3)
    assert cfg.uda.random_choice_thres == "0.9-0.1"   # schedule string
    assert cfg.model.share_decoder == "none"          # str field keeps literal


def test_set_by_path_unknown_key_raises():
    cfg = C.cs2dsec_image_events_b5()
    with pytest.raises(KeyError):
        C.set_by_path(cfg, "uda.not_a_field", "1")
    with pytest.raises(ValueError):
        C.apply_overrides(cfg, ["uda.alpha"])   # no '='


def _args(argv):
    sys.path.insert(0, "tools")
    import train as train_cli
    import argparse
    p = argparse.ArgumentParser()
    # mirror only what ablation_overrides reads
    train_cli.add_ablation_flags(p)
    return train_cli, p.parse_args(argv)


def test_ablation_flags_map_to_config():
    train_cli, args = _args([
        "--backbone", "mit_b3", "--fusion", "caf", "--no_share_decoder",
        "--feature_dist", "0.005", "--events_clip_range", "1.0",
        "--loss_weight_img_self_res", "0.4", "--no_plcrop",
        "--day_events_generate", "gi_wo_cyclegan",
        "--source_isr_parms", "1-100-0.02-0.2-5",
        "--isd_shift_type", "all", "--test_mode",
        "--train_size", "512-512",
    ])
    cfg = C.cs2dsec_image_events_b5()
    for path, val in train_cli.ablation_overrides(args):
        cfg = C.set_by_path(cfg, path, val)
    assert cfg.model.backbone == "mit_b3"
    assert cfg.model.fusion == "convert_avg"
    assert cfg.model.share_decoder == "none"
    assert cfg.uda.imnet_feature_dist_lambda == 0.005
    assert cfg.data.events_clip_range == (1.0, 1.0)
    assert cfg.uda.loss_weight_isr == 0.4
    assert cfg.uda.pseudo_weight_ignore_top == 0
    assert cfg.data.return_gi_or_ic == "gray_image"
    assert cfg.uda.use_cyclegan_day_events is False
    assert cfg.data.source_isr == C.IsrParams((1.0, 100.0), 0.02, 0.2, 5)
    assert cfg.uda.shift_type == "all" and cfg.data.shift_type == "all"
    assert cfg.eval_interval == 5 and cfg.debug_img_interval == 3
    # --train_size 512-512 keeps the DSEC pre-resize crop at 440
    # (reference my_run_experiments.py:221-224)
    assert cfg.data.crop_size == (512, 512)
    assert cfg.data.target_crop_size == (440, 440)


def test_isr_variant_flags_map_to_config():
    """isr_edge lambda / edge class weight / isr_mix_aug / data-type preset
    selectors (reference my_run_experiments.py:285-330)."""
    train_cli, args = _args([
        "--isr_edge", "0.75", "--isr_edge_class_weight", "0.9",
        "--isr_mix_aug", "--img_self_res_reg", "no",
        "--cs_isr_data_type", "new_day", "--dz_isr_data_type", "new_night",
    ])
    cfg = C.cs2dz_image_rawisr_b5()
    for path, val in train_cli.ablation_overrides(args):
        cfg = C.set_by_path(cfg, path, val)
    assert cfg.uda.isr_edge is True
    assert cfg.uda.lambda_isr_features == 0.75
    assert cfg.uda.isr_edge_class_weight == 0.9
    assert cfg.uda.isr_mix_aug is True
    # 'new_*' selectors swap in the reference default tables
    # (cityscapes_ic.py:106-116, dark_zurich_ic.py:117-127)
    assert cfg.data.source_isr == C.IsrParams((1e-5, 255 + 1e-5), 0.0, 0.040, 3)
    assert cfg.data.target_isr == C.IsrParams((500.0, 1000.0), 0.02, 0.12, 3)
    assert cfg.data.source_isr_3 == C.CS_ISR_PRESETS_3["new_day"]
    assert cfg.data.target_isr_3 == C.DZ_ISR_PRESETS_3["new_night"]
    # default tables match the reference 'day'/'night' rows
    assert C.CS_ISR_PRESETS["day"] == C.IsrParams((1.0, 10.0), 0.03, 0.2, 3)
    assert C.DZ_ISR_PRESETS["night"] == C.IsrParams((1.0, 100.0), 0.04, 0.2, 3)


def test_img_self_res_reg_validated():
    """Membership check mirrors reference dacs.py:88-90."""
    from cmda_tpu.uda.dacs import DACSTrainer
    cfg = C.tiny_test_config()
    bad = C.replace(cfg, uda=C.replace(cfg.uda, img_self_res_reg="bogus"))
    with pytest.raises(AssertionError):
        DACSTrainer(bad)


def test_dsec_fixed_clip_override(tmp_path):
    """events_clip_range=(lo,hi) replaces the adaptive rule
    (reference dsec.py:359-362)."""
    from cmda_tpu.data.dsec import DSECDataset
    txt = tmp_path / "empty.txt"
    txt.write_text("")
    ds = DSECDataset(str(txt), isr_params=C.IsrParams(),
                     events_clip_range=(0.7, 0.7))
    assert ds.events_clip_range == (0.7, 0.7)


def test_cityscapes_gi_modes(tmp_path):
    from cmda_tpu.data.cityscapes_ic import CityscapesICDataset
    ds = CityscapesICDataset(str(tmp_path), isr_params=C.IsrParams(),
                             return_gi_or_ic="gray_image")
    assert ds.return_gi_or_ic == "gray_image"
    with pytest.raises(AssertionError):
        CityscapesICDataset(str(tmp_path), isr_params=C.IsrParams(),
                            return_gi_or_ic="bogus")


def test_coerce_strictness():
    """Failed scalar casts raise instead of smuggling a str into an int
    field; scientific-notation ints are accepted; tuple-typed optional
    fields can be reset to None (ADVICE r1)."""
    cfg = C.cs2dsec_image_events_b5()
    got = C.set_by_path(cfg, "optim.max_iters", "1e4")
    assert got.optim.max_iters == 10000 and isinstance(
        got.optim.max_iters, int)
    with pytest.raises(ValueError):
        C.set_by_path(cfg, "optim.max_iters", "bogus")
    with pytest.raises(ValueError):
        C.set_by_path(cfg, "optim.lr", "fast")
    # union-with-str fields keep the schedule string
    got = C.set_by_path(cfg, "uda.random_choice_thres", "0.5-1.0")
    assert got.uda.random_choice_thres == "0.5-1.0"
    # optional tuple field -> None
    got = C.set_by_path(cfg, "data.events_clip_range", "0.7,0.7")
    assert got.data.events_clip_range == (0.7, 0.7)
    got = C.set_by_path(got, "data.events_clip_range", "none")
    assert got.data.events_clip_range is None


def test_print_config_resolves_flags(tmp_path):
    """tools/print_config.py (reference tools/print_config.py): the full
    train.py flag surface resolves into a JSON dataclass dump."""
    import json
    from tools.print_config import resolved_config_dict

    d, _ = resolved_config_dict([
        "--config", "cs2dsec", "--events_bins_5_avg_1",
        "--set", "optim.lr=1e-4", "--set", "uda.pseudo_threshold=0.9"])
    assert d["data"]["events_bins"] == 5
    assert d["optim"]["lr"] == pytest.approx(1e-4)
    assert d["uda"]["pseudo_threshold"] == pytest.approx(0.9)
    assert d["model"]["backbone"] == "mit_b5"
