"""Train CLI (replaces reference tools/train.py + my_run_experiments.py).

Examples:
  python tools/train.py --config cs2dsec --source-root data/cityscapes \
      --target-txt data/dsec/night_dataset_warp.txt
  python tools/train.py --config tiny --synthetic --max-iters 20
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="cmda_tpu trainer")
    p.add_argument("--config", default="cs2dsec",
                   choices=["cs2dsec", "cs2dz", "tiny"])
    p.add_argument("--work-dir", default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (no corpora needed)")
    p.add_argument("--source-root", default=None)
    p.add_argument("--target-root", default=None)
    p.add_argument("--target-txt", default=None,
                   help="DSEC night_dataset_warp.txt")
    p.add_argument("--val-txt", default=None,
                   help="DSEC night_test_dataset_warp.txt")
    p.add_argument("--rcs-json-dir", default=None,
                   help="dir with sample_class_stats_dict.json + samples_with_class.json")
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--pretrained-backbone", default=None,
                   help="NVlabs mit_bX.pth loaded into both backbones "
                        "(reference mix_transformer.py:339-357)")
    p.add_argument("--cyclegan", default=None,
                   help="frozen cityscapes_ICD_to_dsec_EN.pth generator "
                        "(reference dacs.py:96-103)")
    p.add_argument("--imnet", default=None,
                   help="mit_bX.pth for the frozen ImageNet feature-distance "
                        "encoder (reference dacs.py:234-242; defaults to "
                        "--pretrained-backbone when fdist is enabled)")
    p.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--multi-host", action="store_true",
                   help="jax.distributed.initialize + per-host file shards "
                        "(the reference's init_dist/DistributedSampler path)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address for --multi-host")
    p.add_argument("--data-parallel", action="store_true",
                   help="train through the GSPMD data mesh over all local "
                        "devices (implied by --multi-host)")
    p.add_argument("--shard-opt-state", action="store_true",
                   help="ZeRO-1: shard AdamW moments over the data axis "
                        "(parallel/mesh.py opt_state_sharding)")
    p.add_argument("--tensor-parallel", type=int, default=1, metavar="N",
                   help="Megatron-shard the encoder blocks over a 'model' "
                        "mesh axis of size N (parallel/mesh.py "
                        "tp_state_sharding); implies the GSPMD mesh step")
    p.add_argument("--fused-resize", action="store_true",
                   help="phase-decomposed integer-factor upsamples in the "
                        "loss/decode paths. TOOLCHAIN-DEPENDENT: cut temp "
                        "HBM on some jax versions but ENLARGED the peak on "
                        "others — re-measure hbm_temp_gb via bench.py "
                        "--fused-resize before using (docs/PERF.md)")
    p.add_argument("--pallas-ce", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas upsample+CE + teacher argmax kernels "
                        "(uda.pallas_ce, TPU only; parity-tested): the "
                        "resized [B,H,W,C] logits never touch HBM. Config "
                        "default is ON (docs/PERF.md r4); --no-pallas-ce "
                        "forces the plain XLA chain")
    p.add_argument("--teacher-bf16", action="store_true",
                   help="teacher forward reads a bf16 cast of the EMA "
                        "weights (uda.teacher_bf16); EMA accumulation "
                        "stays f32 (docs/PERF.md)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VAL",
                   help="dotted config override, e.g. uda.pseudo_threshold"
                        "=0.9 (mmcv --options equivalent; repeatable)")
    add_ablation_flags(p)
    return p.parse_args()


def add_ablation_flags(p):
    """The reference launcher's ablation surface (my_run_experiments.py:28-90)
    as named flags; each maps onto the typed config tree below."""
    g = p.add_argument_group("ablation flags (reference my_run_experiments.py)")
    g.add_argument("--backbone", default="",
                   choices=["", "mit_b0", "mit_b1", "mit_b2", "mit_b3",
                            "mit_b4", "mit_b5"])
    g.add_argument("--fusion", default="",
                   choices=["", "caf", "af", "attf", "attfavg"])
    g.add_argument("--fusion_isr", default="",
                   choices=["", "caf", "af", "attf", "attfavg", "none"])
    g.add_argument("--train_size", default="", help="e.g. 512-512")
    g.add_argument("--day_events_generate", default="",
                   choices=["", "image_change", "gray_image", "ic_wo_cyclegan",
                            "gi_wo_cyclegan", "events_gan", "events_esim"])
    g.add_argument("--events_clip_range", type=float, default=-1)
    g.add_argument("--events_bins_5_avg_1", action="store_true")
    g.add_argument("--image_change_range", type=int, default=-1)
    g.add_argument("--feature_dist", type=float, default=-1)
    g.add_argument("--no_plcrop", action="store_true")
    g.add_argument("--cs_isr_noise", action="store_true")
    g.add_argument("--cs_cow_mask", action="store_true")
    g.add_argument("--high_resolution_isr", action="store_true")
    g.add_argument("--random_flare", default="",
                   metavar="FLARE_DIR", help="lens-flare PNG dir")
    g.add_argument("--sky_mask", action="store_true")
    g.add_argument("--deflare_aug", action="store_true")
    g.add_argument("--isr_edge", type=float, default=-1,
                   help="edge-label the ISR stream; the value is "
                        "lambda_isr_features (reference "
                        "my_run_experiments.py:320-322)")
    g.add_argument("--isr_edge_class_weight", type=float, default=-1,
                   help="edge-class CE weight w -> [1-w, w] "
                        "(reference my_run_experiments.py:327-330)")
    g.add_argument("--isr_mix_aug", action="store_true",
                   help="jitter+blur the class-mixed ISR "
                        "(reference my_run_experiments.py:285-288)")
    g.add_argument("--img_self_res_reg", default="",
                   choices=["", "no", "only_isr", "mixed", "average"],
                   help="validated but functionally dead in the reference "
                        "(dacs.py:684-699 is commented out)")
    g.add_argument("--cs_isr_data_type", default="",
                   choices=["", "day", "new_day"],
                   help="source ISR default-table selector "
                        "(reference cityscapes_ic.py:100-116)")
    g.add_argument("--dz_isr_data_type", default="",
                   choices=["", "night", "new_night"],
                   help="target ISR default-table selector "
                        "(reference dark_zurich_ic.py:110-127)")
    g.add_argument("--dz_auto_threshold", action="store_true",
                   help="unimplemented in the reference (raises in "
                        "utils.py:124-125); rejected at dataset build")
    g.add_argument("--shift_3_channel", action="store_true")
    g.add_argument("--share_decoder", action="store_true")
    g.add_argument("--half_share_decoder", action="store_true")
    g.add_argument("--no_share_decoder", action="store_true")
    g.add_argument("--mixed_image_to_mixed_isr", action="store_true")
    g.add_argument("--isr_noise_dacs_type", default="",
                   choices=["", "noise", "blur", "noise+blur"])
    g.add_argument("--source_isr_parms", default="",
                   help="lo-hi-threshold-clip-shift (5 dash-separated floats)")
    g.add_argument("--target_isr_parms", default="")
    g.add_argument("--dacs_isr_parms", default="")
    g.add_argument("--without_events", action="store_true")
    g.add_argument("--without_isd", action="store_true")
    g.add_argument("--isr_no_fusion", action="store_true")
    g.add_argument("--fuse_both_ice_and_e", action="store_true")
    g.add_argument("--random_choice_thres", default="",
                   help="float or 'a-b' linear schedule")
    g.add_argument("--isd_shift_type", default="",
                   choices=["", "all", "random", "rightdown"])
    g.add_argument("--loss_weight_image", type=float, default=-1)
    g.add_argument("--loss_weight_events", type=float, default=-1)
    g.add_argument("--loss_weight_fusion", type=float, default=-1)
    g.add_argument("--loss_weight_img_self_res", type=float, default=-1)
    g.add_argument("--lambda_feature_consistency", type=float, default=-1)
    g.add_argument("--test_mode", action="store_true",
                   help="shrink eval/log/debug intervals for smoke runs "
                        "(reference my_run_experiments.py:177-180)")


_FUSION_NAMES = {"caf": "convert_avg", "af": "average",
                 "attf": "attention", "attfavg": "attention_avg",
                 "none": ""}


def ablation_overrides(args):
    """Translate the named reference flags into dotted overrides."""
    from cmda_tpu import config as C
    ov = []

    def add(path, val):
        ov.append((path, val))

    if args.backbone:
        add("model.backbone", args.backbone)
    if args.fusion:
        add("model.fusion", _FUSION_NAMES[args.fusion])
    if args.fusion_isr:
        add("model.fusion_isr", _FUSION_NAMES[args.fusion_isr])
    if args.train_size:
        # reference table (my_run_experiments.py:212-224): the 512 setting
        # keeps the DSEC pre-resize crop at 440
        w, h = args.train_size.split("-")
        add("data.crop_size", f"{w},{h}")
        tgt = "440,440" if args.train_size == "512-512" else f"{w},{h}"
        add("data.target_crop_size", tgt)
    if args.day_events_generate:
        mode = {"gi_wo_cyclegan": "gray_image"}.get(
            args.day_events_generate, args.day_events_generate)
        add("data.return_gi_or_ic", mode)
        add("uda.use_cyclegan_day_events",
            args.day_events_generate in ("image_change", "gray_image"))
    if args.events_clip_range != -1:
        add("data.events_clip_range",
            (args.events_clip_range, args.events_clip_range))
    if args.events_bins_5_avg_1:
        # global on purpose: the reference sets events_bins_5_avg_1 on
        # data.train.target AND data.val/test (my_run_experiments.py:248-255),
        # and DSECDataset averages the 5 normed bins to 1 in both modes
        # (reference dsec.py:145-147,304-305)
        add("data.events_bins", 5)
    if args.image_change_range != -1:
        add("data.image_change_range", args.image_change_range)
    if args.feature_dist != -1:
        add("uda.imnet_feature_dist_lambda", args.feature_dist)
    if args.no_plcrop:
        add("uda.pseudo_weight_ignore_top", 0)
        add("uda.pseudo_weight_ignore_bottom", 0)
    if args.cs_isr_noise:
        add("data.isr_noise", True)
    if args.cs_cow_mask:
        add("data.isr_cow_mask", True)
    if args.high_resolution_isr:
        add("data.high_resolution_isr", True)
    if args.random_flare:
        add("data.flare_dir", args.random_flare)
    if args.sky_mask:
        add("data.sky_mask", True)
    if args.deflare_aug:
        add("uda.deflare_aug", True)
    if args.isr_edge != -1:
        add("uda.isr_edge", True)
        add("uda.lambda_isr_features", args.isr_edge)
    if args.isr_edge_class_weight != -1:
        assert 0 <= args.isr_edge_class_weight <= 1
        add("uda.isr_edge_class_weight", args.isr_edge_class_weight)
    if args.isr_mix_aug:
        add("uda.isr_mix_aug", True)
    if args.img_self_res_reg:
        add("uda.img_self_res_reg", args.img_self_res_reg)
    if args.cs_isr_data_type:
        add("data.cs_isr_data_type", args.cs_isr_data_type)
        add("data.source_isr", C.CS_ISR_PRESETS[args.cs_isr_data_type])
        add("data.source_isr_3", C.CS_ISR_PRESETS_3[args.cs_isr_data_type])
    if args.dz_isr_data_type:
        add("data.dz_isr_data_type", args.dz_isr_data_type)
        add("data.target_isr", C.DZ_ISR_PRESETS[args.dz_isr_data_type])
        add("data.target_isr_3", C.DZ_ISR_PRESETS_3[args.dz_isr_data_type])
    if args.dz_auto_threshold:
        add("data.dz_auto_threshold", True)
    if args.shift_3_channel:
        add("uda.shift_3_channel", True)
        add("data.shift_3_channel", True)
    if args.share_decoder:
        add("model.share_decoder", "full")
    if args.half_share_decoder:
        add("model.share_decoder", "half")
    if args.no_share_decoder:
        add("model.share_decoder", "none")
    if args.mixed_image_to_mixed_isr:
        add("uda.mixed_image_to_mixed_isr", True)
    if args.isr_noise_dacs_type:
        add("uda.isr_noise_dacs_type", args.isr_noise_dacs_type)
    if args.source_isr_parms:
        add("data.source_isr", args.source_isr_parms)
    if args.target_isr_parms:
        add("data.target_isr", args.target_isr_parms)
    if args.dacs_isr_parms:
        add("uda.isr_params", args.dacs_isr_parms)
    if args.without_events:
        add("uda.without_events", True)
    if args.without_isd:
        add("uda.without_isd", True)
    if args.isr_no_fusion:
        add("uda.isr_no_fusion", True)
    if args.fuse_both_ice_and_e:
        add("uda.fuse_both_ice_and_e", True)
    if args.random_choice_thres:
        add("uda.random_choice_thres", args.random_choice_thres)
    if args.isd_shift_type:
        add("uda.shift_type", args.isd_shift_type)
        add("data.shift_type", args.isd_shift_type)
    for k in ("image", "events", "fusion"):
        v = getattr(args, f"loss_weight_{k}")
        if v != -1:
            add(f"uda.loss_weight_{k}", v)
    if args.loss_weight_img_self_res != -1:
        add("uda.loss_weight_isr", args.loss_weight_img_self_res)
    if args.lambda_feature_consistency != -1:
        add("uda.lambda_feature_consistency", args.lambda_feature_consistency)
    if args.test_mode:
        add("eval_interval", 5)
        add("log_interval", 1)
        add("debug_img_interval", 3)
    return ov


def build_config(args):
    from cmda_tpu import config as C
    cfg = {"cs2dsec": C.cs2dsec_image_events_b5,
           "cs2dz": C.cs2dz_image_rawisr_b5,
           "tiny": C.tiny_test_config}[args.config]()
    if args.seed is not None:
        cfg = C.replace(cfg, seed=args.seed)
    if args.dtype:
        cfg = C.replace(cfg, dtype=args.dtype)
    data = cfg.data
    if args.batch_size:
        data = C.replace(data, batch_size=args.batch_size)
    if args.source_root:
        data = C.replace(data, source_root=args.source_root)
    if args.target_root:
        data = C.replace(data, target_root=args.target_root)
    cfg = C.replace(cfg, data=data)
    if args.max_iters:
        cfg = C.replace(cfg, optim=C.replace(cfg.optim,
                                             max_iters=args.max_iters))
    for path, val in ablation_overrides(args):
        cfg = C.set_by_path(cfg, path, val)
    cfg = C.apply_overrides(cfg, args.overrides)
    return cfg


def build_datasets(cfg, args):
    from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
    from cmda_tpu.data.uda import UDAPairDataset

    if args.synthetic:
        with_events = cfg.model.train_type.startswith("cs2dsec")
        src = SyntheticSource(crop_size=cfg.data.crop_size,
                              with_time_res=with_events)
        tgt = SyntheticTarget(crop_size=cfg.data.crop_size,
                              with_events=with_events)
        val = SyntheticTarget(crop_size=cfg.data.crop_size, length=8,
                              with_events=with_events, test_mode=True)
        return UDAPairDataset(src, tgt, seed=cfg.seed), val

    from cmda_tpu.data.cityscapes_ic import CityscapesICDataset
    d = cfg.data
    source_isr = (d.source_isr if not d.shift_3_channel
                  else d.source_isr_3)
    src = CityscapesICDataset(
        d.source_root, isr_params=source_isr,
        image_crop_size=d.crop_size,
        shift_type=d.shift_type, isr_noise=d.isr_noise,
        isr_cow_mask=d.isr_cow_mask, flare_dir=d.flare_dir,
        sky_noise_dir=d.sky_noise_dir, sky_mask=d.sky_mask,
        shift_3_channel=d.shift_3_channel,
        high_resolution_isr=d.high_resolution_isr,
        return_gi_or_ic=d.return_gi_or_ic,
        decode_cache=d.decode_cache)
    if d.target == "dsec":
        from cmda_tpu.data.dsec import DSECDataset
        tgt = DSECDataset(args.target_txt, events_bins=d.events_bins,
                          isr_params=d.target_isr,
                          crop_size=d.target_crop_size,
                          after_crop_resize_size=d.crop_size,
                          image_change_range=d.image_change_range,
                          events_clip_range=d.events_clip_range,
                          shift_type=d.shift_type,
                          decode_cache=d.decode_cache)
        # events_clip_range / image_change_range / events_bins apply to
        # train AND val/test alike (reference my_run_experiments.py:232-238,
        # 248-255, 352-360 sets them on data.train/val/test together)
        val = (DSECDataset(args.val_txt, events_bins=d.events_bins,
                           isr_params=d.target_isr, test_mode=True,
                           image_change_range=d.image_change_range,
                           events_clip_range=d.events_clip_range,
                           outputs=("image", "events", "label"))
               if args.val_txt else None)
    else:
        from cmda_tpu.data.dark_zurich import DarkZurichDataset
        target_isr = (d.target_isr if not d.shift_3_channel
                      else d.target_isr_3)
        tgt = DarkZurichDataset(cfg.data.target_root, split="train",
                                isr_params=target_isr,
                                image_crop_size=d.crop_size,
                                shift_type=cfg.data.shift_type,
                                shift_3_channel=d.shift_3_channel,
                                auto_threshold=d.dz_auto_threshold)
        val = DarkZurichDataset(cfg.data.target_root, split="val",
                                isr_params=target_isr,
                                shift_3_channel=d.shift_3_channel,
                                auto_threshold=d.dz_auto_threshold,
                                outputs=("image", "isr", "label"))
    rcs_kwargs = {}
    if cfg.data.rcs_enabled and args.rcs_json_dir:
        rcs_kwargs = dict(
            rcs=True,
            samples_with_class=os.path.join(args.rcs_json_dir,
                                            "samples_with_class.json"),
            sample_class_stats=os.path.join(args.rcs_json_dir,
                                            "sample_class_stats_dict.json"),
            class_temp=cfg.data.rcs_class_temp,
            min_pixels=cfg.data.rcs_min_pixels,
            min_crop_ratio=cfg.data.rcs_min_crop_ratio)
    return UDAPairDataset(src, tgt, seed=cfg.seed, **rcs_kwargs), val


def init_pretrained_state(trainer, cfg, args):
    """Build the initial train state from torch checkpoints: the ImageNet
    MiT backbone into both encoders (reference always starts from
    pretrained/mit_b5.pth, mix_transformer.py:339-357) and the frozen
    CycleGAN day-events generator (dacs.py:96-103)."""
    import jax
    import jax.numpy as jnp
    from cmda_tpu.models.mit import MIT_VARIANTS
    from cmda_tpu.utils import torch_import as TI

    cyclegan_params = None
    if args.cyclegan:
        if args.cyclegan.endswith(".npz"):
            # native tools/train_cyclegan.py checkpoint (A->B generator)
            from cmda_tpu.uda.cyclegan_train import load_generator_npz
            cyclegan_params = load_generator_npz(args.cyclegan, "g_a")
        else:
            # the generator's OWN Sequential is named ``model.*``
            # (cityscapes_ICD_to_dsec_EN.pth keys are model.<i>.weight,
            # reference cyclegan_model.py:375) — only strip a DataParallel
            # ``module.`` wrapper, never ``model.``
            sd = TI.strip_prefix(TI.load_torch_file(args.cyclegan),
                                 prefixes=("module.",))
            cyclegan_params = TI.convert_resnet_generator(sd)["params"]
    depths = tuple(MIT_VARIANTS[cfg.model.backbone].depths)
    imnet_params = None
    imnet_src = args.imnet or (args.pretrained_backbone
                               if cfg.uda.imnet_feature_dist_lambda > 0
                               else None)
    if imnet_src and getattr(trainer, "imnet", None) is not None:
        # frozen ImageNet encoder for the feature-distance loss: same MiT
        # weights in a single-backbone EncoderDecoder (reference
        # dacs.py:234-242 builds an imnet_model segmentor)
        mit = TI.convert_mit(TI.load_torch_file(imnet_src), depths)
        h, w = cfg.data.crop_size
        iv = trainer.imnet.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, h, w, 3), jnp.float32))
        imnet_params = TI.merge_pretrained(iv["params"], {"backbone": mit})
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed),
                               cyclegan_params=cyclegan_params,
                               imnet_params=imnet_params)
    if args.pretrained_backbone:
        mit = TI.convert_mit(TI.load_torch_file(args.pretrained_backbone),
                             depths)
        targets = {k: mit for k in ("backbone_image", "backbone_events")
                   if k in state.params}
        if not targets and "backbone" in state.params:
            targets = {"backbone": mit}
        params = TI.merge_pretrained(state.params, targets)
        state = state.replace(
            params=params,
            ema_params=jax.tree.map(lambda x: x.copy(), params))
    return state


def main():
    args = parse_args()
    from cmda_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    if args.max_iters and args.max_iters > 4000 and args.resume_from is None:
        # the axon tunnel client leaks ~20-25 MB of host memory per step
        # (h2d staging buffers, docs/ROUND5.md) — a >5k-iter single
        # process OOMs the host. Warn loudly; tools/train_chunked.py
        # wraps this CLI with segment-restart over checkpoints.
        print(json.dumps({"warning": "long single-process run: the axon "
                          "tunnel leaks host memory per step; use "
                          "tools/train_chunked.py for >4k iters "
                          "(docs/ROUND5.md)"}), flush=True)
    if args.fused_resize:
        from cmda_tpu.ops.resize import set_fused_int_upsample
        set_fused_int_upsample(True)
    if args.pallas_ce is not None:
        args.overrides.append(
            "uda.pallas_ce=" + ("true" if args.pallas_ce else "false"))
    if args.teacher_bf16:
        args.overrides.append("uda.teacher_bf16=true")
    if args.multi_host:
        from cmda_tpu.parallel.mesh import init_distributed
        pi, pc = init_distributed(coordinator_address=args.coordinator)
        print(json.dumps({"process_index": pi, "process_count": pc}))
    cfg = build_config(args)
    dataset, val = build_datasets(cfg, args)
    if args.multi_host:
        # per-host independent file shards (DistributedSampler equivalent,
        # reference mmseg/datasets/builder.py:136-139)
        from cmda_tpu.parallel.mesh import shard_files_for_host
        # val included: each host evaluates its shard and evaluate_fusion
        # all-reduces the histograms (reference collect_results_cpu path)
        for ds in (dataset.source, dataset.target, val):
            if ds is None:
                continue
            if hasattr(ds, "files") and ds.files:
                ds.files = shard_files_for_host(ds.files)
            elif hasattr(ds, "rows") and len(ds.rows):
                ds.rows = np.asarray(shard_files_for_host(list(ds.rows)))

    from cmda_tpu.train.loop import TrainLoop, load_checkpoint
    mesh = None
    if args.multi_host or args.data_parallel or args.tensor_parallel > 1:
        # the GSPMD step is what syncs gradients across devices/processes
        # (a bare jit would train unsynchronized per-host replicas)
        from cmda_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_model=args.tensor_parallel)
    loop = TrainLoop(cfg, dataset=dataset, val_dataset=val,
                     work_dir=args.work_dir, num_workers=args.num_workers,
                     mesh=mesh, shard_opt_state=args.shard_opt_state,
                     tensor_parallel=args.tensor_parallel > 1)
    state = None
    if args.resume_from:
        import jax
        state = loop.trainer.init_state(jax.random.PRNGKey(cfg.seed))
        state = load_checkpoint(state, args.resume_from)
    elif args.pretrained_backbone or args.cyclegan:
        state = init_pretrained_state(loop.trainer, cfg, args)
    final = loop.run(max_iters=args.max_iters, state=state)
    print(json.dumps({"done": True, "step": int(final.step),
                      "work_dir": loop.work_dir}))


if __name__ == "__main__":
    main()
