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
    p.add_argument("--dtype", default=None, choices=[None, "float32", "bfloat16"])
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--multi-host", action="store_true",
                   help="jax.distributed.initialize + per-host file shards "
                        "(the reference's init_dist/DistributedSampler path)")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address for --multi-host")
    return p.parse_args()


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
    src = CityscapesICDataset(
        cfg.data.source_root, isr_params=cfg.data.source_isr,
        shift_type=cfg.data.shift_type)
    if cfg.data.target == "dsec":
        from cmda_tpu.data.dsec import DSECDataset
        tgt = DSECDataset(args.target_txt, events_bins=cfg.data.events_bins,
                          isr_params=cfg.data.target_isr,
                          shift_type=cfg.data.shift_type)
        val = (DSECDataset(args.val_txt, events_bins=cfg.data.events_bins,
                           isr_params=cfg.data.target_isr, test_mode=True,
                           outputs=("image", "events", "label"))
               if args.val_txt else None)
    else:
        from cmda_tpu.data.dark_zurich import DarkZurichDataset
        tgt = DarkZurichDataset(cfg.data.target_root, split="train",
                                isr_params=cfg.data.target_isr,
                                shift_type=cfg.data.shift_type)
        val = DarkZurichDataset(cfg.data.target_root, split="val",
                                isr_params=cfg.data.target_isr,
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
    from cmda_tpu.models.mit import MIT_VARIANTS
    from cmda_tpu.utils import torch_import as TI

    cyclegan_params = None
    if args.cyclegan:
        sd = TI.strip_prefix(TI.load_torch_file(args.cyclegan))
        cyclegan_params = TI.convert_resnet_generator(sd)["params"]
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed),
                               cyclegan_params=cyclegan_params)
    if args.pretrained_backbone:
        depths = tuple(MIT_VARIANTS[cfg.model.backbone].depths)
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
        for ds in (dataset.source, dataset.target):
            if hasattr(ds, "files") and ds.files:
                ds.files = shard_files_for_host(ds.files)
            elif hasattr(ds, "rows") and len(ds.rows):
                ds.rows = np.asarray(shard_files_for_host(list(ds.rows)))

    from cmda_tpu.train.loop import TrainLoop, load_checkpoint
    loop = TrainLoop(cfg, dataset=dataset, val_dataset=val,
                     work_dir=args.work_dir, num_workers=args.num_workers)
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
