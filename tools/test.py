"""Test / prediction CLI (replaces reference tools/test.py + my_test.py).

Evaluates a checkpoint on the target test split (fusion stream mIoU with the
18-class conversion for DSEC) and optionally exports DarkZurich
evaluation-server submission PNGs (labelTrainIds at 1920x1080,
reference tools/test.py:198-220).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="cmda_tpu tester")
    p.add_argument("--config", default="cs2dsec",
                   choices=["cs2dsec", "cs2dz", "tiny"])
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference iter_40000.pth (UDA-decorated or bare "
                        "FusionEncoderDecoder; prefixes stripped as in "
                        "reference tools/test.py:165-169)")
    p.add_argument("--target-txt", default=None)
    p.add_argument("--target-root", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--output-type", default=None,
                   choices=["fusion", "image", "events", "isr"],
                   help="evaluation defaults to 'fusion'; website submission "
                        "for cs2dz defaults to 'image' (the reference "
                        "my_test.py test_output_type; "
                        "encoder_decoder.py:914-918 forces the image stream "
                        "unless --image_isr/fusion is asked)")
    p.add_argument("--use-teacher", action="store_true",
                   help="evaluate the EMA teacher weights")
    p.add_argument("--show-dir", default=None)
    p.add_argument("--inference", default="whole", choices=["whole", "slide"],
                   help="slide = overlapping-crop logit accumulation "
                        "(reference encoder_decoder.py:175-218)")
    p.add_argument("--slide-crop", type=int, nargs=2, default=(512, 512))
    p.add_argument("--slide-stride", type=int, nargs=2, default=(341, 341))
    p.add_argument("--slide-crop-chunk", type=int, default=None,
                   help="max crops per forward in slide mode (bounds HBM; "
                        "default: the whole grid in one batched forward)")
    p.add_argument("--opacity", type=float, default=None,
                   help="blend pred colors over the input at this opacity "
                        "in --show-dir panels (reference tools/test.py:81, "
                        "base.py:241-248); default: bare color map cell")
    p.add_argument("--aug-test", action="store_true",
                   help="multi-scale (0.5..1.75) + horizontal-flip TTA, "
                        "softmax-averaged (reference tools/test.py:39,"
                        "118-123); whole-mode only")
    p.add_argument("--submit-to-website", action="store_true")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--backbone", default="",
                   choices=["", "mit_b0", "mit_b1", "mit_b2", "mit_b3",
                            "mit_b4", "mit_b5"])
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VAL",
                   help="dotted config override (matches tools/train.py)")
    return p.parse_args()


def main():
    args = parse_args()
    from cmda_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np
    from cmda_tpu import config as C
    from cmda_tpu.train.loop import evaluate_fusion, load_checkpoint
    from cmda_tpu.uda.dacs import DACSTrainer

    cfg = {"cs2dsec": C.cs2dsec_image_events_b5,
           "cs2dz": C.cs2dz_image_rawisr_b5,
           "tiny": C.tiny_test_config}[args.config]()
    if args.backbone:
        cfg = C.replace(cfg, model=C.replace(cfg.model,
                                             backbone=args.backbone))
    cfg = C.apply_overrides(cfg, args.overrides)
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    if args.checkpoint:
        state = load_checkpoint(state, args.checkpoint)
    elif args.torch_checkpoint:
        from cmda_tpu.models.mit import MIT_VARIANTS
        from cmda_tpu.utils import torch_import as TI
        sd = TI.load_torch_file(args.torch_checkpoint)
        conv = TI.convert_fusion_checkpoint(
            sd, depths=tuple(MIT_VARIANTS[cfg.model.backbone].depths),
            fusion=cfg.model.fusion, fusion_isr=cfg.model.fusion_isr)
        params = TI.merge_pretrained(state.params, conv["params"])
        bstats = TI.merge_pretrained(state.batch_stats,
                                     conv.get("batch_stats", {}))
        state = state.replace(params=params, batch_stats=bstats,
                              ema_params=jax.tree.map(lambda x: x.copy(),
                                                      params))

    if args.synthetic:
        from cmda_tpu.data.synthetic import SyntheticTarget
        dataset = SyntheticTarget(crop_size=cfg.data.crop_size, length=8,
                                  test_mode=True,
                                  with_events=cfg.model.train_type.startswith("cs2dsec"))
    elif cfg.data.target == "dsec":
        from cmda_tpu.data.dsec import DSECDataset
        # clip/window/bins settings mirror the train target: the reference
        # applies them to data.train/val/test together
        # (my_run_experiments.py:232-238, 248-255, 352-360)
        dataset = DSECDataset(args.target_txt,
                              events_bins=cfg.data.events_bins,
                              isr_params=cfg.data.target_isr, test_mode=True,
                              image_change_range=cfg.data.image_change_range,
                              events_clip_range=cfg.data.events_clip_range,
                              outputs=("image", "events", "label"))
    else:
        from cmda_tpu.data.dark_zurich import DarkZurichDataset
        split = "test" if args.submit_to_website else "val"
        outputs = ("image", "isr") if args.submit_to_website else \
            ("image", "isr", "label")
        target_isr = (cfg.data.target_isr if not cfg.data.shift_3_channel
                      else cfg.data.target_isr_3)
        dataset = DarkZurichDataset(args.target_root, split=split,
                                    isr_params=target_isr,
                                    shift_3_channel=cfg.data.shift_3_channel,
                                    auto_threshold=cfg.data.dz_auto_threshold,
                                    outputs=outputs)

    if args.submit_to_website:
        if args.output_type is None:
            args.output_type = ("fusion"
                                if cfg.model.train_type.startswith("cs2dsec")
                                else "image")
        export_submission(trainer, state, dataset, args, cfg)
        return

    summary = evaluate_fusion(trainer, state, dataset,
                              output=args.output_type or "fusion",
                              use_teacher=args.use_teacher,
                              num_classes=cfg.data.num_classes,
                              max_samples=args.max_samples,
                              show_dir=args.show_dir,
                              inference=args.inference,
                              slide_crop=tuple(args.slide_crop),
                              slide_stride=tuple(args.slide_stride),
                              slide_crop_chunk=args.slide_crop_chunk,
                              aug_test=args.aug_test,
                              opacity=args.opacity)
    print(json.dumps(summary, indent=2))
    if args.show_dir and os.path.isdir(args.show_dir):
        # bake the score into the dir name (reference tools/test.py:232-233)
        scored = f"{args.show_dir.rstrip('/')}_{summary['mIoU'] * 100:.2f}"
        os.rename(args.show_dir, scored)
        print(json.dumps({"show_dir": scored}))


def export_submission(trainer, state, dataset, args, cfg, batch_size=4):
    """DarkZurich evaluation-server export (reference tools/test.py:198-219).

    Writes the exact tree the official server ingests:
      <dir>/labelTrainIds/<name>_rgb_anon.png          uint8 trainIds
      <dir>/labelTrainIds_invalid/<name>_rgb_anon.png  identical copy
      <dir>/confidence/<name>_rgb_anon.png             uint16, all 65535
    each resized to 1920x1080 NEAREST, file names keeping the original
    rgb_anon basenames (reference apis/test.py:146 ori_filename).

    Stream selection mirrors encoder_decoder.py:895-920: for cs2dz the
    default submission is the IMAGE-ONLY stream ('image', my_test.py
    test_output_type); ``--output-type fusion`` is the reference's
    --image_isr path (image+ISR fusion); cs2dsec checkpoints use
    image+events fusion."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    out_dir = args.show_dir or "submission"
    dirs = {k: os.path.join(out_dir, k)
            for k in ("labelTrainIds", "labelTrainIds_invalid", "confidence")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    variables = {"params": state.ema_params if args.use_teacher else state.params,
                 "batch_stats": state.batch_stats}
    model = trainer.model
    is_dsec = cfg.model.train_type.startswith("cs2dsec")
    use_fusion = is_dsec or args.output_type == "fusion"
    second_key = "events" if is_dsec else "isr"

    # variables ride as a jit ARGUMENT (closure constants at b5 scale blow
    # the axon remote-compile request limit: HTTP 413 — see train/loop.py)
    @jax.jit
    def infer(variables, image, second):
        if use_fusion:
            logits = model.apply(variables, image, second, None,
                                 mode="default", output="fusion")
        else:
            logits = model.apply(variables, image, None, None,
                                 mode="no_fusion", output="image")
        return jnp.argmax(logits, axis=-1)

    from cmda_tpu.utils.guards import assert_lean_closure
    assert_lean_closure(infer)   # HTTP-413 guard (train/loop.py NOTE)

    n = len(dataset) if args.max_samples is None else min(len(dataset),
                                                          args.max_samples)
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        samples = [dataset[i] for i in idxs]
        image = np.stack([s["image"] for s in samples])
        if use_fusion:
            second = np.stack([s[second_key] for s in samples])
        else:
            second = np.zeros_like(image)
        # pad the tail batch so every launch reuses the one compiled shape
        pad = batch_size - len(idxs)
        if pad:
            image = np.concatenate([image, image[-1:].repeat(pad, 0)])
            second = np.concatenate([second, second[-1:].repeat(pad, 0)])
        pred = np.asarray(infer(variables, jnp.asarray(image),
                               jnp.asarray(second)))
        for j, i in enumerate(idxs):
            label = Image.fromarray(pred[j].astype(np.uint8)).resize(
                (1920, 1080), Image.NEAREST)
            conf = Image.fromarray(
                np.full(pred[j].shape, 65535, np.uint16)).resize(
                (1920, 1080), Image.NEAREST)
            name = os.path.basename(dataset.files[i])
            label.save(os.path.join(dirs["labelTrainIds"], name))
            label.save(os.path.join(dirs["labelTrainIds_invalid"], name))
            conf.save(os.path.join(dirs["confidence"], name))
    print(json.dumps({"submitted": n, "dir": out_dir,
                      "stream": "fusion" if use_fusion else "image"}))


if __name__ == "__main__":
    main()
