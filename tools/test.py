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
    p.add_argument("--output-type", default="fusion",
                   choices=["fusion", "image", "events", "isr"])
    p.add_argument("--use-teacher", action="store_true",
                   help="evaluate the EMA teacher weights")
    p.add_argument("--show-dir", default=None)
    p.add_argument("--inference", default="whole", choices=["whole", "slide"],
                   help="slide = overlapping-crop logit accumulation "
                        "(reference encoder_decoder.py:175-218)")
    p.add_argument("--slide-crop", type=int, nargs=2, default=(512, 512))
    p.add_argument("--slide-stride", type=int, nargs=2, default=(341, 341))
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
        dataset = DSECDataset(args.target_txt,
                              events_bins=cfg.data.events_bins,
                              isr_params=cfg.data.target_isr, test_mode=True,
                              outputs=("image", "events", "label"))
    else:
        from cmda_tpu.data.dark_zurich import DarkZurichDataset
        split = "test" if args.submit_to_website else "val"
        outputs = ("image", "isr") if args.submit_to_website else \
            ("image", "isr", "label")
        dataset = DarkZurichDataset(args.target_root, split=split,
                                    isr_params=cfg.data.target_isr,
                                    outputs=outputs)

    if args.submit_to_website:
        export_submission(trainer, state, dataset, args)
        return

    summary = evaluate_fusion(trainer, state, dataset,
                              output=args.output_type,
                              use_teacher=args.use_teacher,
                              num_classes=cfg.data.num_classes,
                              max_samples=args.max_samples,
                              show_dir=args.show_dir,
                              inference=args.inference,
                              slide_crop=tuple(args.slide_crop),
                              slide_stride=tuple(args.slide_stride))
    print(json.dumps(summary, indent=2))
    if args.show_dir and os.path.isdir(args.show_dir):
        # bake the score into the dir name (reference tools/test.py:232-233)
        scored = f"{args.show_dir.rstrip('/')}_{summary['mIoU'] * 100:.2f}"
        os.rename(args.show_dir, scored)
        print(json.dumps({"show_dir": scored}))


def export_submission(trainer, state, dataset, args):
    """DarkZurich server format: labelTrainIds PNG at 1920x1080."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    out_dir = args.show_dir or "submission"
    os.makedirs(out_dir, exist_ok=True)
    variables = {"params": state.ema_params if args.use_teacher else state.params,
                 "batch_stats": state.batch_stats}
    model = trainer.model

    @jax.jit
    def infer(image, second):
        return jnp.argmax(model.apply(variables, image, second, None,
                                      mode="default", output="fusion"), axis=-1)

    n = len(dataset) if args.max_samples is None else min(len(dataset),
                                                          args.max_samples)
    for i in range(n):
        s = dataset[i]
        pred = infer(jnp.asarray(s["image"])[None],
                     jnp.asarray(s["isr"])[None])
        pred = np.asarray(pred)[0].astype(np.uint8)
        img = Image.fromarray(pred).resize((1920, 1080), Image.NEAREST)
        name = dataset.files[i].split("/")[-1].replace("_rgb_anon.png",
                                                       "_labelTrainIds.png")
        img.save(os.path.join(out_dir, name))
    print(json.dumps({"submitted": n, "dir": out_dir}))


if __name__ == "__main__":
    main()
