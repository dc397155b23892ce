"""Single-image inference CLI (reference mmseg/apis/inference.py +
demo usage): config + checkpoint + image path(s) -> prediction PNGs and
optional image|second|pred panels.

    python tools/infer.py --config cs2dz --checkpoint work/iter_40000 \
        night1.png night2.png --out-dir preds/
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="cmda_tpu single-image inference")
    p.add_argument("images", nargs="+", help="image file(s) to segment")
    p.add_argument("--config", default="cs2dz",
                   choices=["cs2dsec", "cs2dz", "tiny"])
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference iter_40000.pth")
    p.add_argument("--output-type", default=None,
                   choices=["fusion", "image", "events", "isr"])
    p.add_argument("--use-teacher", action="store_true")
    p.add_argument("--out-dir", default="inference_out")
    p.add_argument("--panel", action="store_true",
                   help="also write image|second|pred panels")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VAL")
    args = p.parse_args()

    from cmda_tpu.apis import init_segmentor, inference_segmentor
    from cmda_tpu.utils.profiling import enable_compile_cache
    from cmda_tpu.utils.visualization import colorize_label
    enable_compile_cache()
    seg = init_segmentor(args.config, checkpoint=args.checkpoint,
                         torch_checkpoint=args.torch_checkpoint,
                         output=args.output_type,
                         use_teacher=args.use_teacher,
                         overrides=args.overrides)
    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image
    for path in args.images:
        stem = os.path.splitext(os.path.basename(path))[0]
        panel = (os.path.join(args.out_dir, f"{stem}_panel.png")
                 if args.panel else None)
        pred = inference_segmentor(seg, path, out_file=panel)
        Image.fromarray(pred.astype("uint8")).save(
            os.path.join(args.out_dir, f"{stem}_pred.png"))
        Image.fromarray(colorize_label(pred)).save(
            os.path.join(args.out_dir, f"{stem}_color.png"))
        print(json.dumps({"image": path, "pred": f"{stem}_pred.png",
                          "classes": sorted(set(pred.reshape(-1).tolist()))}))


if __name__ == "__main__":
    main()
