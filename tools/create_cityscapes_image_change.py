"""Offline Cityscapes temporal image-change (IC1) + CycleGAN EN generation.

Replaces reference create_cityscapes_image_change.py:16-190:
  * IC1: log-difference (log(x + 50), dead zone 0.1, clip 0.8, per-sign
    global renorm) between each train frame and the sequence frame
    ``image_change_range`` steps earlier, saved as uint8 L PNGs
    ((ic+1)/2*255 rounded).
  * EN1: the frozen ICD->EN CycleGAN applied to IC1 frames ((v/255-0.5)*2
    in, (v+1)/2*255 out) — uses our flax generator + the torch checkpoint
    importer.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image

LOG_ADD = 50
THRESHOLD = 0.1
CLIP_RANGE = 0.8


def _norm_range(x, lo, hi):
    mn, mx = x.min(), x.max()
    return (x - mn) / (mx - mn + 1e-8) * (hi - lo) + lo


def image_change(now_gray: np.ndarray, front_gray: np.ndarray) -> np.ndarray:
    d = (np.log(now_gray.astype(np.float32) + LOG_ADD)
         - np.log(front_gray.astype(np.float32) + LOG_ADD))
    d[np.abs(d) <= THRESHOLD] = 0.0
    pos = _norm_range(np.clip(np.maximum(d, 0), 0, CLIP_RANGE), 0, 1)
    neg = _norm_range(np.clip(np.minimum(d, 0), -CLIP_RANGE, 0), -1, 0)
    ic = pos + neg
    return np.uint8(np.around((ic + 1) / 2 * 255))


def create_ic(sequence_dir: str, frames_dir: str, out_dir: str,
              image_change_range: int = 1):
    """frames_dir: leftImg8bit/train; sequence_dir: leftImg8bit_sequence/train."""
    for city in sorted(os.listdir(frames_dir)):
        src_seq = osp.join(sequence_dir, city)
        src = osp.join(frames_dir, city)
        dst = osp.join(out_dir, city)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            index = int(name.split("_")[2])
            front_name = name[:-22] + f"{index - image_change_range:06d}_leftImg8bit.png"
            out_name = osp.join(dst, name[:-8] + ".png")
            if osp.exists(out_name):
                continue
            now = np.asarray(Image.open(osp.join(src, name)).convert("L"))
            front = np.asarray(Image.open(osp.join(src_seq, front_name)).convert("L"))
            Image.fromarray(image_change(now, front), mode="L").save(out_name)


def create_en(ic_dir: str, out_dir: str, cyclegan_pth: str):
    """Apply the frozen ICD->EN generator to every IC PNG."""
    import jax
    import jax.numpy as jnp
    from cmda_tpu.models.cyclegan import ResnetGenerator
    from cmda_tpu.utils.torch_import import load_torch_file, convert_resnet_generator

    gen = ResnetGenerator(output_nc=1, n_blocks=9)
    variables = convert_resnet_generator(load_torch_file(cyclegan_pth))

    @jax.jit
    def apply(x):
        return gen.apply(variables, x)

    for city in sorted(os.listdir(ic_dir)):
        src = osp.join(ic_dir, city)
        dst = osp.join(out_dir, city)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            out_name = osp.join(dst, name)
            if osp.exists(out_name):
                continue
            ic = Image.open(osp.join(src, name)).convert("L").resize(
                (1024, 512), resample=Image.BILINEAR)
            x = (np.asarray(ic, np.float32) / 255.0 - 0.5) * 2.0
            y = np.asarray(apply(jnp.asarray(x)[None, :, :, None]))[0, :, :, 0]
            Image.fromarray(np.uint8((y + 1) / 2 * 255), mode="L").save(out_name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", required=True)
    ap.add_argument("--mode", choices=["ic", "en"], default="ic")
    ap.add_argument("--cyclegan", default="pretrained/cityscapes_ICD_to_dsec_EN.pth")
    ap.add_argument("--image_change_range", type=int, default=1)
    args = ap.parse_args()
    if args.mode == "ic":
        create_ic(osp.join(args.root_dir, "leftImg8bit_sequence", "train"),
                  osp.join(args.root_dir, "leftImg8bit", "train"),
                  osp.join(args.root_dir, "leftImg8bit_IC1", "train"),
                  args.image_change_range)
    else:
        create_en(osp.join(args.root_dir, "leftImg8bit_IC1", "train"),
                  osp.join(args.root_dir, "leftImg8bit_EN1", "train"),
                  args.cyclegan)


if __name__ == "__main__":
    main()
