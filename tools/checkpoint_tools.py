"""Checkpoint & work-dir utilities.

Covers the reference's publishing/maintenance tooling:
  * ``publish``      — strip optimizer state + teacher (EMA) from an orbax
                       checkpoint and append a content hash to the dir name
                       (reference tools/publish_model.py:20-30).
  * ``convert``      — keep only the student params/batch_stats, drop
                       ema/cyclegan/imnet (reference function.py:29-38
                       convert_pth).
  * ``param-count``  — per-module parameter counts for a preset config
                       (reference tools/get_param_count.py:24-36).
  * ``rename-work-dirs`` — append the final eval mIoU (from the last
                       ``test_results_<iter>_<mIoU>`` dir) to each work dir
                       name (reference function.py:5-27 rename_work_dirs).

Usage:
  python tools/checkpoint_tools.py publish <ckpt_dir> <out_dir>
  python tools/checkpoint_tools.py convert <ckpt_dir> <out_dir>
  python tools/checkpoint_tools.py param-count --config cs2dsec
  python tools/checkpoint_tools.py rename-work-dirs --root work_dirs
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_tree(path: str):
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def _save_tree(path: str, tree):
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), tree, force=True)


def _tree_hash(tree) -> str:
    import jax
    import numpy as np
    h = hashlib.sha256()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:8]


def publish(in_dir: str, out_dir: str) -> str:
    """Strip optimizer + teacher, save student-only tree, hash-suffix the
    output dir (reference publish_model.py's sha-suffix convention)."""
    tree = _load_tree(in_dir)
    kept = {k: tree[k] for k in ("params", "batch_stats", "step")
            if k in tree}
    digest = _tree_hash(kept)
    final = f"{out_dir.rstrip('/')}-{digest}"
    _save_tree(final, kept)
    print(json.dumps({"published": final, "kept": sorted(kept),
                      "dropped": sorted(set(tree) - set(kept))}))
    return final


def convert(in_dir: str, out_dir: str) -> str:
    """Student-only tree without hash suffix (function.py convert_pth)."""
    tree = _load_tree(in_dir)
    kept = {k: tree[k] for k in ("params", "batch_stats") if k in tree}
    _save_tree(out_dir, kept)
    print(json.dumps({"converted": out_dir, "kept": sorted(kept)}))
    return out_dir


def param_count(config_name: str) -> dict:
    import jax
    import numpy as np
    from cmda_tpu import config as C
    from cmda_tpu.uda.dacs import DACSTrainer

    cfg = {"cs2dsec": C.cs2dsec_image_events_b5,
           "cs2dz": C.cs2dz_image_rawisr_b5,
           "tiny": C.tiny_test_config}[config_name]()
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    counts = {}
    for mod, sub in state.params.items():
        counts[mod] = int(sum(np.prod(x.shape)
                              for x in jax.tree.leaves(sub)))
    counts["TOTAL"] = sum(counts.values())
    print(json.dumps(counts, indent=2))
    return counts


def rename_work_dirs(root: str) -> list:
    """Append [mIoU] from the last test_results_<iter>_<score> dir."""
    renamed = []
    if not os.path.isdir(root):
        return renamed
    for wd in sorted(os.listdir(root)):
        path = os.path.join(root, wd)
        if not os.path.isdir(path) or ("[" in wd and "]" in wd):
            continue
        results = sorted(
            (d for d in os.listdir(path)
             if re.match(r"test_results_\d+_[\d.]+$", d)),
            key=lambda d: int(d.split("_")[2]))
        if not results:
            continue
        score = results[-1].rsplit("_", 1)[1]
        dst = f"{path}[{score}]"
        os.rename(path, dst)
        renamed.append(dst)
    print(json.dumps({"renamed": renamed}))
    return renamed


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("publish")
    p.add_argument("in_dir"), p.add_argument("out_dir")
    p = sub.add_parser("convert")
    p.add_argument("in_dir"), p.add_argument("out_dir")
    p = sub.add_parser("param-count")
    p.add_argument("--config", default="cs2dsec",
                   choices=["cs2dsec", "cs2dz", "tiny"])
    p = sub.add_parser("rename-work-dirs")
    p.add_argument("--root", default="work_dirs")
    args = ap.parse_args()
    if args.cmd == "publish":
        publish(args.in_dir, args.out_dir)
    elif args.cmd == "convert":
        convert(args.in_dir, args.out_dir)
    elif args.cmd == "param-count":
        param_count(args.config)
    elif args.cmd == "rename-work-dirs":
        rename_work_dirs(args.root)


if __name__ == "__main__":
    main()
