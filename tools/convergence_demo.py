"""Convergence demonstration: UDA beats a source-only control.

The sandbox has no real Cityscapes/DSEC data, so mIoU parity with the
reference (BASELINE config 4) cannot be measured here. This is the closest
feasible proxy (VERDICT r1 item 5): LEARNABLE synthetic scenes
(cmda_tpu/data/synthetic.py LearnableScenes — bright source domain, 4x
darkened + noisier target rendered from the same class->color palette)
trained with (a) the full DACS UDA objective (teacher pseudo-labels +
ClassMix, reference mmseg/models/uda/dacs.py:357-880) and (b) the
supervised source-only control (uda.source_only=True). Target-domain eval
mIoU must rise substantially above the control — i.e. the self-training
objective itself demonstrably adapts.

    python tools/convergence_demo.py --iters 300 --work-dir work_dirs/convergence

Writes <work-dir>/{uda,source_only}/<ts>.log.json and prints a one-line
JSON summary.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, cfg, iters, eval_every, work_dir, eval_len=32,
                resume=False):
    import jax
    from cmda_tpu.data.synthetic import LearnableScenes
    from cmda_tpu.data.uda import UDAPairDataset
    from cmda_tpu.train.loop import TrainLoop, evaluate_fusion

    crop = tuple(cfg.data.crop_size)
    src = LearnableScenes(domain="source", crop_size=crop, length=200)
    tgt = LearnableScenes(domain="target", crop_size=crop, length=200)
    val = LearnableScenes(domain="target", crop_size=crop, length=eval_len,
                          seed=99, test_mode=True)
    loop = TrainLoop(cfg, dataset=UDAPairDataset(src, tgt, seed=cfg.seed),
                     val_dataset=val,
                     work_dir=os.path.join(work_dir, name))
    state = None
    if resume:
        # pick up after a wedged/killed run: periodic checkpoints live in
        # <work_dir>/<name>/iter_<k>
        ckpts = sorted(glob.glob(os.path.join(work_dir, name, "iter_*")),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        if ckpts:
            from cmda_tpu.train.loop import load_checkpoint
            state = load_checkpoint(
                loop.trainer.init_state(jax.random.PRNGKey(cfg.seed)),
                ckpts[-1])
            print(json.dumps({"resumed": ckpts[-1],
                              "step": int(state.step)}), flush=True)
    state = loop.run(max_iters=iters, state=state)
    final = evaluate_fusion(loop.trainer, state, val,
                            num_classes=cfg.data.num_classes)
    return loop.work_dir, final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--work-dir", default="work_dirs/convergence")
    ap.add_argument("--skip", choices=["", "uda", "source_only"], default="",
                    help="run only the other variant")
    ap.add_argument("--ckpt-every", type=int, default=2000,
                    help="periodic checkpoint interval (wedge insurance)")
    ap.add_argument("--resume", action="store_true",
                    help="continue each variant from its latest iter_* "
                         "checkpoint under --work-dir")
    args = ap.parse_args()

    from cmda_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from cmda_tpu import config as C

    base = C.tiny_test_config()
    base = C.replace(
        base,
        data=C.replace(base.data, batch_size=args.batch),
        eval_interval=args.eval_every,
        checkpoint_interval=args.ckpt_every,
        debug_img_interval=0,
        log_interval=20,
        optim=C.replace(base.optim, max_iters=args.iters, warmup_iters=50,
                        lr=3e-4))

    results = {}
    for name in ("source_only", "uda"):
        if args.skip == name:
            continue
        cfg = base if name == "uda" else C.replace(
            base, uda=C.replace(base.uda, source_only=True))
        wd, final = run_variant(name, cfg, args.iters, args.eval_every,
                                args.work_dir, resume=args.resume)
        results[name] = {"work_dir": wd, "mIoU": final["mIoU"],
                         "aAcc": final["aAcc"]}
        print(json.dumps({name: results[name]}), flush=True)

    if len(results) == 2:
        gain = results["uda"]["mIoU"] - results["source_only"]["mIoU"]
        print(json.dumps({
            "metric": "uda_vs_source_only_target_mIoU_gain",
            "uda_mIoU": round(results["uda"]["mIoU"], 4),
            "source_only_mIoU": round(results["source_only"]["mIoU"], 4),
            "gain": round(gain, 4),
            "iters": args.iters,
        }))


if __name__ == "__main__":
    main()
