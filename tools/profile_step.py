"""Per-component timing of the fused DACS step (VERDICT r1 item 2:
'close the perf gap with evidence').

Compiles and times each piece of the b5 step in isolation — frozen CycleGAN
day-events, teacher forward, mixed-ISR recompute, source fwd+bwd, mixed
fwd+bwd — plus the fused step, and prints one JSON object. Components are
timed on their own compiled programs, so the sum exceeds the fused time
(XLA overlaps in the fused graph); the ratios identify the hog.

Usage: python tools/profile_step.py [--batch 8] [--steps 5] [--trace DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, steps=5, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace", default=None,
                    help="also capture a jax.profiler trace into DIR")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_batch, enable_compile_cache
    from cmda_tpu.config import cs2dsec_image_events_b5, replace
    from cmda_tpu.uda.dacs import DACSTrainer

    enable_compile_cache()
    cfg = cs2dsec_image_events_b5()
    cfg = replace(cfg, dtype="bfloat16",
                  model=replace(cfg.model, remat=True),
                  data=replace(cfg.data, batch_size=args.batch))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, make_batch(args.batch, 512, 512))
    rng = jax.random.PRNGKey(1)
    src, tgt = batch["source"], batch["target"]

    report = {"batch": args.batch}

    # frozen CycleGAN day events
    cg = jax.jit(lambda s, b: trainer._day_events(s, b["source"]))
    report["cyclegan_day_events_s"] = timed(cg, state, batch,
                                            steps=args.steps)

    # teacher forward (fusion, both modalities present)
    teach = jax.jit(lambda s: trainer._teacher_logits(
        s, tgt["image"], tgt["events"], None, "default"))
    report["teacher_forward_s"] = timed(teach, state, steps=args.steps)

    # mixed-ISR recompute (Pallas on TPU)
    dir_idx = jnp.zeros((args.batch,), jnp.int32)
    misr = jax.jit(lambda img: trainer._mixed_isr(img, dir_idx))
    report["mixed_isr_s"] = timed(misr, tgt["image"], steps=args.steps)

    # student fwd+bwd on the source triple (the mixed pass is the same
    # graph on mixed inputs)
    def fwd_loss(params, bstats):
        (logits, feats), upd = trainer.model.apply(
            {"params": params, "batch_stats": bstats},
            src["image"], src["img_time_res"], src["img_self_res"],
            mode="default", mutable=["batch_stats"],
            rngs={"dropout": rng, "droppath": rng},
            method=trainer.model.forward_train)
        from cmda_tpu.uda.transforms import multi_stream_loss
        loss, _ = multi_stream_loss(logits, src["label"], None,
                                    w_image=0.5, w_events=0.5,
                                    w_fusion=0.5, w_isr=0.25)
        return loss

    grad_fn = jax.jit(jax.grad(fwd_loss))
    report["student_fwd_bwd_s"] = timed(grad_fn, state.params,
                                        state.batch_stats, steps=args.steps)

    # the fused step (donated state keeps memory flat next to the live
    # component executables)
    step = trainer.jit_train_step(donate=True)
    s = state
    for _ in range(2):
        s, logs = step(s, batch, rng)
    jax.block_until_ready(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        s, logs = step(s, batch, rng)
    jax.block_until_ready(logs["loss"])
    report["fused_step_s"] = (time.perf_counter() - t0) / args.steps
    report["fused_samples_per_s"] = round(args.batch
                                          / report["fused_step_s"], 3)
    # expected composition: cyclegan + teacher + mixed_isr + 2x fwd_bwd
    report["sum_components_s"] = round(
        report["cyclegan_day_events_s"] + report["teacher_forward_s"]
        + report["mixed_isr_s"] + 2 * report["student_fwd_bwd_s"], 4)
    report = {k: (round(v, 4) if isinstance(v, float) else v)
              for k, v in report.items()}

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                s, logs = step(s, batch, rng)
            jax.block_until_ready(logs["loss"])
        report["trace_dir"] = args.trace

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
