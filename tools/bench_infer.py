"""Inference throughput benchmark: the eval-time fusion forward.

Measures FusionEncoderDecoder whole-inference (the EvalHook/test-CLI path,
reference encoder_decoder.py:897-936 + apis/test.py batch-1 loop) on the
local chip, at the DSEC eval geometry (440x640 cropped frames) for batch 1
and a throughput batch. The eval head decodes all streams as one stacked
pass (docs/PERF.md batched-head section).

Usage: python tools/bench_infer.py [--batch 8] [--steps 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--height", type=int, default=440)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--slide", action="store_true",
                    help="also bench slide-inference at the DarkZurich "
                         "1080x1920 submission geometry "
                         "(reference encoder_decoder.py:175-218)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cmda_tpu.config import cs2dsec_image_events_b5, replace
    from cmda_tpu.uda.dacs import DACSTrainer
    from cmda_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    cfg = cs2dsec_image_events_b5()
    cfg = replace(cfg, dtype="bfloat16",
                  uda=replace(cfg.uda, use_cyclegan_day_events=False))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    def make_infer_n(n):
        # n chained inferences inside ONE jitted program: each iteration's
        # input depends on the previous prediction, so executions cannot be
        # elided/deduped by the backend (the axon tunnel's
        # block_until_ready is unreliable for repeated identical dispatches)
        @jax.jit
        def infer_n(params, bstats, image, events):
            def body(_, carry):
                img, acc = carry
                logits = trainer.model.apply(
                    {"params": params, "batch_stats": bstats},
                    img, events, None, mode="default", output="fusion")
                pred = jnp.argmax(logits, axis=-1)
                img = img + 0.0 * pred[..., None].astype(img.dtype)
                return img, acc + jnp.sum(pred)
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (image, jnp.zeros((), jnp.int32)))
            return acc
        return infer_n

    g = np.random.default_rng(0)
    report = {}
    for b in sorted({1, args.batch}):
        img = jnp.asarray(g.normal(size=(b, args.height, args.width, 3)),
                          jnp.float32)
        ev = jnp.asarray(g.normal(size=(b, args.height, args.width, 3)),
                         jnp.float32)
        one = make_infer_n(1)
        many = make_infer_n(1 + args.steps)
        int(one(state.params, state.batch_stats, img, ev))   # warm both
        int(many(state.params, state.batch_stats, img, ev))
        t0 = time.perf_counter()
        int(one(state.params, state.batch_stats, img, ev))
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        int(many(state.params, state.batch_stats, img, ev))
        dt = (time.perf_counter() - t0 - dt1) / args.steps
        report[f"batch{b}_ms"] = round(dt * 1e3, 2)
        report[f"batch{b}_samples_per_s"] = round(b / dt, 2)
    if args.slide:
        from cmda_tpu.models.segmentor import slide_inference

        @jax.jit
        def slide_n(params, bstats, both, n):
            def crop_fn(x):
                return trainer.model.apply(
                    {"params": params, "batch_stats": bstats},
                    x[..., :3], x[..., 3:], None, mode="default",
                    output="fusion").astype(jnp.float32)

            def body(_, carry):
                im, acc = carry
                logits = slide_inference(crop_fn, im, crop_size=(512, 512),
                                         stride=(341, 341), num_classes=19)
                pred = jnp.argmax(logits, axis=-1)
                im = im + 0.0 * pred[..., None].astype(im.dtype)
                return im, acc + jnp.sum(pred)
            _, acc = jax.lax.fori_loop(0, n, body,
                                       (both, jnp.zeros((), jnp.int32)))
            return acc

        both = jnp.asarray(g.normal(size=(1, 1080, 1920, 6)), jnp.float32)
        int(slide_n(state.params, state.batch_stats, both, 1))
        t0 = time.perf_counter()
        int(slide_n(state.params, state.batch_stats, both, 4))
        dt = (time.perf_counter() - t0) / 4
        report["slide_1080x1920_ms"] = round(dt * 1e3, 1)
        report["slide_1080x1920_fps"] = round(1.0 / dt, 2)
    print(json.dumps({
        "metric": "fusion_whole_inference",
        "unit": f"MiT-b5 fusion encode_decode, {args.height}x{args.width}, bf16",
        **report}))


if __name__ == "__main__":
    main()
