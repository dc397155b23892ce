"""Benchmark: fused image+event UDA training throughput on one TPU chip.

Measures the FULL DACS train step (teacher forward + source & mixed
multi-stream forwards + backward + AdamW + EMA) on the flagship MiT-b5
FusionEncoderDecoder at 512x512 — the reference's training workload
(batch 2, configs/fusion/cs2dsec_image+events_together_b5.py:14) — and
prints ONE JSON line.

vs_baseline: the reference publishes no throughput (BASELINE.md). We anchor
against an ESTIMATE of the PyTorch reference on its published 1-GPU setup:
CMDA trains 40k iters x batch 2; DAFormer-class mmseg stacks run ~1.1 s/iter
on a 3090-class GPU and CMDA adds a second MiT-b5 + fusion + ISR stream
(~2.3 forward-equivalents vs 1), giving ~0.45 it/s -> ~0.9 samples/s.
REFERENCE_GPU_SPS below records that assumption explicitly; replace with a
measured number when GPU hardware is available.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GPU_SPS = 0.9  # estimated PyTorch reference samples/sec (see above)
TPU_V5E_BF16_PEAK_FLOPS = 197e12  # v5e peak bf16 (MXU) FLOP/s per chip


def make_batch(b, h, w):
    g = np.random.default_rng(0)

    def img():
        return g.normal(size=(b, h, w, 3)).astype(np.float32)

    label = g.integers(0, 19, size=(b, h, w)).astype(np.int32)
    return {
        "source": {"image": img(), "img_self_res": img(),
                   "img_time_res": img(), "label": label},
        "target": {"image": img(), "isr": img(), "events": img()},
    }


def enable_compile_cache():
    from cmda_tpu.utils.profiling import enable_compile_cache as _ecc
    _ecc()


def run(batch_size: int, steps: int = 10, warmup: int = 3,
        remat: str = "block", moments: str = "float32",
        head_batched: bool = False, fused_resize: bool = False,
        stacked_ce: bool = False, split_transpose: bool = False,
        pallas_ce: bool = True, teacher_bf16: bool = False,
        unroll_short: bool = False):
    import sys
    import jax
    import jax.numpy as jnp
    from cmda_tpu.config import cs2dsec_image_events_b5, replace
    from cmda_tpu.ops.resize import set_fused_int_upsample
    from cmda_tpu.uda.dacs import DACSTrainer

    set_fused_int_upsample(fused_resize)

    cfg = cs2dsec_image_events_b5()
    cfg = replace(cfg, dtype="bfloat16",
                  model=replace(cfg.model, remat=remat != "none",
                                remat_policy=("dots" if remat == "dots"
                                              else "full"),
                                head_batched_train=head_batched,
                                scan_split_transpose=split_transpose,
                                scan_unroll_short=unroll_short),
                  data=replace(cfg.data, batch_size=batch_size),
                  optim=replace(cfg.optim, moment_dtype=moments),
                  uda=replace(cfg.uda, use_cyclegan_day_events=True,
                              stacked_stream_ce=stacked_ce,
                              pallas_ce=pallas_ce,
                              teacher_bf16=teacher_bf16))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.jit_train_step(donate=True)
    batch = jax.tree.map(jnp.asarray, make_batch(batch_size, 512, 512))
    rng = jax.random.PRNGKey(1)

    print(f"[bench] batch={batch_size}: compiling...", file=sys.stderr, flush=True)
    t_c = time.perf_counter()
    for _ in range(warmup):
        state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["loss"])
    print(f"[bench] warmup+compile {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, logs = step(state, batch, rng)
    jax.block_until_ready(logs["loss"])
    dt = time.perf_counter() - t0
    stats = {"step_time_s": dt / steps}
    try:
        # measured roofline position (VERDICT r1 weak #1): XLA's own FLOP
        # count for the compiled step / step time / bf16 peak
        compiled = step.lower(state, batch, rng).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            achieved = flops / (dt / steps)
            stats["flops_per_step"] = flops
            stats["achieved_tflops"] = achieved / 1e12
            stats["mfu"] = achieved / TPU_V5E_BF16_PEAK_FLOPS
        mem = compiled.memory_analysis()
        if mem is not None:
            stats["hbm_temp_gb"] = round(
                getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2)
            stats["hbm_args_gb"] = round(
                getattr(mem, "argument_size_in_bytes", 0) / 2**30, 2)
    except Exception as e:  # cost model availability varies by backend
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)
    if fused_resize and "hbm_temp_gb" in stats:
        # The lever's HBM effect is toolchain-dependent (docs/PERF.md): also
        # compile (never execute) the non-fused step and report the temp-HBM
        # delta so the flag self-documents whether it currently helps.
        try:
            set_fused_int_upsample(False)
            step_nf = DACSTrainer(cfg).jit_train_step(donate=True)
            mem_nf = step_nf.lower(state, batch, rng).compile() \
                            .memory_analysis()
            if mem_nf is not None:
                nf = round(getattr(mem_nf, "temp_size_in_bytes", 0) / 2**30, 2)
                stats["hbm_temp_gb_nonfused"] = nf
                stats["hbm_temp_gb_delta"] = round(
                    stats["hbm_temp_gb"] - nf, 2)
        except Exception as e:
            print(f"[bench] non-fused compile for HBM delta failed: {e}",
                  file=sys.stderr)
        finally:
            set_fused_int_upsample(True)
    return batch_size * steps / dt, stats


def main():
    import argparse
    import sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="fixed batch (default: try 8, 4, 2)")
    ap.add_argument("--remat", default="block",
                    choices=["block", "dots", "none"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--moments", default="float32",
                    choices=["float32", "bfloat16"],
                    help="AdamW moment storage dtype (bfloat16 returns "
                         "~1.6 GB HBM on the b5 flagship)")
    ap.add_argument("--head-batched", action="store_true",
                    help="batched multi-stream head in the TRAIN path "
                         "(model.head_batched_train)")
    ap.add_argument("--fused-resize", action="store_true",
                    help="phase-decomposed integer-factor upsamples. "
                         "TOOLCHAIN-DEPENDENT lever (helped on the r2 "
                         "toolchain, hurt on jax-0.9.0); when set, the "
                         "bench also compiles the non-fused step and "
                         "reports hbm_temp_gb_nonfused / _delta so the "
                         "flag self-documents whether it currently helps "
                         "(docs/PERF.md)")
    ap.add_argument("--pallas-ce", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fused Pallas upsample+CE + teacher argmax kernels "
                         "(uda.pallas_ce; ops/pallas_ce.py, parity-tested "
                         "values+grads): the [B,512,512,19] resized logits "
                         "never touch HBM in fwd or bwd. Default ON "
                         "(6.585 vs 6.549 samples/s, docs/PERF.md r4); "
                         "--no-pallas-ce for the plain XLA chain")
    ap.add_argument("--teacher-bf16", action="store_true",
                    help="teacher forward reads a bf16 cast of the EMA "
                         "weights (uda.teacher_bf16); EMA accumulation "
                         "stays f32")
    ap.add_argument("--stacked-ce", action="store_true",
                    help="fold the 4 per-stream CEs into one stacked "
                         "resize+CE chain (uda.stacked_stream_ce; "
                         "parity-tested). MEASURED -8%% and +1.6 GB temp "
                         "HBM at batch 8 on v5e — rejected as a default, "
                         "see docs/PERF.md round-3 table")
    ap.add_argument("--split-transpose", action="store_true",
                    help="lax.scan _split_transpose on the encoder stages "
                         "(model.scan_split_transpose): separates the "
                         "backward recompute scan from the grad-stacking "
                         "transpose scan. MEASURED neutral (-0.06%%) at "
                         "batch 8 — escape hatch if a future toolchain's "
                         "fused schedule regresses (docs/PERF.md)")
    ap.add_argument("--unroll-short", action="store_true",
                    help="fully unroll the depth<=6 encoder stages out of "
                         "lax.scan (model.scan_unroll_short): perf "
                         "experiment vs the grad-stacking DUS bucket "
                         "(docs/PERF.md r2 trace, 10%% of step)")
    args = ap.parse_args()

    enable_compile_cache()
    sps = None
    ladder = (args.batch,) if args.batch else (8, 4, 2)
    for bs in ladder:
        # the axon remote-compile service 500s transiently
        # (TPU_WORKER_HOSTNAMES hiccups — CLAUDE.md); retry those, but
        # treat a genuine HBM OOM as final for this batch size
        for attempt in range(2):
            try:
                sps, stats = run(bs, steps=args.steps, remat=args.remat,
                 moments=args.moments,
                 head_batched=args.head_batched,
                 fused_resize=args.fused_resize,
                 stacked_ce=args.stacked_ce,
                 split_transpose=args.split_transpose,
                 pallas_ce=args.pallas_ce,
                 teacher_bf16=args.teacher_bf16,
                 unroll_short=args.unroll_short)
                batch_size = bs
                break
            except Exception as e:
                print(f"[bench] batch {bs} attempt {attempt}: "
                      f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
                err = e
                if "memory space hbm" in str(e) or "RESOURCE_EXHAUSTED" in str(e):
                    break   # genuine OOM: fall to the next batch size
                time.sleep(30)
        if sps is not None:
            break
    if sps is None:
        raise err
    rec = {
        "metric": "fused_uda_train_samples_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": f"samples/s (MiT-b5 fusion UDA step, 512x512, bf16, batch {batch_size})",
        "vs_baseline": round(sps / REFERENCE_GPU_SPS, 2),
    }
    for k, v in stats.items():
        rec[k] = round(v, 4) if isinstance(v, float) else v
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
