"""Training loop + periodic evaluation + checkpointing.

Replaces mmcv's IterBasedRunner + hook stack (reference mmseg/apis/train.py:
39-131): an explicit iteration loop around the fused DACS step with
  * JSON-lines logging (the reference's .log.json TextLoggerHook output),
  * periodic evaluation every ``eval_interval`` iters with the reference's
    directory-renaming convention (``<iter>_<mIoU>``, eval_hooks.py:43-60),
  * orbax checkpoints of {params, ema_params (teacher), batch_stats,
    opt_state, step} (mirrors the reference's single iter_40000.pth with
    student + ema_model + optimizer, SURVEY §5.4),
  * a source snapshot (code.tar.gz) + environment capture at launch
    (reference tools/train.py:111, mmseg/utils/collect_env.py).
"""
from __future__ import annotations

import json
import os
import platform
import tarfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import RunConfig
from ..data.loader import PrefetchLoader, collate
from ..ops.metrics import intersect_and_union, eval_metrics, summarize_miou
from ..uda.dacs import DACSTrainer, DACSTrainState

CLASS_NAMES = ("road", "sidewalk", "building", "wall", "fence", "pole",
               "traffic light", "traffic sign", "vegetation", "terrain",
               "sky", "person", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")


def device_prefetch(host_iter, place, depth: int):
    """Stage ``depth`` batches ahead on device.

    ``place`` (jnp.asarray / sharded device_put) dispatches asynchronously,
    so the h2d copy for batch N+1 rides along while step N executes instead
    of serializing after it — the classic TPU input-pipeline idiom
    (cf. flax.jax_utils.prefetch_to_device). Costs ``depth`` extra batches
    of HBM (~0.2 GB at the b8 flagship shape, within the measured headroom)."""
    from collections import deque
    buf = deque()
    for b in host_iter:
        buf.append(place(b))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def collect_env() -> dict:
    return {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
    }


def snapshot_code(work_dir: str, repo_root: str | None = None):
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = os.path.join(work_dir, "code.tar.gz")
    with tarfile.open(out, "w:gz") as tar:
        for sub in ("cmda_tpu", "tools", "tests", "bench.py"):
            path = os.path.join(repo_root, sub)
            if os.path.exists(path):
                tar.add(path, arcname=sub)
    return out


def save_checkpoint(state: DACSTrainState, path: str, meta: dict | None = None):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    tree = {
        "step": state.step, "params": state.params,
        "ema_params": state.ema_params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(os.path.abspath(path), tree, force=True)
    if meta is not None:
        # the reference bakes CLASSES/PALETTE/config into checkpoint meta
        # (tools/train.py:154-161); orbax trees hold arrays, so ours rides
        # alongside as meta.json
        with open(os.path.join(os.path.abspath(path), "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, default=str)


def load_checkpoint(state: DACSTrainState, path: str) -> DACSTrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    tree = {
        "step": state.step, "params": state.params,
        "ema_params": state.ema_params, "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(os.path.abspath(path), item=tree)
    return state.replace(**restored)


def allreduce_histograms(totals: list) -> list:
    """Sum per-host confusion histograms across processes.

    The multi-process evaluation reduction (the reference's
    collect_results_cpu + multi_gpu_test, mmseg/apis/test.py:216-273,
    and DistEvalHook, eval_hooks.py:68-122): each host evaluates its file
    shard, then the 4x[num_classes] intersect/union histograms are
    all-gathered and summed so every host reports the exact global mIoU.
    A no-op single-process. Safe even if hosts evaluated identical (not
    sharded) datasets: summing identical histograms scales intersect and
    union equally, leaving every IoU unchanged."""
    if jax.process_count() <= 1:
        return totals
    from jax.experimental import multihost_utils
    # Rendezvous BEFORE the first cross-process collective: hosts reach the
    # end of their eval shards minutes apart (local jit compiles are not
    # synchronized), and the collective backend's clique bring-up has a
    # short handshake window (XLA:CPU gloo: 30 s GetKeyValue) that a slow
    # peer blows through. The coordination-service barrier waits as long
    # as it takes; the allgather then starts aligned on every host.
    from ..parallel.mesh import coordination_barrier
    coordination_barrier("allreduce_histograms")
    gathered = multihost_utils.process_allgather(np.stack(totals))
    summed = np.asarray(gathered).sum(axis=0)
    return [summed[k] for k in range(len(totals))]


def evaluate_fusion(trainer: DACSTrainer, state: DACSTrainState, dataset, *,
                    output: str = "fusion", use_teacher: bool = False,
                    num_classes: int = 19, max_samples: int | None = None,
                    batch_size: int = 1, show_dir: str | None = None,
                    inference: str = "whole",
                    slide_crop: tuple[int, int] = (512, 512),
                    slide_stride: tuple[int, int] = (341, 341),
                    slide_crop_chunk: int | None = None,
                    aug_test: bool = False,
                    opacity: float | None = None) -> dict:
    """Whole-image or sliding-window inference over a test dataset -> mIoU.

    Mirrors single_gpu_test_events + dataset.evaluate (reference
    mmseg/apis/test.py:109-213, mmseg/datasets/dsec.py:387-497): fusion
    stream logits at input resolution, argmax, 19-class histograms; the
    18-class summary applies the x19/18 rule. ``inference='slide'`` compiles
    the reference's crop-accumulate loop (encoder_decoder.py:175-218) as one
    XLA program over both modalities. ``aug_test=True`` averages softmax
    over the reference's hard-coded TTA grid — img_ratios 0.5..1.75 plus
    horizontal flip (reference tools/test.py:118-123) — in whole mode.
    Under multi-process runs the per-host
    histograms are all-reduced before scoring (allreduce_histograms), so a
    host-sharded val set yields the exact global mIoU on every host."""
    if aug_test and inference == "slide":
        raise ValueError("aug_test applies to whole-image inference only")
    params = state.ema_params if use_teacher else state.params
    batch_stats = state.batch_stats
    if jax.process_count() > 1:
        # multi-process state arrays span processes; pull the (fully
        # replicated) weights to host so eval jits run on local devices
        params = jax.device_get(params)
        batch_stats = jax.device_get(batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}
    model = trainer.model

    # NOTE: ``variables`` is a jit ARGUMENT, never a closure constant — a
    # closed-over b5 weight set bakes ~0.3 GB of constants into the HLO and
    # the axon remote-compile service rejects the request (HTTP 413); as
    # arguments the weights ride the normal device transfer path.
    def logits_fn(variables, image, events):
        if output == "isr":
            # the ISR stream rides the events decoder on the isr input slot
            # (reference decode_head.py:536-561 forward_test output select)
            return model.apply(variables, image, None, events,
                               mode="no_fusion", output="isr")
        return model.apply(variables, image, events, None, mode="default",
                           output=output)

    @jax.jit
    def infer(variables, image, events):
        if inference == "slide":
            from ..models.segmentor import slide_inference
            both = jnp.concatenate([image, events], axis=-1)

            def crop_fn(x):
                return logits_fn(variables, x[..., :3], x[..., 3:])

            logits = slide_inference(crop_fn, both, crop_size=slide_crop,
                                     stride=slide_stride,
                                     num_classes=num_classes,
                                     crop_chunk=slide_crop_chunk)
            return jnp.argmax(logits, axis=-1)
        if aug_test:
            from ..models.segmentor import multi_scale_flip_inference
            both = jnp.concatenate([image, events], axis=-1)
            nc = image.shape[-1]
            prob = multi_scale_flip_inference(
                lambda x: logits_fn(variables, x[..., :nc], x[..., nc:]),
                both,
                scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75), flip=True)
            return jnp.argmax(prob, axis=-1)
        return jnp.argmax(logits_fn(variables, image, events), axis=-1)

    @jax.jit
    def infer_image_only(variables, image):
        def img_logits(x):
            return model.apply(variables, x, None, None, mode="no_fusion",
                               output="image")
        if aug_test:
            from ..models.segmentor import multi_scale_flip_inference
            prob = multi_scale_flip_inference(
                img_logits, image,
                scales=(0.5, 0.75, 1.0, 1.25, 1.5, 1.75), flip=True)
            return jnp.argmax(prob, axis=-1)
        return jnp.argmax(img_logits(image), axis=-1)

    # HTTP-413 guard: weights must be jit ARGUMENTS, never closure
    # constants (see NOTE above) — fails fast at eval construction if a
    # refactor reintroduces a captured variables dict
    from ..utils.guards import assert_lean_closure
    assert_lean_closure(infer)
    assert_lean_closure(infer_image_only)

    totals = [np.zeros(num_classes, np.float64) for _ in range(4)]
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for start in range(0, n, batch_size):
        idxs = range(start, min(start + batch_size, n))
        samples = [dataset[i] for i in idxs]
        batch = collate(samples)
        image = jnp.asarray(batch["image"])
        second = batch.get("events", batch.get("isr"))
        if second is not None:
            pred = infer(variables, image, jnp.asarray(second))
        else:
            pred = infer_image_only(variables, image)
        pred = np.asarray(pred)
        for j, s in enumerate(samples):
            res = intersect_and_union(pred[j], s["label"], num_classes)
            for k in range(4):
                totals[k] += res[k]
            if show_dir is not None:
                from ..utils.visualization import show_result
                # prefix by process index so per-host shards never collide
                tag = (f"p{jax.process_index()}_"
                       if jax.process_count() > 1 else "")
                show_result(
                    s["image"], pred[j], gt=s.get("label"),
                    events=s.get("events", s.get("isr")),
                    out_path=os.path.join(show_dir,
                                          f"{tag}{start + j:06d}.png"),
                    opacity=opacity)
    totals = allreduce_histograms(totals)
    ret = eval_metrics(*totals)
    summary = summarize_miou(ret, valid_classes=18)
    summary["per_class_iou"] = {
        CLASS_NAMES[i]: float(ret["IoU"][i]) for i in range(num_classes)}
    return summary


class TrainLoop:
    def __init__(self, cfg: RunConfig, *, dataset, val_dataset=None,
                 work_dir: str | None = None, num_workers: int | None = None,
                 mesh=None, shard_opt_state: bool = False,
                 tensor_parallel: bool = False):
        """``mesh``: a jax.sharding.Mesh turns the step into the GSPMD
        data-parallel step (parallel/mesh.py) — REQUIRED for multi-host
        runs, where each host's loader feeds its local shard of the global
        batch and gradients sync through the mesh psum; without it every
        process would train an unsynchronized replica. ``shard_opt_state``
        adds ZeRO-1 moment sharding over the 'data' axis;
        ``tensor_parallel`` shards the encoder blocks over the mesh's
        'model' axis (parallel/mesh.py tp_state_sharding)."""
        self.cfg = cfg
        self.trainer = DACSTrainer(cfg)
        self.mesh = mesh
        self.shard_opt_state = shard_opt_state
        self.tensor_parallel = tensor_parallel
        self.dataset = dataset
        self.val_dataset = val_dataset
        ts = time.strftime("%Y%m%d_%H%M%S")
        self.work_dir = work_dir or os.path.join(cfg.work_dir,
                                                 f"{ts}_{cfg.name}")
        os.makedirs(self.work_dir, exist_ok=True)
        self.log_path = os.path.join(self.work_dir, f"{ts}.log.json")
        self._log_file = open(self.log_path, "a")
        self.loader = PrefetchLoader(dataset, cfg.data.batch_size,
                                     num_workers=num_workers or cfg.data.workers,
                                     seed=cfg.seed)

    def log(self, record: dict):
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()

    def _dump_debug_grids(self, it: int, dbg: dict):
        """class_mix_debug grids (reference dacs.py:882-1097): one PNG per
        batch sample with source/target/mixed inputs, labels, second
        modality, and the domain-mask / pseudo-weight row."""
        from ..utils.visualization import (
            colorize_label, denorm_to_uint8, signed_to_uint8, grid_panel)
        from PIL import Image
        out_dir = os.path.join(self.work_dir, "class_mix_debug")
        os.makedirs(out_dir, exist_ok=True)
        b = dbg["day_image"].shape[0]

        def gray(x):  # [H,W] float in [0,1] -> rgb uint8
            u8 = np.clip(x * 255.0, 0, 255).astype(np.uint8)
            return np.repeat(u8[..., None], 3, -1)

        for i in range(min(b, 2)):
            rows = [
                [denorm_to_uint8(dbg["day_image"][i]),
                 denorm_to_uint8(dbg["night_image"][i]),
                 denorm_to_uint8(dbg["mixed_img"][i])],
                [colorize_label(dbg["day_label"][i]),
                 colorize_label(dbg["pseudo_label"][i]),
                 colorize_label(dbg["mixed_lbl"][i])],
            ]
            second = ("night_events" if "night_events" in dbg else "night_isr")
            mixed2 = ("mixed_events" if "mixed_events" in dbg else "mixed_isr")
            rows.append([signed_to_uint8(dbg["day_isr"][i][..., 0]),
                         signed_to_uint8(dbg[second][i][..., 0]),
                         signed_to_uint8(dbg[mixed2][i][..., 0])])
            rows.append([gray(dbg["masks"][i].astype(np.float32)),
                         gray(dbg["pseudo_weight"][i]),
                         gray(dbg["mixed_weight"][i])])
            panel = grid_panel(rows)
            Image.fromarray(panel).save(
                os.path.join(out_dir, f"{it + 1:06d}_{i}.png"))

    def run(self, max_iters: int | None = None, state=None):
        cfg = self.cfg
        max_iters = max_iters or cfg.optim.max_iters
        snapshot_code(self.work_dir)
        self.log({"env": collect_env(), "config": cfg.name,
                  "max_iters": max_iters})
        rng = jax.random.PRNGKey(cfg.seed)
        if state is None:
            state = self.trainer.init_state(rng)
        if self.mesh is not None:
            from ..parallel.mesh import (make_parallel_train_step,
                                         opt_state_sharding, shard_batch,
                                         shard_batch_multihost,
                                         tp_state_sharding)
            step_fn = make_parallel_train_step(
                self.trainer, self.mesh, donate=True,
                shard_opt_state=self.shard_opt_state,
                tensor_parallel=self.tensor_parallel)
            if self.tensor_parallel:
                state = jax.tree.map(jax.device_put, state,
                                     tp_state_sharding(state, self.mesh))
            if self.shard_opt_state:
                zsh = opt_state_sharding(state.opt_state, self.mesh)
                state = state.replace(opt_state=jax.tree.map(
                    jax.device_put, state.opt_state, zsh))
            multihost = jax.process_count() > 1

            def place_batch(b):
                return (shard_batch_multihost(b, self.mesh) if multihost
                        else shard_batch(b, self.mesh))
        else:
            step_fn = self.trainer.jit_train_step(donate=True)

            def place_batch(b):
                return jax.tree.map(jnp.asarray, b)
        base_rng = jax.random.fold_in(rng, 1)

        if cfg.data.wire_bf16:
            # compact wire: bf16 floats, 1-channel mono streams, uint8
            # labels — decoded inside the jitted step (data/wire.py). Cuts
            # the per-step h2d ~3.6x, which on the tunneled single-core
            # sandbox is the difference between input-bound and hidden.
            from ..data.wire import encode_wire
            host_batches = (encode_wire(b) for b in self.loader)
        else:
            host_batches = iter(self.loader)
        if cfg.data.device_prefetch > 0:
            batches = device_prefetch(host_batches, place_batch,
                                      cfg.data.device_prefetch)
        else:
            batches = (place_batch(b) for b in host_batches)
        t_start = time.perf_counter()
        t_last = t_start
        debug_fn = None
        for it in range(int(state.step), max_iters):
            t_data = time.perf_counter()
            batch = next(batches)
            data_time = time.perf_counter() - t_data
            if (cfg.debug_img_interval and self.mesh is None
                    and (it + 1) % cfg.debug_img_interval == 0):
                # debug grids are a single-device path; under a mesh the
                # donated sharded state would need its own pjit — skipped
                # snapshot BEFORE the step (state is donated by step_fn)
                if debug_fn is None:
                    debug_fn = self.trainer.jit_debug_tensors()
                dbg = jax.device_get(debug_fn(state, batch, base_rng))
                self._dump_debug_grids(it, dbg)
            state, logs = step_fn(state, batch, base_rng)
            if (it + 1) % cfg.log_interval == 0 or it == 0:
                # ONE host fetch for all ~17 log scalars: per-scalar float()
                # costs a full tunnel round-trip each (~80 ms d2h RTT on
                # axon — 1.4 s/log-iter of pure latency otherwise)
                keys = sorted(logs)
                vals = np.asarray(jnp.stack([logs[k].astype(jnp.float32)
                                             for k in keys]))
                now = time.perf_counter()
                rec = dict(zip(keys, (float(v) for v in vals)))
                rec.update(iter=it + 1,
                           time=(now - t_last) / cfg.log_interval,
                           data_time=data_time)
                t_last = now
                self.log(rec)
            # checkpoint BEFORE the periodic eval: the eval path cold-compiles
            # a second executable, and a transient infra failure there (the
            # axon remote-compile service drops connections now and then)
            # must not cost the training state
            if (it + 1) % cfg.checkpoint_interval == 0 or (it + 1) == max_iters:
                import dataclasses
                from ..utils.visualization import CITYSCAPES_PALETTE
                meta = {"classes": CLASS_NAMES,
                        "palette": CITYSCAPES_PALETTE.tolist(),
                        "config": dataclasses.asdict(cfg),
                        "iter": it + 1}
                save_checkpoint(state, os.path.join(
                    self.work_dir, f"iter_{it + 1}"), meta=meta)
                self._prune_checkpoints(cfg.checkpoint_max_keep)
            if self.val_dataset is not None and (it + 1) % cfg.eval_interval == 0:
                # prediction panels land in test_results_<iter>, then the
                # dir is renamed with the score (reference eval_hooks.py:43-60).
                # Periodic eval is an observer: transient failures are logged
                # and retried, never allowed to kill the run.
                eval_dir = os.path.join(self.work_dir,
                                        f"test_results_{it + 1}")
                summary = None
                for attempt in range(3):
                    try:
                        summary = evaluate_fusion(
                            self.trainer, state, self.val_dataset,
                            num_classes=cfg.data.num_classes,
                            show_dir=eval_dir)
                        break
                    except Exception as e:  # noqa: BLE001 — infra flake
                        self.log({"iter": it + 1, "eval_attempt": attempt,
                                  "eval_error": repr(e)[:300]})
                        if attempt < 2:
                            time.sleep(90)
                if summary is not None:
                    self.log({"iter": it + 1, "eval": summary})
                    scored = f"{eval_dir}_{summary['mIoU'] * 100:.2f}"
                    if os.path.isdir(eval_dir):
                        # idempotent under segment replay (train_chunked
                        # resume re-runs an eval iter): a scored dir from
                        # the previous attempt is superseded, not fatal
                        if os.path.isdir(scored):
                            import shutil
                            shutil.rmtree(scored, ignore_errors=True)
                        os.rename(eval_dir, scored)
                    else:
                        os.makedirs(scored, exist_ok=True)
        self.loader.close()
        return state

    def _prune_checkpoints(self, max_keep: int):
        """Keep the newest ``max_keep`` iter_* checkpoints (the reference's
        max_keep_ckpts=1, configs/...b5.py:89)."""
        if not max_keep or max_keep < 1:
            return
        import re
        import shutil
        ckpts = sorted(
            (d for d in os.listdir(self.work_dir)
             if re.match(r"iter_\d+$", d)
             and os.path.isdir(os.path.join(self.work_dir, d))),
            key=lambda d: int(d.split("_")[1]))
        for d in ckpts[:-max_keep]:
            shutil.rmtree(os.path.join(self.work_dir, d))
