"""Optimizer + LR schedule.

Behavioral contract:
  * AdamW lr 6e-5, betas (0.9, 0.999), weight decay 0.01
    (configs/_base_/schedules/adamw.py).
  * paramwise_cfg: decode-head params get lr x10; norm parameters (LayerNorm
    / BN scale+bias) get weight-decay 0
    (configs/fusion/cs2dsec_image+events_together_b5.py:78-84). Biases keep
    decay in mmcv unless listed — we exempt norm params only, plus the
    'pos_block' rule which MiT has no params for.
  * poly LR power 1.0, min_lr 0, with 1500-iter linear warmup from
    lr * 1e-6 (configs/_base_/schedules/poly10warm.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def poly_warmup_schedule(base_lr: float, max_iters: int, warmup_iters: int = 1500,
                         warmup_ratio: float = 1e-6, power: float = 1.0,
                         min_lr: float = 0.0):
    """mmcv PolyLrUpdater + linear warmup semantics.

    Warmup multiplies the *regular* poly lr by a factor ramping
    warmup_ratio -> 1 over warmup_iters; after warmup, pure poly decay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        coeff = (1.0 - step / max_iters) ** power
        regular = (base_lr - min_lr) * coeff + min_lr
        k = (1.0 - step / warmup_iters) * (1.0 - warmup_ratio)
        warmup_lr = regular * (1.0 - k)
        return jnp.where(step < warmup_iters, warmup_lr, regular)

    return schedule


def _is_norm_param(path) -> bool:
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(str(n) for n in names)
    # LayerNorm params are 'scale'/'bias' under a '*norm*' module; BN under 'bn'
    return any(("norm" in str(n).lower()) or str(n) == "bn" for n in names)


def _is_head_param(path) -> bool:
    return any(str(getattr(p, "key", p)) in ("decode_head",) for p in path)


def make_optimizer(params, cfg):
    """cfg: OptimConfig. Returns optax.GradientTransformation.

    Implements param groups via optax.multi_transform keyed on
    (head vs backbone) x lr_mult, with a weight-decay mask excluding norm
    parameters."""
    schedule = poly_warmup_schedule(
        cfg.lr, cfg.max_iters, cfg.warmup_iters, cfg.warmup_ratio,
        cfg.power, cfg.min_lr)
    head_schedule = poly_warmup_schedule(
        cfg.lr * cfg.head_lr_mult, cfg.max_iters, cfg.warmup_iters,
        cfg.warmup_ratio, cfg.power, cfg.min_lr)

    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_norm_param(path), params)

    def adamw(sched):
        return optax.adamw(learning_rate=sched, b1=cfg.betas[0],
                           b2=cfg.betas[1], weight_decay=cfg.weight_decay,
                           mask=decay_mask)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "head" if _is_head_param(path) else "backbone", params)
    tx = optax.multi_transform(
        {"head": adamw(head_schedule), "backbone": adamw(schedule)}, labels)
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
