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


def scale_by_adam_lp(b1: float, b2: float, eps: float = 1e-8,
                     moment_dtype=None):
    """optax.scale_by_adam with LOW-PRECISION moment storage.

    Both moments are stored in ``moment_dtype`` (e.g. bfloat16) and
    promoted to f32 for the update arithmetic each step. For the ~210M
    param flagship this returns ~1.6 GB of HBM vs f32 moments (the
    VERDICT r1 item 4 buy-back lever); numerics validated by the
    loss-overlay test (tests/test_train_loop.py) and the bf16-vs-f32
    bench experiment logged in docs/PERF.md."""
    import optax

    def init_fn(params):
        dt = moment_dtype
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=dt or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=dt or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        b1c = 1.0 - jnp.asarray(b1, jnp.float32) ** count
        b2c = 1.0 - jnp.asarray(b2, jnp.float32) ** count

        def mu_next(g, mu):
            return b1 * mu.astype(jnp.float32) + (1 - b1) * g.astype(
                jnp.float32)

        def nu_next(g, nu):
            g = g.astype(jnp.float32)
            return b2 * nu.astype(jnp.float32) + (1 - b2) * g * g

        muf = jax.tree.map(mu_next, updates, state.mu)
        nuf = jax.tree.map(nu_next, updates, state.nu)
        out = jax.tree.map(
            lambda m, v: (m / b1c) / (jnp.sqrt(v / b2c) + eps), muf, nuf)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m, o: m.astype(o.dtype), muf, state.mu),
            nu=jax.tree.map(lambda v, o: v.astype(o.dtype), nuf, state.nu))
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


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

    moment_dtype = getattr(cfg, "moment_dtype", "float32")

    def adamw(sched):
        if moment_dtype and moment_dtype != "float32":
            # low-precision moments (HBM buy-back, see scale_by_adam_lp)
            return optax.chain(
                scale_by_adam_lp(cfg.betas[0], cfg.betas[1],
                                 moment_dtype=jnp.dtype(moment_dtype)),
                optax.add_decayed_weights(cfg.weight_decay, decay_mask),
                optax.scale_by_learning_rate(sched))
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
