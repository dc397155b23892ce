"""CycleGAN training — TPU-native trainer for the Image Content-Extractor.

The reference ships the CycleGAN *networks* and inference path only
(mmseg/models/cyclegan/cyclegan_model.py: nets :119-207/:316-616, GANLoss
:210-276, scheduler :38-64, WGAN-GP :279-313) and trains the flagship
``cityscapes_ICD_to_dsec_EN.pth`` generator EXTERNALLY with the junyanz
pytorch-CycleGAN repo (reference README.md pretrained table).  This module
closes that gap: the full unpaired A<->B recipe — two generators, two
PatchGAN discriminators, LSGAN objective, L1 cycle + identity losses,
the 50-image history pool, Adam(beta1=0.5) with the linear-decay epoch
schedule (reference get_scheduler :52-58) — as ONE jitted train step.

TPU-native design notes:
  * G-update and D-update are a single XLA program per iteration; the
    "set requires_grad(False)" dance dissolves into two ``jax.grad`` calls
    over disjoint parameter subtrees.
  * The junyanz ImagePool (random replace / random playback, p=0.5) is a
    functional device-side ring buffer carried in the train state — no host
    round-trip; exact sequential per-image semantics via ``lax.fori_loop``.
  * Checkpoints are flat ``.npz`` param trees; ``tools/train.py --cyclegan``
    and ``tools/create_cityscapes_image_change.py --mode en`` accept them
    interchangeably with imported torch ``.pth`` files.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.cyclegan import (
    ResnetGenerator, NLayerDiscriminator, PixelDiscriminator, gan_loss,
)


@dataclasses.dataclass(frozen=True)
class CycleGANConfig:
    """Hyperparameters of the standard unpaired recipe (junyanz defaults,
    matched by the reference's net constructors cyclegan_model.py:119-207)."""
    input_nc: int = 1            # ICD->EN operates on 1-channel IC frames
    ngf: int = 64
    n_blocks: int = 9            # resnet_9blocks (define_G default, :119)
    ndf: int = 64
    n_layers_d: int = 3          # NLayerDiscriminator default (:163)
    netd: str = "patch"          # patch | pixel
    gan_mode: str = "lsgan"      # lsgan | vanilla  (GANLoss :217)
    lambda_a: float = 10.0       # cycle ||G_B(G_A(a)) - a||_1 weight
    lambda_b: float = 10.0
    lambda_identity: float = 0.5  # * lambda_b on ||G_A(b) - b||_1
    pool_size: int = 50
    lr: float = 2e-4
    beta1: float = 0.5           # Adam beta1 (junyanz default)
    n_epochs: int = 100          # constant-lr epochs
    n_epochs_decay: int = 100    # linear decay to 0 (get_scheduler :52-58)
    steps_per_epoch: int = 1000


class CycleGANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any                # {'g_a': A->B, 'g_b': B->A}
    d_params: Any                # {'d_a': judges domain-B, 'd_b': domain-A}
    g_opt: Any
    d_opt: Any
    pool_a: jax.Array            # history of fake domain-A images
    pool_b: jax.Array            # history of fake domain-B images
    pool_n: jax.Array            # images stored so far (shared fill count)


def _linear_decay(cfg: CycleGANConfig):
    """lr multiplier per step: 1.0 for n_epochs, then linear to 0 over
    n_epochs_decay (reference get_scheduler lambda_rule, :52-58; stepped
    per epoch there — per-epoch granularity preserved via floor-divide)."""
    def sched(step):
        epoch = step // cfg.steps_per_epoch
        over = jnp.maximum(0.0, (epoch + 1.0 - cfg.n_epochs))
        return cfg.lr * jnp.maximum(
            0.0, 1.0 - over / (cfg.n_epochs_decay + 1.0))
    return sched


def _pool_query(pool, n_stored, imgs, rng):
    """junyanz ImagePool.query, functionally: per incoming image, if the
    buffer is not full -> store it and return it; else with p=0.5 return a
    random stored image and replace it with the incoming one, otherwise
    return the incoming image. Sequential over the batch (exact semantics)."""
    cap = pool.shape[0]
    out0 = jnp.zeros_like(imgs)

    def body(i, carry):
        pool, n, out = carry
        img = imgs[i]
        k = jax.random.fold_in(rng, i)
        k_use, k_idx = jax.random.split(k)

        def not_full(pool, n):
            pool = jax.lax.dynamic_update_slice(
                pool, img[None], (n,) + (0,) * img.ndim)
            return pool, n + 1, img

        def full(pool, n):
            use_old = jax.random.uniform(k_use) > 0.5
            idx = jax.random.randint(k_idx, (), 0, cap)
            old = jax.lax.dynamic_index_in_dim(pool, idx, keepdims=False)
            repl = jax.lax.dynamic_update_slice(
                pool, img[None], (idx,) + (0,) * img.ndim)
            pool = jnp.where(use_old, repl, pool)
            ret = jnp.where(use_old, old, img)
            return pool, n, ret

        pool, n, ret = jax.lax.cond(n < cap, not_full, full, pool, n)
        out = jax.lax.dynamic_update_slice(
            out, ret[None], (i,) + (0,) * img.ndim)
        return pool, n, out

    return jax.lax.fori_loop(0, imgs.shape[0], body, (pool, n_stored, out0))


def patch_output_size(side: int, n_layers: int) -> int:
    """Spatial size of the NLayerDiscriminator prediction map for a square
    ``side`` input: one k4 s2 p1 conv, then ``n_layers - 1`` more strided,
    then two k4 s1 p1 convs (each -1). Guards against the silent-NaN trap
    where a too-small crop yields a ZERO-SIZE patch map (mean of an empty
    array) — torch hits the identical degenerate shape."""
    for _ in range(n_layers):
        side = (side - 2) // 2 + 1
    return side - 2


class CycleGANTrainer:
    def __init__(self, cfg: CycleGANConfig):
        self.cfg = cfg
        self.g_a = ResnetGenerator(output_nc=cfg.input_nc, ngf=cfg.ngf,
                                   n_blocks=cfg.n_blocks)
        self.g_b = ResnetGenerator(output_nc=cfg.input_nc, ngf=cfg.ngf,
                                   n_blocks=cfg.n_blocks)
        if cfg.netd == "patch":
            self.d_a = NLayerDiscriminator(ndf=cfg.ndf,
                                           n_layers=cfg.n_layers_d)
            self.d_b = NLayerDiscriminator(ndf=cfg.ndf,
                                           n_layers=cfg.n_layers_d)
        elif cfg.netd == "pixel":
            self.d_a = PixelDiscriminator(ndf=cfg.ndf)
            self.d_b = PixelDiscriminator(ndf=cfg.ndf)
        else:
            raise ValueError(f"netd must be patch|pixel, got {cfg.netd!r}")
        if cfg.gan_mode not in ("lsgan", "vanilla"):
            raise ValueError("gan_mode must be lsgan|vanilla for training "
                             f"(wgangp needs a critic loop), got {cfg.gan_mode!r}")
        sched = _linear_decay(cfg)
        self.g_tx = optax.adam(sched, b1=cfg.beta1, b2=0.999)
        self.d_tx = optax.adam(sched, b1=cfg.beta1, b2=0.999)

    # ------------------------------------------------------------------
    def init_state(self, rng, image_shape) -> CycleGANTrainState:
        """image_shape = (H, W); images are [-1, 1] floats, input_nc chans."""
        h, w = image_shape
        if self.cfg.netd == "patch":
            po = patch_output_size(min(h, w), self.cfg.n_layers_d)
            if po < 1:
                raise ValueError(
                    f"crop {h}x{w} collapses to an empty "
                    f"{self.cfg.n_layers_d}-layer PatchGAN map ({po}); "
                    "use a larger crop or smaller n_layers_d")
        c = self.cfg.input_nc
        x = jnp.zeros((1, h, w, c), jnp.float32)
        ka, kb, kda, kdb = jax.random.split(rng, 4)
        g_params = {
            "g_a": jax.jit(self.g_a.init)(ka, x)["params"],
            "g_b": jax.jit(self.g_b.init)(kb, x)["params"],
        }
        d_params = {
            "d_a": jax.jit(self.d_a.init)(kda, x)["params"],
            "d_b": jax.jit(self.d_b.init)(kdb, x)["params"],
        }
        pool = jnp.zeros((max(self.cfg.pool_size, 1), h, w, c), jnp.float32)
        return CycleGANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params), d_opt=self.d_tx.init(d_params),
            pool_a=pool, pool_b=pool, pool_n=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def train_step(self, state: CycleGANTrainState, real_a, real_b, rng):
        """One iteration: G_A/G_B joint update, then D_A/D_B on pooled fakes."""
        cfg = self.cfg
        rng = jax.random.fold_in(rng, state.step)
        k_pool_a, k_pool_b = jax.random.split(rng)

        def g_loss_fn(g_params):
            fake_b = self.g_a.apply({"params": g_params["g_a"]}, real_a)
            rec_a = self.g_b.apply({"params": g_params["g_b"]}, fake_b)
            fake_a = self.g_b.apply({"params": g_params["g_b"]}, real_b)
            rec_b = self.g_a.apply({"params": g_params["g_a"]}, fake_a)
            logs = {}
            loss = 0.0
            if cfg.lambda_identity > 0:
                idt_a = self.g_a.apply({"params": g_params["g_a"]}, real_b)
                idt_b = self.g_b.apply({"params": g_params["g_b"]}, real_a)
                l_idt_a = jnp.mean(jnp.abs(idt_a - real_b)) \
                    * cfg.lambda_b * cfg.lambda_identity
                l_idt_b = jnp.mean(jnp.abs(idt_b - real_a)) \
                    * cfg.lambda_a * cfg.lambda_identity
                logs.update(idt_a=l_idt_a, idt_b=l_idt_b)
                loss = loss + l_idt_a + l_idt_b
            # fool the (frozen-in-this-grad) discriminators
            l_g_a = gan_loss(self.d_a.apply(
                {"params": state.d_params["d_a"]}, fake_b), True, cfg.gan_mode)
            l_g_b = gan_loss(self.d_b.apply(
                {"params": state.d_params["d_b"]}, fake_a), True, cfg.gan_mode)
            l_cyc_a = jnp.mean(jnp.abs(rec_a - real_a)) * cfg.lambda_a
            l_cyc_b = jnp.mean(jnp.abs(rec_b - real_b)) * cfg.lambda_b
            loss = loss + l_g_a + l_g_b + l_cyc_a + l_cyc_b
            logs.update(g_a=l_g_a, g_b=l_g_b, cycle_a=l_cyc_a,
                        cycle_b=l_cyc_b, loss_g=loss)
            return loss, (logs, fake_a, fake_b)

        (_, (logs, fake_a, fake_b)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # D step on history-pooled fakes (stop_gradient'd by construction
        # of the separate grad; pool playback decorrelates D's fake batch)
        fake_a = jax.lax.stop_gradient(fake_a)
        fake_b = jax.lax.stop_gradient(fake_b)
        pool_b, pool_n, fake_b_d = _pool_query(
            state.pool_b, state.pool_n, fake_b, k_pool_b)
        pool_a, _, fake_a_d = _pool_query(
            state.pool_a, state.pool_n, fake_a, k_pool_a)

        def d_loss_fn(d_params):
            # loss_D = 0.5 * (D(real) vs 1 + D(fake) vs 0)  (GANLoss usage)
            def one(net, params, real, fake):
                l_real = gan_loss(net.apply({"params": params}, real),
                                  True, cfg.gan_mode)
                l_fake = gan_loss(net.apply({"params": params}, fake),
                                  False, cfg.gan_mode)
                return 0.5 * (l_real + l_fake)
            l_d_a = one(self.d_a, d_params["d_a"], real_b, fake_b_d)
            l_d_b = one(self.d_b, d_params["d_b"], real_a, fake_a_d)
            return l_d_a + l_d_b, {"d_a": l_d_a, "d_b": l_d_b,
                                   "loss_d": l_d_a + l_d_b}

        (_, d_logs), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        logs.update(d_logs)
        new_state = state.replace(
            step=state.step + 1, g_params=g_params, d_params=d_params,
            g_opt=g_opt, d_opt=d_opt, pool_a=pool_a, pool_b=pool_b,
            pool_n=pool_n)
        return new_state, logs

    def jit_train_step(self, donate: bool = True):
        return jax.jit(self.train_step,
                       donate_argnums=(0,) if donate else ())

    # ------------------------------------------------------------------
    def generate(self, params, x, direction: str = "a2b"):
        net = self.g_a if direction == "a2b" else self.g_b
        return net.apply({"params": params}, x)


# ----------------------------------------------------------------------
# flat-npz checkpoints (loadable without torch; tools/train.py --cyclegan
# and the EN generator tool accept these next to imported .pth files)
# ----------------------------------------------------------------------
def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat):
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_checkpoint(path: str, state: CycleGANTrainState):
    """Flat npz: g_a/..., g_b/..., d_a/..., d_b/... + step."""
    flat = {}
    for name, sub in (("g_a", state.g_params["g_a"]),
                      ("g_b", state.g_params["g_b"]),
                      ("d_a", state.d_params["d_a"]),
                      ("d_b", state.d_params["d_b"])):
        flat.update(_flatten(jax.device_get(sub), name))
    flat["__step__"] = np.asarray(state.step)
    np.savez(path, **flat)


def load_generator_npz(path: str, which: str = "g_a"):
    """Load one generator's flax params from a trainer npz (default g_a =
    the A->B direction, i.e. ICD->EN when trained with A=day IC crops)."""
    with np.load(path) as z:
        flat = {k[len(which) + 1:]: z[k] for k in z.files
                if k.startswith(which + "/")}
    if not flat:
        raise ValueError(f"{path} holds no {which!r} generator params")
    return _unflatten(flat)
