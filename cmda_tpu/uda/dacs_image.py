"""DACSImage — supervised source-only ISR ablation trainer.

Behavioral contract (reference mmseg/models/uda/dacs_image.py:15-272):
trains a single EncoderDecoder on the source ISR (optionally style-
transferred day<->night by a frozen 1-channel CycleGAN, transfer_direction
in {isrd2isrn, isrn2isrd}, :225-230) with plain CE; the contrast machinery
(ContrastCELoss) is constructed but its forward only runs source CE —
we expose the contrast loss as an opt-in extra (the TPU-native
prototype/queue implementation in cmda_tpu.uda.prototype).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from ..config import RunConfig
from ..models.segmentor import EncoderDecoder
from ..models.cyclegan import ResnetGenerator, generator_from_params
from ..ops.losses import weighted_cross_entropy, pixel_accuracy
from ..train.optim import make_optimizer
from .dacs import DACSTrainState


class DACSImageTrainer:
    def __init__(self, cfg: RunConfig, *, transfer_direction: str | None = None):
        assert transfer_direction in (None, "isrd2isrn", "isrn2isrd")
        self.cfg = cfg
        self.transfer_direction = transfer_direction
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]
        self.model = EncoderDecoder(cfg.model, dtype=dtype)
        self.cyclegan = (ResnetGenerator(output_nc=1, n_blocks=9)
                         if transfer_direction else None)
        self.tx = None

    def init_state(self, rng, *, cyclegan_params=None,
                   pretrained_variables=None) -> DACSTrainState:
        h, w = self.cfg.data.crop_size
        b = self.cfg.data.batch_size
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        variables = jax.jit(lambda r: self.model.init(r, img))(rng)
        if pretrained_variables is not None:
            variables = pretrained_variables
        params = variables["params"]
        self.tx = make_optimizer(params, self.cfg.optim)
        if self.cyclegan is not None and cyclegan_params is not None:
            self.cyclegan = generator_from_params(cyclegan_params)
        return DACSTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            ema_params=jax.tree.map(lambda x: x.copy(), params),
            opt_state=self.tx.init(params),
            cyclegan_params=cyclegan_params)

    def _transfer(self, state, isr):
        """Frozen 1ch CycleGAN on the [-1,1] ISR (reference :225-230)."""
        if self.cyclegan is None or state.cyclegan_params is None:
            return isr
        x = jnp.mean(isr, axis=-1, keepdims=True)
        y = self.cyclegan.apply({"params": state.cyclegan_params}, x)
        return jax.lax.stop_gradient(jnp.repeat(y, 3, axis=-1))

    def train_step(self, state: DACSTrainState, batch: dict, base_rng):
        from ..data.wire import decode_wire
        batch = decode_wire(batch)   # no-op at trace time for f32 batches
        rng = jax.random.fold_in(base_rng, state.step)
        k_drop, k_dp = jax.random.split(rng)
        isr = self._transfer(state, batch["source"]["img_self_res"])
        label = batch["source"]["label"]

        def loss_fn(params):
            (logits, _), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                isr, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop, "droppath": k_dp},
                method=self.model.forward_with_features)
            loss = weighted_cross_entropy(logits, label)
            logs = {"loss": loss, "src/loss_seg": loss,
                    "src/acc_seg": pixel_accuracy(logits, label)}
            return loss, (updates["batch_stats"], logs)

        (_, (bstats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=bstats, opt_state=new_opt), logs

    def jit_train_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())
