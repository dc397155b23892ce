"""OrgDACS — pristine image-only DAFormer self-training (no events/ISR).

Behavioral contract: reference mmseg/models/uda/dacs.py:1102-1426 (OrgDACS)
and the 'cs2dsec_image'/'cs2dz_image' train types of DACS (:363-378,
:467-468, :597-601, :789-791): single EncoderDecoder student + EMA teacher,
source CE, teacher pseudo-labels on the night image, ClassMix + jitter/blur,
mixed CE weighted by the confidence ratio, optional ImageNet feature
distance, optional frozen day->night CycleGAN on the source image
(cyclegan_id2in, :368-372).

Same fused-single-step design as DACSTrainer.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict

from ..config import RunConfig
from ..models.segmentor import EncoderDecoder
from ..models.cyclegan import ResnetGenerator, generator_from_params
from ..ops.augment import (
    sample_class_half, class_mix_mask, one_mix, maybe_color_jitter_normalized,
    maybe_gaussian_blur,
)
from ..ops.losses import weighted_cross_entropy, pixel_accuracy
from ..ops.normalize import IMAGENET_MEAN, IMAGENET_STD
from ..train.optim import make_optimizer
from .transforms import (
    pseudo_label_and_weight, downscale_label_ratio, masked_feat_dist,
    frozen_variables)
from .dacs import DACSTrainState


class OrgDACSTrainer:
    def __init__(self, cfg: RunConfig, *, use_cyclegan_day2night: bool = False,
                 model=None, imnet_model=None):
        """``model``/``imnet_model`` override the default MiT EncoderDecoder
        with any module exposing ``forward_with_features``/``extract_feat``
        (e.g. GenericEncoderDecoder) — the reference legacy grids run DACS
        over ResNet/DLv2-family combos too (experiments.py:277-396)."""
        self.cfg = cfg
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]
        self.model = (model if model is not None
                      else EncoderDecoder(cfg.model, dtype=dtype))
        self.cyclegan = (ResnetGenerator(output_nc=3, n_blocks=9)
                         if use_cyclegan_day2night else None)
        self.enable_fdist = cfg.uda.imnet_feature_dist_lambda > 0
        if self.enable_fdist:
            self.imnet = (imnet_model if imnet_model is not None
                          else EncoderDecoder(cfg.model, dtype=dtype))
        else:
            self.imnet = None
        self.tx = None

    def init_state(self, rng, *, cyclegan_params=None, imnet_params=None,
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
            cyclegan_params=cyclegan_params, imnet_params=imnet_params)

    def _day2night(self, state, day_image):
        """Frozen CycleGAN day->night on the normalized source image
        (reference dacs.py:368-372: denorm to [-1,1], G, renorm)."""
        if self.cyclegan is None or state.cyclegan_params is None:
            return day_image
        mean = IMAGENET_MEAN / 255.0
        std = IMAGENET_STD / 255.0
        x01 = day_image * std + mean
        x = (x01 - 0.5) / 0.5
        y = self.cyclegan.apply({"params": state.cyclegan_params}, x)
        y01 = y / 2.0 + 0.5
        return jax.lax.stop_gradient((y01 - mean) / std)

    def train_step(self, state: DACSTrainState, batch: dict, base_rng):
        cfg = self.cfg
        u = cfg.uda
        from ..data.wire import decode_wire
        batch = decode_wire(batch)   # no-op at trace time for f32 batches
        rng = jax.random.fold_in(base_rng, state.step)
        k_mix, k_jg, k_jit, k_bg, k_sig, k_drop, k_dp = jax.random.split(rng, 7)

        day_image = self._day2night(state, batch["source"]["image"])
        day_label = batch["source"]["label"]
        night_image = batch["target"]["image"]

        alpha = jnp.minimum(
            1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0), u.alpha)
        ema_params = jax.tree.map(lambda e, p: alpha * e + (1 - alpha) * p,
                                  state.ema_params, state.params)
        state = state.replace(ema_params=ema_params)

        # teacher pseudo-labels
        logits_t = self.model.apply(
            {"params": ema_params, "batch_stats": state.batch_stats},
            night_image)
        pseudo_label, pseudo_weight = pseudo_label_and_weight(
            jax.lax.stop_gradient(logits_t), threshold=u.pseudo_threshold,
            ignore_top=u.pseudo_weight_ignore_top,
            ignore_bottom=u.pseudo_weight_ignore_bottom)

        # ClassMix
        apply_jitter = jax.random.uniform(k_jg) > u.color_jitter_probability
        apply_blur = (jax.random.uniform(k_bg) > 0.5) if u.blur else jnp.asarray(False)
        sigma = jax.random.uniform(k_sig, minval=0.15, maxval=1.15)
        selected = sample_class_half(k_mix, day_label, cfg.data.num_classes)
        masks = class_mix_mask(day_label, selected, cfg.data.num_classes)
        mixed_img = one_mix(masks, day_image, night_image)
        mixed_img = maybe_color_jitter_normalized(
            k_jit, mixed_img, apply_jitter, u.color_jitter_strength)
        mixed_img = maybe_gaussian_blur(mixed_img, sigma, apply_blur)
        mixed_lbl = jnp.where(masks, day_label, pseudo_label)
        mixed_weight = one_mix(masks, jnp.ones_like(pseudo_weight),
                               pseudo_weight)

        rngs = {"dropout": k_drop, "droppath": k_dp}

        def loss_fn(params):
            logs = {}
            (logits_src, feats_src), up1 = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                day_image, train=True, mutable=["batch_stats"], rngs=rngs,
                method=self.model.forward_with_features)
            l_src = weighted_cross_entropy(logits_src, day_label)
            logs["src/loss_seg"] = l_src
            logs["src/acc_seg"] = pixel_accuracy(logits_src, day_label)

            (logits_mix, _), up2 = self.model.apply(
                {"params": params, "batch_stats": up1["batch_stats"]},
                mixed_img, train=True, mutable=["batch_stats"], rngs=rngs,
                method=self.model.forward_with_features)
            l_mix = weighted_cross_entropy(logits_mix, mixed_lbl, mixed_weight)
            logs["mix/loss_seg"] = l_mix
            logs["mix/acc_seg"] = pixel_accuracy(logits_mix, mixed_lbl)
            total = l_src + l_mix
            if self.enable_fdist:
                f_imnet = self.imnet.apply(
                    frozen_variables(state.imnet_params), day_image,
                    method=self.imnet.extract_feat)
                f_imnet = jax.lax.stop_gradient(f_imnet[-1])
                scale = day_label.shape[-1] // f_imnet.shape[2]
                gt_small = downscale_label_ratio(
                    day_label, scale, u.imnet_feature_dist_scale_min_ratio,
                    cfg.data.num_classes)
                fdc = jnp.asarray(u.imnet_feature_dist_classes)
                mask = jnp.any(gt_small[..., None] == fdc, axis=-1)
                fd = u.imnet_feature_dist_lambda * masked_feat_dist(
                    feats_src[-1], f_imnet, mask)
                logs["src/loss_imnet_feat_dist"] = fd
                total = total + fd
            logs["loss"] = total
            return total, (up2["batch_stats"], logs)

        (loss, (new_bstats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, uu: p + uu, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bstats, opt_state=new_opt)
        logs["pseudo_weight"] = jnp.mean(pseudo_weight)
        return new_state, logs

    def jit_train_step(self, donate: bool = True):
        return jax.jit(self.train_step, donate_argnums=(0,) if donate else ())
