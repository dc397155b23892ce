"""DACS — the CMDA self-training algorithm as ONE fused jitted train step.

Behavioral contract: reference mmseg/models/uda/dacs.py:52-1099 (call stack
in SURVEY.md §3.2). One reference iteration does, with three separate
``.backward()`` calls and a CPU/PIL round-trip in the middle:
  ① CycleGAN(source temporal diff) -> day "events" (no grad)   (:400-404)
  ② EMA teacher update α=min(1-1/(t+1), 0.999)                 (:261-272)
  ③ source supervised multi-stream step                        (:489-517)
  ④ optional ImageNet feature-distance regularizer             (:567-576)
  ⑤ teacher pseudo-labels on the night pair, confidence-ratio
     scalar weight ≥0.968                                      (:654-711)
  ⑥ ClassMix + jitter/blur; mixed-ISR recomputed from the
     mixed image (PIL round trip in the reference)             (:713-784)
  ⑦ mixed-domain step weighted by the pseudo-weight            (:786-860)

TPU-native redesign: the whole iteration is a single pure function
``(state, batch, rng) -> (state, logs)``: one total loss (source + mix
[+ fdist]), one ``jax.grad``, optimizer update and EMA update inside the same
XLA program. The events-vs-ISR coin flip (:412-421) becomes a traced select
(one compiled graph); the mixed-ISR recompute is the batched on-device
``image_to_isr`` (bit-matching the PIL grayscale path). Under a data-parallel
``jax.sharding`` mesh, GSPMD inserts the gradient all-reduce automatically.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict

from ..config import RunConfig
from ..models.segmentor import FusionEncoderDecoder, EncoderDecoder
from ..models.cyclegan import ResnetGenerator, generator_from_params
from ..ops.augment import (
    sample_class_half, class_mix_mask, one_mix, maybe_color_jitter_normalized,
    maybe_gaussian_blur, add_noise_on_isr,
)
from ..ops.isr import image_to_isr
from ..ops.normalize import denorm_image
from ..train.optim import make_optimizer
from .transforms import (
    multi_stream_loss, pseudo_label_and_weight,
    pseudo_label_and_weight_coarse, downscale_label_ratio,
    masked_feat_dist, split_stream_loss, seg_label_to_edge_label,
    feature_consistency_loss, frozen_variables,
)


class DACSTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any
    cyclegan_params: Any = None   # frozen Image Content-Extractor
    imnet_params: Any = None      # frozen ImageNet encoder (fdist)


def _dtype(name):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class DACSTrainer:
    """Builds the model bundle and the fused train step for a RunConfig.

    Supported train types (reference dacs.py:83-85): the fusion family —
    'cs2dsec_image+events_together', 'cs2dsec_image+events',
    'cs2dz_image+raw-isr'. Image-only DAFormer UDA ('cs2dsec_image' /
    'cs2dz_image') uses OrgDACSTrainer (see org_dacs.py).
    """

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        # membership check mirrors reference dacs.py:88-90; the value is
        # otherwise functionally dead there (its consuming branch is
        # commented out, dacs.py:684-699) and here
        assert cfg.uda.img_self_res_reg in {"no", "only_isr", "mixed",
                                            "average"}, cfg.uda.img_self_res_reg
        # edge labels (and their 2-class weight) only exist on the
        # no-fusion ISR decoder (reference dacs.py:136-139)
        if cfg.uda.isr_edge:
            assert cfg.model.train_type == "cs2dz_image+raw-isr_no-fusion"
        dtype = _dtype(cfg.dtype)
        self.model = FusionEncoderDecoder(cfg.model, dtype=dtype)
        self.cyclegan = (ResnetGenerator(output_nc=1, n_blocks=9)
                         if cfg.uda.use_cyclegan_day_events else None)
        self.enable_fdist = cfg.uda.imnet_feature_dist_lambda > 0
        self.imnet = (EncoderDecoder(cfg.model, dtype=dtype)
                      if self.enable_fdist else None)
        self.tx = None  # created at init_state once params exist

    # ------------------------------------------------------------------
    # state init
    # ------------------------------------------------------------------
    def init_state(self, rng, *, cyclegan_params=None, imnet_params=None,
                   pretrained_variables=None) -> DACSTrainState:
        h, w = self.cfg.data.crop_size
        b = self.cfg.data.batch_size
        img = jnp.zeros((b, h, w, 3), jnp.float32)
        init_mode = "fusion_all" if self.cfg.model.fusion_isr else "default"

        # jit the init: eager init dispatches thousands of tiny ops (very
        # slow through the TPU runtime); one compiled program instead.
        def _init(r):
            return self.model.init(
                r, img, img, img if self.cfg.model.fusion_isr else None,
                mode=init_mode, method=self.model.forward_logits)

        variables = jax.jit(_init)(rng)
        if pretrained_variables is not None:
            variables = pretrained_variables
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        self.tx = make_optimizer(params, self.cfg.optim)
        if self.cyclegan is not None and cyclegan_params is not None:
            # match the module to the checkpoint (9-block .pth or any-size
            # native .npz) instead of hard-coding the flagship dims
            self.cyclegan = generator_from_params(cyclegan_params)
        if self.cyclegan is not None and cyclegan_params is None:
            cyclegan_params = jax.jit(
                lambda r: self.cyclegan.init(r, jnp.zeros((1, h, w, 1)))
            )(rng)["params"]
        return DACSTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            ema_params=jax.tree.map(lambda x: x.copy(), params),  # teacher = real copy (donation-safe)
            opt_state=self.tx.init(params),
            cyclegan_params=cyclegan_params,
            imnet_params=imnet_params,
        )

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------
    def _day_events(self, state, src):
        """CycleGAN(mean(img_time_res)) -> 3ch day 'events' (frozen net)."""
        if self.cyclegan is None or state.cyclegan_params is None:
            return src["img_time_res"]
        x = jnp.mean(src["img_time_res"], axis=-1, keepdims=True)
        y = self.cyclegan.apply({"params": state.cyclegan_params}, x)
        y = jax.lax.stop_gradient(y)
        return jnp.repeat(y, 3, axis=-1)

    def _choice_thres(self, step):
        rc = self.cfg.uda.random_choice_thres
        if isinstance(rc, str):
            a, b = (float(s) for s in rc.split("-"))
            frac = step.astype(jnp.float32) / self.cfg.optim.max_iters
            return a + (b - a) * frac
        return jnp.asarray(rc, jnp.float32)

    def _teacher_logits(self, state, image, second, isr, mode,
                        streams=("fusion",), resize=True):
        """EMA forward: dropout/droppath off, BN on batch statistics
        (reference dacs.py:458-462, 590-594); updated stats discarded.
        Only the requested ``streams`` are decoded — the teacher's unused
        logit streams are dead weight in compute and HBM.

        ``resize=False`` returns stride-4 logits (the uda.pallas_ce path:
        the input-res resize then happens inside the fused phase argmax
        kernel, so the [B,H,W,C] teacher logits never materialize)."""
        ema = state.ema_params
        if self.cfg.uda.teacher_bf16:
            # pure-inference forward: read a bf16 cast of the EMA weights
            # (half the HBM weight traffic); the f32 EMA accumulator is
            # untouched.  Pseudo-label drift vs the f32 teacher is bounded
            # by tests/test_dacs_variants.py::test_teacher_bf16_*.
            ema = jax.tree.map(lambda x: x.astype(jnp.bfloat16), ema)
        out, _ = self.model.apply(
            {"params": ema, "batch_stats": state.batch_stats},
            image, second, isr, mode=mode, train=False, bn_train=True,
            mutable=["batch_stats"], streams=streams,
            resize_to_input=resize, method=self.model.forward_logits)
        return jax.tree.map(
            lambda x: jax.lax.stop_gradient(x) if x is not None else None, out,
            is_leaf=lambda x: x is None)

    def _mixed_isr(self, mixed_img, dir_idx, isr_params=None,
                   force_dir: str | None = None):
        """Recompute the ISR of the (jittered/blurred) mixed image on-device
        (kills the reference's PIL round-trip, dacs.py:729-755).

        On TPU the shift/log-diff/renorm chain runs as one fused Pallas
        kernel (ops/pallas_kernels.py); elsewhere the jnp path."""
        p = isr_params if isr_params is not None else self.cfg.uda.isr_params
        if dir_idx is None:
            dir_idx = jnp.zeros((mixed_img.shape[0],), jnp.int32)
        if force_dir is not None:
            static_dir = force_dir
        else:
            static_dir = (None if self.cfg.uda.shift_type == "random"
                          else self.cfg.uda.shift_type)

        if (self.cfg.uda.use_pallas_isr and jax.default_backend() == "tpu"
                and static_dir != "all"):
            from ..ops.isr import pil_grayscale, SHIFT_DIRECTIONS
            from ..ops.pallas_kernels import pallas_batched_isr
            rgb_u8 = jnp.clip(denorm_image(mixed_img) * 255.0, 0, 255
                              ).astype(jnp.uint8)
            gray = pil_grayscale(rgb_u8).astype(jnp.float32)
            if static_dir is not None:
                dir_idx = jnp.full((mixed_img.shape[0],),
                                   SHIFT_DIRECTIONS.index(static_dir),
                                   jnp.int32)
            isr = pallas_batched_isr(
                gray, dir_idx, val_range=p.val_range, threshold=p.threshold,
                clip_range=p.clip_range, shift_pixel=p.shift_pixel)
        else:
            def per_image(img, idx):
                return image_to_isr(
                    denorm_image(img),
                    val_range=p.val_range, threshold=p.threshold,
                    clip_range=p.clip_range, shift_pixel=p.shift_pixel,
                    shift_direction=static_dir,
                    direction_idx=None if static_dir else idx)

            isr = jax.vmap(per_image)(mixed_img, dir_idx)
        return jnp.repeat(isr[..., None], 3, axis=-1)

    def _mixed_isr_3ch(self, mixed_img):
        """3-channel multi-scale mixed ISR (reference dacs.py:746-752 with
        shift_3_channel: one get_image_change_from_pil per parameter set,
        default rightdown direction, stacked as channels)."""
        chans = [self._mixed_isr(mixed_img, None, isr_params=p,
                                 force_dir="rightdown")[..., :1]
                 for p in self.cfg.uda.isr_params_3]
        return jnp.concatenate(chans, axis=-1)

    def _loss_weights(self):
        u = self.cfg.uda
        return dict(w_image=u.loss_weight_image, w_events=u.loss_weight_events,
                    w_fusion=u.loss_weight_fusion, w_isr=u.loss_weight_isr,
                    stacked=u.stacked_stream_ce,
                    pallas_ce=self._pallas_ce())

    def _pallas_ce(self):
        return (self.cfg.uda.pallas_ce
                and jax.default_backend() == "tpu")

    def _fdist_loss(self, state, feats_image, day_image, day_label):
        """ImageNet feature-distance on thing classes
        (reference dacs.py:328-355)."""
        u = self.cfg.uda
        f_imnet = self.imnet.apply(
            frozen_variables(state.imnet_params), day_image,
            method=self.imnet.extract_feat)
        f_imnet = jax.lax.stop_gradient(f_imnet[-1])
        scale = day_label.shape[-1] // f_imnet.shape[2]
        gt_small = downscale_label_ratio(
            day_label, scale, u.imnet_feature_dist_scale_min_ratio,
            self.cfg.data.num_classes)
        fd_classes = jnp.asarray(u.imnet_feature_dist_classes)
        mask = jnp.any(gt_small[..., None] == fd_classes, axis=-1)
        return u.imnet_feature_dist_lambda * masked_feat_dist(
            feats_image[-1], f_imnet, mask)

    # ------------------------------------------------------------------
    # steps ①-⑥: inputs, EMA, pseudo-labels, ClassMix (shared by the
    # fused train step and the debug-grid snapshot)
    # ------------------------------------------------------------------
    def _prepare(self, state: DACSTrainState, batch: dict, base_rng):
        """Returns (state-with-updated-teacher, P) where P carries every
        tensor the loss part and the debug grids need."""
        cfg = self.cfg
        u = cfg.uda
        train_type = cfg.model.train_type
        has_events = train_type.startswith("cs2dsec")

        rng = jax.random.fold_in(base_rng, state.step)
        (k_coin, k_mix, k_jit_gate, k_jit, k_blur_gate, k_sigma, k_dir,
         k_drop, k_dpath, k_noise) = jax.random.split(rng, 10)

        src, tgt = batch["source"], batch["target"]
        day_image = src["image"]
        day_label = src["label"]
        day_isr = src["img_self_res"]
        night_image = tgt["image"]
        night_isr = tgt["isr"]

        # ① day events via frozen CycleGAN (cs2dsec only)
        day_events = self._day_events(state, src) if has_events else None
        night_events = tgt.get("events") if has_events else None

        # per-iteration augmentation draws (reference dacs.py:446-456)
        apply_jitter = jax.random.uniform(k_jit_gate) > u.color_jitter_probability
        apply_blur = (jax.random.uniform(k_blur_gate) > 0.5) if u.blur else jnp.asarray(False)
        sigma = jax.random.uniform(k_sigma, minval=0.15, maxval=1.15)
        coin = jax.random.uniform(k_coin)
        if u.without_events:
            use_events = jnp.asarray(False)
        elif u.without_isd:
            use_events = jnp.asarray(True)
        else:
            use_events = coin > self._choice_thres(state.step)

        # ② EMA teacher update BEFORE pseudo-labels (reference dacs.py:437-442):
        # α = min(1 - 1/(t+1), α_cfg); at t=0 this copies the student.
        alpha = jnp.minimum(
            1.0 - 1.0 / (state.step.astype(jnp.float32) + 1.0), u.alpha)
        ema_params = jax.tree.map(
            lambda e, p: alpha * e + (1.0 - alpha) * p,
            state.ema_params, state.params)
        state = state.replace(ema_params=ema_params)

        split_type = train_type == "cs2dz_image+raw-isr_split"
        nofusion_type = train_type == "cs2dz_image+raw-isr_no-fusion"
        d2n_type = train_type == "cs2dz_image+d2n-isr"
        pl_kw = dict(threshold=u.pseudo_threshold,
                     ignore_top=u.pseudo_weight_ignore_top,
                     ignore_bottom=u.pseudo_weight_ignore_bottom)

        # deflare ablation: the teacher sees the flare-removed night pair
        # (reference dacs.py:427-430, 612-613)
        pl_night_image, pl_night_isr = night_image, night_isr
        if u.deflare_aug:
            pl_night_image = tgt["image_deflare"]
            pl_night_isr = tgt["isr_deflare"]

        # ⑤ teacher pseudo-labels.  Under uda.pallas_ce the teacher
        # returns stride-4 logits and the resize+softmax+argmax runs in the
        # fused phase kernel (pseudo_label_and_weight_coarse) — the
        # [B,H,W,C] f32 teacher logits never materialize.
        use_pal = self._pallas_ce()
        t_res = not use_pal
        lbl_size = night_image.shape[1:3]

        def make_pl(stream_logits):
            if use_pal:
                return pseudo_label_and_weight_coarse(
                    stream_logits, lbl_size, pallas_ce=True, **pl_kw)
            return pseudo_label_and_weight(stream_logits, **pl_kw)

        pl2 = pw2 = target_day_pl = None
        day_pair_img = day_pair_isr = None
        if train_type == "cs2dsec_image+events_together":
            if u.fuse_both_ice_and_e:
                teacher = self._teacher_logits(
                    state, night_image, night_events, night_isr, "fusion_all",
                    resize=t_res)
            elif u.isr_another_fusion:
                # ISR rides the dedicated fusion_isr module when the coin
                # picks ISR (reference dacs.py:664-666); two graphs, one
                # executed per step via lax.cond
                teacher = jax.lax.cond(
                    use_events,
                    lambda: self._teacher_logits(state, night_image,
                                                 night_events, None, "default",
                                                 resize=t_res),
                    lambda: self._teacher_logits(state, night_image,
                                                 night_isr, None, "fusion_isr",
                                                 resize=t_res))
            else:
                ema_second = jnp.where(use_events, night_events, night_isr)
                teacher = self._teacher_logits(state, night_image, ema_second,
                                               None, "default", resize=t_res)
            pseudo_label, pseudo_weight = make_pl(teacher["fusion_output"])
        elif train_type == "cs2dsec_image+events":
            if u.isr_no_fusion:
                # fixed events input for the teacher (reference dacs.py:667-669)
                teacher = self._teacher_logits(state, night_image,
                                               night_events, None, "default",
                                               resize=t_res)
            elif u.isr_another_fusion:
                teacher = jax.lax.cond(
                    use_events,
                    lambda: self._teacher_logits(state, night_image,
                                                 night_events, None, "default",
                                                 resize=t_res),
                    lambda: self._teacher_logits(state, night_image,
                                                 night_isr, None, "fusion_isr",
                                                 resize=t_res))
            else:
                ema_second = jnp.where(use_events, night_events, night_isr)
                teacher = self._teacher_logits(state, night_image, ema_second,
                                               None, "default", resize=t_res)
            pseudo_label, pseudo_weight = make_pl(teacher["fusion_output"])
        elif split_type:
            # separate image / events pseudo-labels (reference dacs.py:628-651)
            teacher = self._teacher_logits(state, pl_night_image,
                                           pl_night_isr, None, "default",
                                           streams=("image", "events"),
                                           resize=t_res)
            pseudo_label, pseudo_weight = make_pl(teacher["image_output"])
            pl2, pw2 = make_pl(teacher["events_output"])
        elif nofusion_type:
            # image stream supervises the ISR stream (reference dacs.py:624-626)
            teacher = self._teacher_logits(state, pl_night_image,
                                           pl_night_isr, None, "no_fusion",
                                           streams=("image",), resize=t_res)
            pseudo_label, pseudo_weight = make_pl(teacher["image_output"])
        elif d2n_type:
            # day->night transferred-ISR variant: teacher on the target-day
            # image gives the day pseudo-label (reference dacs.py:469-478);
            # night PL = average of image+events softmax (:602-610)
            day_pair_img = tgt["day_image"]
            day_pair_isr = tgt["day_isr"]
            teacher_day = self._teacher_logits(state, day_pair_img, None,
                                               None, "no_fusion",
                                               streams=("image",))
            target_day_pl = jnp.argmax(teacher_day["image_output"],
                                       axis=-1).astype(jnp.int32)
            teacher = self._teacher_logits(state, night_image, night_isr,
                                           None, "default",
                                           streams=("image", "events"))
            avg_sm = 0.5 * jax.nn.softmax(
                teacher["image_output"].astype(jnp.float32), -1) + \
                0.5 * jax.nn.softmax(
                    teacher["events_output"].astype(jnp.float32), -1)
            prob = jnp.max(avg_sm, -1)
            pseudo_label = jnp.argmax(avg_sm, -1).astype(jnp.int32)
            ratio = jnp.mean((prob >= u.pseudo_threshold).astype(jnp.float32))
            pseudo_weight = jnp.full(prob.shape, 1.0) * ratio
        else:  # cs2dz_image+raw-isr
            teacher = self._teacher_logits(state, pl_night_image,
                                           pl_night_isr, None, "default",
                                           resize=t_res)
            pseudo_label, pseudo_weight = make_pl(teacher["fusion_output"])

        # ⑥ ClassMix + strong transform, all on device
        selected = sample_class_half(k_mix, day_label,
                                     cfg.data.num_classes)
        masks = class_mix_mask(day_label, selected, cfg.data.num_classes)
        mixed_img = one_mix(masks, day_image, night_image)
        mixed_img = maybe_color_jitter_normalized(
            k_jit, mixed_img, apply_jitter, u.color_jitter_strength)
        mixed_img = maybe_gaussian_blur(mixed_img, sigma, apply_blur)
        mixed_lbl = jnp.where(masks, day_label, pseudo_label)
        ones_w = jnp.ones_like(pseudo_weight)
        mixed_weight = one_mix(masks, ones_w, pseudo_weight)
        mixed_events = (one_mix(masks, day_events, night_events)
                        if has_events else None)
        mixed_lbl2 = mixed_weight2 = None
        if split_type:
            mixed_lbl2 = jnp.where(masks, day_label, pl2)
            mixed_weight2 = one_mix(masks, ones_w, pw2)
        if d2n_type:
            # second mask set drawn from the day pseudo-label
            sel2 = sample_class_half(jax.random.fold_in(k_mix, 1),
                                     target_day_pl, cfg.data.num_classes)
            masks2 = class_mix_mask(target_day_pl, sel2, cfg.data.num_classes)
            mixed_lbl2 = jnp.where(masks2, target_day_pl, pseudo_label)
            mixed_isr = one_mix(masks2, day_pair_isr, night_isr)
        elif u.mixed_image_to_mixed_isr:
            if u.shift_3_channel:
                mixed_isr = self._mixed_isr_3ch(mixed_img)
            else:
                dir_idx = jax.random.randint(k_dir, (mixed_img.shape[0],), 0, 4)
                mixed_isr = self._mixed_isr(mixed_img, dir_idx)
            if u.isr_noise_dacs_type:
                # degrade channel 0 then repeat (reference dacs.py:753-755)
                noisy = add_noise_on_isr(k_noise, mixed_isr[..., :1],
                                         u.isr_noise_dacs_type)
                mixed_isr = jnp.repeat(noisy, mixed_isr.shape[-1], axis=-1)
        else:
            mixed_isr = one_mix(masks, day_isr, night_isr)
            if u.isr_mix_aug:
                # isr_flag in the reference's strong_transform
                # (dacs.py:757-758, dacs_transforms.py:11-35): the mixed ISR
                # gets the same jitter draw + blur as the mixed image, in
                # the (x+1)/2 domain (mean = std = 127.5)
                isr_ms = jnp.full((3,), 127.5, jnp.float32)
                mixed_isr = maybe_color_jitter_normalized(
                    k_jit, mixed_isr, apply_jitter, u.color_jitter_strength,
                    mean=isr_ms, std=isr_ms)
                mixed_isr = maybe_gaussian_blur(mixed_isr, sigma, apply_blur)

        return state, dict(
            train_type=train_type, has_events=has_events,
            split_type=split_type, nofusion_type=nofusion_type,
            d2n_type=d2n_type, use_events=use_events,
            day_image=day_image, day_label=day_label, day_isr=day_isr,
            day_events=day_events, night_image=night_image,
            night_isr=night_isr, night_events=night_events,
            day_pair_img=day_pair_img, day_pair_isr=day_pair_isr,
            target_day_pl=target_day_pl,
            pseudo_label=pseudo_label, pseudo_weight=pseudo_weight,
            masks=masks, mixed_img=mixed_img, mixed_lbl=mixed_lbl,
            mixed_weight=mixed_weight, mixed_events=mixed_events,
            mixed_isr=mixed_isr, mixed_lbl2=mixed_lbl2,
            mixed_weight2=mixed_weight2,
            rngs={"dropout": k_drop, "droppath": k_dpath})

    def debug_tensors(self, state: DACSTrainState, batch: dict, base_rng):
        """Snapshot of the mix construction for the class_mix_debug grids
        (reference dacs.py:882-1097) — same rng fold as the train step about
        to run on (state, batch), no gradients."""
        from ..data.wire import decode_wire
        batch = decode_wire(batch)   # no-op at trace time for f32 batches
        _, P = self._prepare(state, batch, base_rng)
        keys = ("day_image", "day_label", "day_isr", "day_events",
                "night_image", "night_isr", "night_events", "pseudo_label",
                "pseudo_weight", "masks", "mixed_img", "mixed_lbl",
                "mixed_weight", "mixed_events", "mixed_isr", "use_events")
        return {k: P[k] for k in keys if P.get(k) is not None}

    # ------------------------------------------------------------------
    # the fused step
    # ------------------------------------------------------------------
    def train_step(self, state: DACSTrainState, batch: dict, base_rng):
        """One UDA iteration. batch:
          source: {image, img_self_res, label[, img_time_res]}
          target: {image, isr[, events]}
        All images normalized NHWC float32; labels int32 [B,H,W]."""
        cfg = self.cfg
        u = cfg.uda
        from ..data.wire import decode_wire
        batch = decode_wire(batch)   # no-op at trace time for f32 batches
        state, P = self._prepare(state, batch, base_rng)
        train_type = P["train_type"]
        split_type, nofusion_type, d2n_type = (
            P["split_type"], P["nofusion_type"], P["d2n_type"])
        use_events = P["use_events"]
        day_image, day_label, day_isr, day_events = (
            P["day_image"], P["day_label"], P["day_isr"], P["day_events"])
        day_pair_isr = P["day_pair_isr"]
        target_day_pl = P["target_day_pl"]
        pseudo_weight = P["pseudo_weight"]
        mixed_img, mixed_lbl, mixed_weight = (
            P["mixed_img"], P["mixed_lbl"], P["mixed_weight"])
        mixed_events, mixed_isr = P["mixed_events"], P["mixed_isr"]
        mixed_lbl2, mixed_weight2 = P["mixed_lbl2"], P["mixed_weight2"]
        rngs = P["rngs"]

        weights = self._loss_weights()

        def forward_train(params, bstats, image, events, isr, mode):
            (logits, feats), updates = self.model.apply(
                {"params": params, "batch_stats": bstats},
                image, events, isr, mode=mode, mutable=["batch_stats"],
                rngs=rngs, method=self.model.forward_train)
            return logits, feats, updates["batch_stats"]

        # isr_edge_class_weight: [1-w, w] on the 2-class edge stream
        # (reference dacs.py:142-146; see split_stream_loss docstring)
        edge_cw = None
        if u.isr_edge and 0.0 <= u.isr_edge_class_weight <= 1.0:
            edge_cw = jnp.asarray([1.0 - u.isr_edge_class_weight,
                                   u.isr_edge_class_weight], jnp.float32)

        def stream_losses(logits, labels, seg_weights, factor):
            return split_stream_loss(
                logits, labels, seg_weights, w_image=weights["w_image"],
                w_events=weights["w_events"], factor=factor,
                events_class_weight=edge_cw,
                pallas_ce=weights["pallas_ce"])

        # The source and mixed losses are differentiated SEPARATELY and the
        # gradients summed — same math as one total loss, but the two
        # backward passes are sequenced so their activations never coexist
        # (the reference's backward #1/#3 split, dacs.py:523/860; one fused
        # loss OOMs a 16G chip on the b5 recipe).
        src_mode = "default"
        src_alt = mix_alt = None   # (inputs, mode) of the ISR-coin graph
        iaf = u.isr_another_fusion
        if train_type == "cs2dsec_image+events_together":
            src_in = (day_image, day_events, day_isr)
            src_mode = "fusion_all" if u.fuse_both_ice_and_e else "default"
            mix_in = (mixed_img, mixed_events, mixed_isr)
            if iaf and not u.fuse_both_ice_and_e:
                # ISR-coin steps route fusion through the fusion_isr module
                # (reference dacs.py:499-502, 827-830)
                src_alt = (src_in, "fusion_isr")
                mix_alt = (mix_in, "fusion_isr")
        elif train_type == "cs2dsec_image+events":
            src_in = (day_image,
                      jnp.where(use_events, day_events, day_isr), None)
            mix_in = (mixed_img,
                      jnp.where(use_events, mixed_events, mixed_isr), None)
            if iaf:
                src_alt = ((day_image, day_isr, None), "fusion_isr")
                mix_alt = ((mixed_img, mixed_isr, None), "fusion_isr")
            if u.isr_no_fusion:
                # no fusion-stream loss on ISR-coin steps (reference
                # dacs.py:510-512, 840-842); same graph, gated weight
                weights = {**weights, "w_fusion":
                           weights["w_fusion"]
                           * use_events.astype(jnp.float32)}
        elif d2n_type:
            src_in = (day_image, day_pair_isr, None)
            mix_in = (mixed_img, mixed_isr, None)
        elif nofusion_type:
            src_in = (day_image, day_isr, None)
            src_mode = "no_fusion"
            mix_in = (mixed_img, mixed_isr, None)
        else:  # raw-isr / split: ISR plays the events role
            src_in = (day_image, day_isr, None)
            mix_in = (mixed_img, mixed_isr, None)

        def forward_maybe_alt(params, bstats, inputs, mode, alt):
            """Events-graph vs ISR-graph under the per-iteration coin; one
            executed per step (lax.cond), identical output trees."""
            if alt is None:
                return forward_train(params, bstats, *inputs, mode)
            alt_in, alt_mode = alt
            return jax.lax.cond(
                use_events,
                lambda p, b: forward_train(p, b, *inputs, mode),
                lambda p, b: forward_train(p, b, *alt_in, alt_mode),
                params, bstats)

        def src_loss_fn(params, bstats):
            logits_src, feats_src, bstats1 = forward_maybe_alt(
                params, bstats, src_in, src_mode, src_alt)
            if split_type:
                loss_src, logs_src = stream_losses(
                    logits_src, {"image": day_label, "events": day_label},
                    {}, 2.0)
            elif d2n_type:
                loss_src, logs_src = stream_losses(
                    logits_src,
                    {"image": day_label, "events": target_day_pl}, {}, 1.0)
            elif nofusion_type:
                ev_lbl = (seg_label_to_edge_label(day_label)
                          if u.isr_edge else day_label)
                loss_src, logs_src = stream_losses(
                    logits_src, {"image": day_label, "events": ev_lbl},
                    {}, 1.0)
            else:
                loss_src, logs_src = multi_stream_loss(
                    logits_src, day_label, None, **weights)
            logs = {f"src/{k}": v for k, v in logs_src.items()}
            # ④ ImageNet feature distance rides the source graph
            if self.enable_fdist:
                fd = self._fdist_loss(state, feats_src["f_image"],
                                      day_image, day_label)
                logs["src/loss_imnet_feat_dist"] = fd
                loss_src = loss_src + fd
            return loss_src, (bstats1, logs)

        def mix_loss_fn(params, bstats):
            logits_mix, feats_mix, bstats2 = forward_maybe_alt(
                params, bstats, mix_in, src_mode, mix_alt)
            logs = {}
            if split_type:
                loss_mix, logs_mix = stream_losses(
                    logits_mix, {"image": mixed_lbl, "events": mixed_lbl2},
                    {"image": mixed_weight, "events": mixed_weight2}, 2.0)
            elif d2n_type:
                loss_mix, logs_mix = stream_losses(
                    logits_mix, {"image": mixed_lbl, "events": mixed_lbl2},
                    {"image": mixed_weight, "events": mixed_weight}, 1.0)
            elif nofusion_type:
                ev_lbl = (seg_label_to_edge_label(mixed_lbl)
                          if u.isr_edge else mixed_lbl)
                loss_mix, logs_mix = stream_losses(
                    logits_mix, {"image": mixed_lbl, "events": ev_lbl},
                    {"image": mixed_weight, "events": mixed_weight}, 1.0)
                # ISR-feature consistency (reference dacs.py:807-819 +
                # encoder_decoder.py:833-848)
                f_isr = self.model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    None, mixed_isr, None, mode="no_fusion", train=False,
                    method=self.model.extract_feat)["f_events"]
                consistency = feature_consistency_loss(
                    feats_mix["f_image"], f_isr,
                    u.lambda_feature_consistency) * u.lambda_isr_features
                logs["mix/loss_feat_consis"] = consistency
                loss_mix = loss_mix + consistency
            else:
                loss_mix, logs_mix = multi_stream_loss(
                    logits_mix, mixed_lbl, mixed_weight, **weights)
            logs.update({f"mix/{k}": v for k, v in logs_mix.items()})
            return loss_mix, (bstats2, logs)

        (loss_src, (bstats1, logs_src)), grads_src = jax.value_and_grad(
            src_loss_fn, has_aux=True)(state.params, state.batch_stats)
        if u.source_only:
            # ablation/control mode: supervised source loss only, no
            # self-training (the convergence-demo baseline; the reference's
            # legacy uda='source-only' grids, experiments.py:229-233)
            loss = loss_src
            logs = {**logs_src, "loss": loss}
            grads, new_bstats = grads_src, bstats1
        else:
            # Barrier: tie the mixed-step inputs to the finished source
            # gradients so XLA cannot interleave the two backward passes —
            # the source activations are dead before the mixed forward starts.
            alt_in, alt_mode = mix_alt if mix_alt is not None else (None, None)
            grads_src, mix_in, alt_in, mixed_lbl, mixed_weight, bstats1 = \
                jax.lax.optimization_barrier(
                    (grads_src, mix_in, alt_in, mixed_lbl, mixed_weight,
                     bstats1))
            mix_alt = (alt_in, alt_mode) if alt_mode is not None else None
            (loss_mix, (new_bstats, logs_mix)), grads_mix = jax.value_and_grad(
                mix_loss_fn, has_aux=True)(state.params, bstats1)
            loss = loss_src + loss_mix
            logs = {**logs_src, **logs_mix, "loss": loss}
            grads = jax.tree.map(jnp.add, grads_src, grads_mix)
        updates, new_opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
        new_params = jax.tree.map(lambda p, up: p + up, state.params, updates)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bstats,
            opt_state=new_opt_state)
        logs["pseudo_weight"] = jnp.mean(pseudo_weight)
        logs["use_events"] = use_events.astype(jnp.float32)
        return new_state, logs

    def jit_train_step(self, donate: bool = True):
        return jax.jit(self.train_step,
                       donate_argnums=(0,) if donate else ())

    def jit_debug_tensors(self):
        return jax.jit(self.debug_tensors)
