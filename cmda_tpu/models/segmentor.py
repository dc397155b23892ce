"""Segmentors: single-backbone EncoderDecoder and the dual-backbone
FusionEncoderDecoder.

Behavioral contract (reference mmseg/models/segmentors/encoder_decoder.py):
  * FusionEncoderDecoder (:625-1003): backbone_image + backbone_events (the
    events backbone also encodes the ISR stream, :702), a fusion module over
    the two pyramids (+ optional fusion_isr module), DAFormerHeadFusion.
    ``extract_feat`` modes: default (fusion(image, events)), 'no_fusion',
    'fusion_isr' (fuse image with ISR), 'fusion_all' (average of ISR-fusion
    and events-fusion pyramids, :698-721).  Logits are resized to the input
    size with bilinear align_corners=False (:723-746).
  * slide inference (:851-894): overlapping crops, accumulated logits
    normalized by a count map — here compiled as ONE XLA program over a
    static crop grid instead of a Python loop of device launches.

Design: linen modules return logits; losses live in cmda_tpu/uda (the train
step) so the module stays a pure function of (params, inputs).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import flax.linen as nn

from .mit import MixVisionTransformer, MIT_VARIANTS
from .daformer import DAFormerHead, DAFormerFusionHead, DAFormerHeadConfig
from .fusion import build_fusion_module
from ..ops.resize import resize_bilinear


@dataclass(frozen=True)
class SegmentorConfig:
    backbone: str = "mit_b5"
    num_classes: int = 19
    train_type: str = "cs2dsec_image+events_together"
    fusion: str = "attention_avg"
    fusion_isr: str = "attention"
    share_decoder: str = "full"     # 'full' | 'half' | 'none'
    split_cls: bool = False
    events_classes: int | None = None
    head: DAFormerHeadConfig = field(default_factory=DAFormerHeadConfig)
    drop_path_rate: float = 0.1
    remat: bool = False   # checkpoint each encoder block (memory vs FLOPs)
    remat_policy: str = "full"  # 'full' | 'dots' (save matmul outputs)
    # lax.scan _split_transpose on the encoder stage scans: splits the
    # backward into a recompute scan + a grad-stacking transpose scan
    # (perf experiment vs the DUS bucket — docs/PERF.md)
    scan_split_transpose: bool = False
    # fully unroll the short encoder stages (depth<=6) out of lax.scan:
    # stacked param layout unchanged, but their backward grad-stacking
    # becomes schedulable concats instead of in-loop DUS (docs/PERF.md)
    scan_unroll_short: bool = False
    # batched multi-stream head decode during TRAINING (eval always
    # batches): opt-in — costs ~0.3 GB HBM, OOMs b5@batch8 on 16 GB v5e
    head_batched_train: bool = False


def _dtype_of(name):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name] \
        if isinstance(name, str) else name


class EncoderDecoder(nn.Module):
    """Single-backbone segmentor (DAFormer/SegFormer style)."""
    cfg: SegmentorConfig = SegmentorConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mit_cfg = MIT_VARIANTS[self.cfg.backbone]
        mit_cfg = type(mit_cfg)(**{**mit_cfg.__dict__,
                                   "drop_path_rate": self.cfg.drop_path_rate})
        self.backbone = MixVisionTransformer(mit_cfg, dtype=self.dtype,
                                             remat=self.cfg.remat)
        self.decode_head = DAFormerHead(self.cfg.head, dtype=self.dtype)

    def extract_feat(self, img, train: bool = False):
        return self.backbone(img.astype(self.dtype), train)

    def __call__(self, img, train: bool = False):
        """encode_decode: logits resized to input resolution."""
        feats = self.extract_feat(img, train)
        logits = self.decode_head(feats, train)
        return resize_bilinear(logits, img.shape[1:3])

    def forward_with_features(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        logits = self.decode_head(feats, train)
        return resize_bilinear(logits, img.shape[1:3]), feats


class EventsEncoderDecoder(nn.Module):
    """Early-fusion segmentor: channel-concat image+events into ONE backbone
    (reference encoder_decoder.py:307-377 EventsEncoderDecoder)."""
    cfg: SegmentorConfig = SegmentorConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mit_cfg = MIT_VARIANTS[self.cfg.backbone]
        mit_cfg = type(mit_cfg)(**{**mit_cfg.__dict__,
                                   "drop_path_rate": self.cfg.drop_path_rate})
        self.backbone = MixVisionTransformer(mit_cfg, dtype=self.dtype,
                                             remat=self.cfg.remat)
        self.decode_head = DAFormerHead(self.cfg.head, dtype=self.dtype)

    def extract_feat(self, image, events, train: bool = False):
        x = jnp.concatenate([image, events], axis=-1).astype(self.dtype)
        return self.backbone(x, train)

    def __call__(self, image, events, train: bool = False):
        feats = self.extract_feat(image, events, train)
        logits = self.decode_head(feats, train)
        return resize_bilinear(logits, image.shape[1:3])


class GenericEncoderDecoder(nn.Module):
    """Any (backbone[, neck], head) pipeline -> logits at input resolution.

    Powers the legacy architecture grid (reference experiments.py:398-427:
    ResNet/ResNeXt/ResNeSt x DLV2/DLV3+/DA/ISA/SegFormer/UPer combos;
    'sfa_' combos insert the SegFormerAdapter neck, experiments.py:134)."""
    backbone: nn.Module
    head: nn.Module
    neck: nn.Module | None = None

    def extract_feat(self, img, train: bool = False):
        """Backbone(+neck) features (mmseg EncoderDecoder.extract_feat
        applies the neck when present)."""
        feats = self.backbone(img, train)
        if self.neck is not None:
            feats = self.neck(feats, train)
        return feats

    def __call__(self, img, train: bool = False):
        feats = self.extract_feat(img, train)
        logits = self.head(feats, train)
        return resize_bilinear(logits, img.shape[1:3])

    def forward_with_features(self, img, train: bool = False):
        """Same contract as EncoderDecoder.forward_with_features — lets the
        OrgDACS trainer drive any legacy architecture combo (the reference
        exp 3-8 grids run DACS over ResNet/DLv2 etc., experiments.py:277-396)."""
        feats = self.extract_feat(img, train)
        logits = self.head(feats, train)
        return resize_bilinear(logits, img.shape[1:3]), feats


def multi_scale_flip_inference(apply_fn, img, *, scales=(1.0,),
                               flip: bool = False):
    """aug_test-equivalent (reference encoder_decoder.py:986-1003 +
    inference :938-971): average softmax over scales (and horizontal flip),
    all rescaled back to the input resolution, inside one traced program."""
    b, h, w, c = img.shape
    acc = None
    n = 0
    for s in scales:
        sh, sw = int(round(h * s)), int(round(w * s))
        x = resize_bilinear(img, (sh, sw)) if (sh, sw) != (h, w) else img
        variants = [x] + ([x[:, :, ::-1, :]] if flip else [])
        for vi, v in enumerate(variants):
            logits = apply_fn(v)
            logits = resize_bilinear(logits, (h, w))
            sm = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if vi == 1:  # un-flip
                sm = sm[:, :, ::-1, :]
            acc = sm if acc is None else acc + sm
            n += 1
    return acc / n


class FusionEncoderDecoder(nn.Module):
    """Dual-backbone image+events segmentor with feature-level fusion."""
    cfg: SegmentorConfig = SegmentorConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mit_cfg = MIT_VARIANTS[self.cfg.backbone]
        mit_cfg = type(mit_cfg)(**{**mit_cfg.__dict__,
                                   "drop_path_rate": self.cfg.drop_path_rate})
        self.backbone_image = MixVisionTransformer(
            mit_cfg, dtype=self.dtype, remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            split_transpose=self.cfg.scan_split_transpose,
            unroll_short=self.cfg.scan_unroll_short)
        self.backbone_events = MixVisionTransformer(
            mit_cfg, dtype=self.dtype, remat=self.cfg.remat,
            remat_policy=self.cfg.remat_policy,
            split_transpose=self.cfg.scan_split_transpose,
            unroll_short=self.cfg.scan_unroll_short)
        self.fusion_module = build_fusion_module(
            self.cfg.fusion, self.dtype, remat=self.cfg.remat)
        self.fusion_isr_module = build_fusion_module(
            self.cfg.fusion_isr, self.dtype, remat=self.cfg.remat)
        self.decode_head = DAFormerFusionHead(
            self.cfg.head, share=self.cfg.share_decoder,
            split_cls=self.cfg.split_cls,
            events_classes=self.cfg.events_classes, remat=self.cfg.remat,
            batched_train=self.cfg.head_batched_train, dtype=self.dtype)

    def extract_feat(self, image, events, img_self_res=None,
                     mode: str = "default", train: bool = False):
        """-> {'f_image', 'f_events', 'f_fusion', 'f_img_self_res'}."""
        f_image = (self.backbone_image(image.astype(self.dtype), train)
                   if image is not None else None)
        if (events is not None and img_self_res is not None
                and events.shape == img_self_res.shape):
            # events and ISR share the events backbone (reference
            # encoder_decoder.py:702) — run them as ONE double-batch pass:
            # same math, half the kernel launches / scan traversals, and the
            # stage matmuls hit the MXU at 2x batch.
            both = self.backbone_events(
                jnp.concatenate([events, img_self_res], axis=0
                                ).astype(self.dtype), train)
            b = events.shape[0]
            f_events = [f[:b] for f in both]
            f_isr = [f[b:] for f in both]
        else:
            f_events = (self.backbone_events(events.astype(self.dtype), train)
                        if events is not None else None)
            f_isr = (self.backbone_events(img_self_res.astype(self.dtype),
                                          train)
                     if img_self_res is not None else None)
        if mode == "no_fusion":
            f_fusion = None
        elif mode == "fusion_isr":
            other = f_events if f_isr is None else f_isr
            f_fusion = self.fusion_isr_module(f_image, other, train)
        elif mode == "fusion_all":
            f_a = self.fusion_isr_module(f_image, f_isr, train)
            f_b = self.fusion_module(f_image, f_events, train)
            f_fusion = [(a + b) / 2 for a, b in zip(f_a, f_b)]
        else:
            f_fusion = (self.fusion_module(f_image, f_events, train)
                        if (self.fusion_module is not None and f_events is not None)
                        else None)
        return {"f_image": f_image, "f_events": f_events,
                "f_fusion": f_fusion, "f_img_self_res": f_isr}

    def forward_logits(self, image, events, img_self_res=None,
                       mode: str = "default", train: bool = False,
                       bn_train: bool | None = None,
                       resize_to_input: bool = True, streams=None):
        """All logit streams, optionally resized to the input resolution.

        ``train`` gates dropout/droppath; ``bn_train`` gates BN batch stats
        (the EMA teacher passes train=False, bn_train=True). ``streams``
        restricts which outputs are decoded/resized — the teacher only
        needs its PL stream, which skips 2-3 decoder passes and the
        input-res f32 logit buffers of the unused streams."""
        feats = self.extract_feat(image, events, img_self_res, mode, train)
        out = self.decode_head(feats, train, bn_train, streams=streams)
        if resize_to_input:
            size = (image.shape[1:3] if image is not None
                    else events.shape[1:3])
            out = {k: (resize_bilinear(v, size) if v is not None else None)
                   for k, v in out.items()}
        return out

    def forward_train(self, image, events, img_self_res=None,
                      mode: str = "default"):
        """Training forward: stride-4 logits dict + features (for fdist /
        consistency losses)."""
        feats = self.extract_feat(image, events, img_self_res, mode, train=True)
        logits = self.decode_head(feats, train=True)
        return logits, feats

    def __call__(self, image, events, img_self_res=None,
                 mode: str = "default", output: str = "fusion",
                 train: bool = False, bn_train: bool | None = None):
        """encode_decode: one selected stream, resized to input size."""
        out = self.forward_logits(image, events, img_self_res, mode, train,
                                  bn_train)
        key = {"fusion": "fusion_output", "image": "image_output",
               "events": "events_output", "isr": "img_self_res_output"}[output]
        got = out[key]
        if got is None:  # events-less inference falls back to image stream
            got = out["image_output"]
        return got


def slide_inference(apply_fn, img, *, crop_size: tuple[int, int],
                    stride: tuple[int, int], num_classes: int,
                    crop_chunk: int | None = None):
    """Sliding-window inference compiled as one XLA program.

    ``apply_fn(crop) -> logits`` at crop resolution.  Static crop grid
    (reference encoder_decoder.py:175-218): the G grid crops are folded
    into the batch dimension and run through ONE forward of [G*B] crops
    (the eval head is batched), then scatter-added and count-normalized.
    ``crop_chunk`` bounds crops-per-forward when [G*B] would blow HBM:
    the grid is processed in ceil(G/crop_chunk) forwards (still a single
    XLA program — the chunk loop is unrolled at trace time).
    """
    b, h, w, c = img.shape
    h_crop, w_crop = crop_size
    h_stride, w_stride = stride
    h_grids = max(h - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w - w_crop + w_stride - 1, 0) // w_stride + 1
    preds = jnp.zeros((b, h, w, num_classes), jnp.float32)
    count = jnp.zeros((b, h, w, 1), jnp.float32)
    offsets = []
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1 = min(hi * h_stride, h - h_crop)
            x1 = min(wi * w_stride, w - w_crop)
            offsets.append((y1, x1))
    g_total = len(offsets)
    crops = jnp.stack([
        jax.lax.dynamic_slice(img, (0, y1, x1, 0), (b, h_crop, w_crop, c))
        for (y1, x1) in offsets])               # [G, B, hc, wc, C]
    flat = crops.reshape(g_total * b, h_crop, w_crop, c)
    chunk = g_total if not crop_chunk else min(crop_chunk, g_total)
    parts = [apply_fn(flat[s * b: (s + g) * b])
             for s, g in _chunk_spans(g_total, chunk)]
    logits = jnp.concatenate(parts, axis=0).reshape(
        g_total, b, h_crop, w_crop, num_classes)
    for g, (y1, x1) in enumerate(offsets):
        pad = [(0, 0), (y1, h - y1 - h_crop), (x1, w - x1 - w_crop), (0, 0)]
        preds = preds + jnp.pad(logits[g].astype(jnp.float32), pad)
        count = count + jnp.pad(jnp.ones((b, h_crop, w_crop, 1), jnp.float32), pad)
    return preds / count


def _chunk_spans(total: int, chunk: int):
    """(start, length) spans covering ``total`` in steps of ``chunk``."""
    return [(s, min(chunk, total - s)) for s in range(0, total, chunk)]
