"""DAFormer decode heads (context-aware multi-scale fusion decoder).

Behavioral contract (reference mmseg/models/decode_heads/daformer_head.py +
decode_head.py):
  * per-scale 1x1 "mlp" embed to 256ch, bilinear-upsample all scales to the
    stride-4 grid, channel-concat in scale order, then a depthwise-separable
    ASPP fusion (dilations (1,6,12,18), BN+ReLU, no image pool; config
    configs/_base_/models/daformer_sepaspp_mitb5.py:8-16) and a 3x3
    bottleneck; classifier = Dropout2d(0.1) + 1x1 conv -> num_classes.
  * ``DAFormerFusionHead`` == DAFormerHeadFusion (daformer_head.py:200-323):
    decodes image / events / fusion / ISR feature pyramids; with
    ``share='full'`` all streams use one decoder + one classifier (the
    flagship cs2dsec config sets share_decoder=True); ISR reuses the events
    decoder + events classifier; with ``split_cls`` separate classifiers
    exist for events/fusion streams (cs2dz raw-isr_split mode).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .common import ConvBNReLU, dense_init
from ..ops.resize import resize_bilinear

cls_init = nn.initializers.normal(stddev=0.01)


@dataclass(frozen=True)
class DAFormerHeadConfig:
    in_channels: Sequence[int] = (64, 128, 320, 512)
    embed_dim: int = 256
    channels: int = 256
    num_classes: int = 19
    dropout_ratio: float = 0.1
    aspp_dilations: Sequence[int] = (1, 6, 12, 18)
    fusion_type: str = "aspp"  # 'aspp' (sepaspp) or 'conv' (conv1 variant)


class SepConvBNReLU(nn.Module):
    """mmcv DepthwiseSeparableConvModule: depthwise(conv+BN+ReLU) then
    pointwise(conv+BN+ReLU)."""
    features: int
    kernel_size: int = 3
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stream_groups: int = 1):
        x = ConvBNReLU(x.shape[-1], self.kernel_size, dilation=self.dilation,
                       groups=x.shape[-1], dtype=self.dtype,
                       name="depthwise")(x, train, stream_groups)
        x = ConvBNReLU(self.features, 1, dtype=self.dtype,
                       name="pointwise")(x, train, stream_groups)
        return x


class SepASPP(nn.Module):
    """Depthwise-separable ASPP + 3x3 bottleneck (ASPPWrapper, pool=False)."""
    channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stream_groups: int = 1):
        branches = []
        for i, d in enumerate(self.dilations):
            if d == 1:
                y = ConvBNReLU(self.channels, 1, dtype=self.dtype,
                               name=f"aspp{i}")(x, train, stream_groups)
            else:
                y = SepConvBNReLU(self.channels, 3, dilation=d,
                                  dtype=self.dtype,
                                  name=f"aspp{i}")(x, train, stream_groups)
            branches.append(y)
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.channels, 3, dtype=self.dtype,
                       name="bottleneck")(y, train, stream_groups)
        return y


class PlainASPP(nn.Module):
    """Non-separable ASPP + 3x3 bottleneck (ASPPWrapper sep=False)."""
    channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stream_groups: int = 1):
        branches = []
        for i, d in enumerate(self.dilations):
            branches.append(ConvBNReLU(
                self.channels, 1 if d == 1 else 3, dilation=d,
                dtype=self.dtype, name=f"aspp{i}")(x, train, stream_groups))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBNReLU(self.channels, 3, dtype=self.dtype,
                          name="bottleneck")(y, train, stream_groups)


class DAFormerDecoder(nn.Module):
    """Embed + upsample + concat + fuse; returns pre-classifier features."""
    cfg: DAFormerHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False, stream_groups: int = 1):
        cfg = self.cfg
        target_hw = feats[0].shape[1:3]
        embeds = []
        for i, f in enumerate(feats):
            e = nn.Dense(cfg.embed_dim, kernel_init=dense_init,
                         dtype=self.dtype, name=f"embed{i}")(f)
            if e.shape[1:3] != target_hw:
                e = resize_bilinear(e, target_hw)
            embeds.append(e)
        x = jnp.concatenate(embeds, axis=-1)
        if cfg.fusion_type == "aspp":
            x = SepASPP(cfg.channels, cfg.aspp_dilations, dtype=self.dtype,
                        name="fuse")(x, train, stream_groups)
        elif cfg.fusion_type == "aspp_nonsep":
            # plain-conv ASPP branches (reference daformer_aspp variant)
            x = PlainASPP(cfg.channels, cfg.aspp_dilations, dtype=self.dtype,
                          name="fuse")(x, train, stream_groups)
        elif cfg.fusion_type == "conv":
            x = ConvBNReLU(cfg.channels, 1, dtype=self.dtype,
                           name="fuse")(x, train, stream_groups)
        elif cfg.fusion_type == "rawconv_and_aspp":
            # raw 3x3 conv then sepASPP (reference daformer_head.py:103-111
            # 'rawconv_and_aspp' == daformer_sepaspp_bottleneck)
            x = nn.Conv(cfg.channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name="fuse_rawconv")(x)
            x = SepASPP(cfg.channels, cfg.aspp_dilations, dtype=self.dtype,
                        name="fuse")(x, train, stream_groups)
        elif cfg.fusion_type == "isa":
            # interlaced sparse self-attention fuse (reference 'isa' type)
            from .heads import ISALayer
            x = ISALayer(cfg.channels, isa_channels=cfg.channels // 2,
                         dtype=self.dtype, name="fuse")(x, train)
        else:
            raise ValueError(cfg.fusion_type)
        return x


class Classifier(nn.Module):
    """Dropout2d + 1x1 conv classifier (cls_seg)."""
    num_classes: int
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dropout_ratio > 0:
            # Dropout2d drops whole channels
            x = nn.Dropout(self.dropout_ratio, broadcast_dims=(1, 2),
                           deterministic=deterministic)(x)
        x = nn.Conv(self.num_classes, (1, 1), kernel_init=cls_init,
                    dtype=jnp.float32, name="conv_seg")(x.astype(jnp.float32))
        return x


class DAFormerHead(nn.Module):
    """Single-stream DAFormer head -> logits at stride 4.

    ``train`` gates dropout; ``bn_train`` (defaults to train) gates BN batch
    statistics — the EMA teacher runs with bn_train=True but train=False
    (reference dacs.py:458-462 disables only Dropout/DropPath on the teacher).
    """
    cfg: DAFormerHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False, bn_train: bool | None = None):
        bn = train if bn_train is None else bn_train
        x = DAFormerDecoder(self.cfg, dtype=self.dtype, name="decoder")(feats, bn)
        return Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                          dtype=self.dtype, name="cls")(x, deterministic=not train)


class DAFormerFusionHead(nn.Module):
    """Multi-stream head over {image, events, fusion, ISR} pyramids.

    share: 'full'  -> one decoder, one classifier for every stream
           'half'  -> per-stream embeds, shared fuse layer (approximated as
                      shared decoder tail; reference dafomer half_share ties
                      only fuse layers)
           'none'  -> three independent decoders
    split_cls: independent classifiers for events/fusion streams.
    events_classes: classifier width for the events stream (2 for the
           raw-isr_no-fusion edge variant).
    """
    cfg: DAFormerHeadConfig
    share: str = "full"
    split_cls: bool = False
    events_classes: int | None = None
    remat: bool = False
    # decode all shared streams as ONE stacked-batch pass. Always on in
    # eval (running-stats BN -> exactly the sequential result, ~4x fewer
    # head ops); during training (batch-stats BN) only when opted in —
    # the batched backward's working set costs ~0.3 GB extra HBM, which
    # OOMs the b5 recipe at batch 8 on a 16 GB v5e (docs/PERF.md) but is
    # free on larger-HBM parts. StreamBatchNorm(stream_groups=k) keeps
    # train-mode numerics identical to the sequential loop.
    batched_train: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.decoder_image = DAFormerDecoder(self.cfg, dtype=self.dtype)
        if self.share == "none":
            self.decoder_events = DAFormerDecoder(self.cfg, dtype=self.dtype)
            self.decoder_fusion = DAFormerDecoder(self.cfg, dtype=self.dtype)
        self.cls = Classifier(self.cfg.num_classes, self.cfg.dropout_ratio,
                              dtype=self.dtype)
        if self.split_cls:
            self.cls_events = Classifier(
                self.events_classes or self.cfg.num_classes,
                self.cfg.dropout_ratio, dtype=self.dtype)
            self.cls_fusion = Classifier(self.cfg.num_classes,
                                         self.cfg.dropout_ratio, dtype=self.dtype)

    def _decode(self, which: str, feats, bn_train: bool,
                stream_groups: int = 1, remat: bool | None = None):
        if self.share == "none":
            dec = {"image": self.decoder_image, "events": self.decoder_events,
                   "fusion": self.decoder_fusion}[which]
        else:
            dec = self.decoder_image
        if self.remat if remat is None else remat:
            fn = nn.remat(DAFormerDecoder.__call__, prevent_cse=False,
                          static_argnums=(2, 3))
            return fn(dec, feats, bn_train, stream_groups)
        return dec(feats, bn_train, stream_groups)

    def _cls(self, which: str, x, train: bool):
        det = not train
        if not self.split_cls:
            return self.cls(x, deterministic=det)
        if which == "image":
            return self.cls(x, deterministic=det)
        if which in ("events", "isr"):
            return self.cls_events(x, deterministic=det)
        return self.cls_fusion(x, deterministic=det)

    def __call__(self, feats: dict, train: bool = False,
                 bn_train: bool | None = None, streams=None):
        """feats: {'f_image': [...], 'f_events': [...]|None,
        'f_fusion': [...]|None, 'f_img_self_res': [...]|None}
        -> dict of logit streams (None where input missing).

        ``streams`` optionally restricts which outputs are decoded (e.g.
        the EMA teacher only consumes the PL stream — skipping the other
        decoder passes is pure compute/HBM savings, same results)."""
        bn = train if bn_train is None else bn_train

        def want(name):
            return streams is None or name in streams

        plan = [("image", "image_output", feats.get("f_image")),
                ("events", "events_output", feats.get("f_events")),
                ("fusion", "fusion_output", feats.get("f_fusion")),
                ("isr", "img_self_res_output", feats.get("f_img_self_res"))]
        active = [(n, k, f) for n, k, f in plan if f is not None and want(n)]
        out = {"image_output": None, "events_output": None,
               "fusion_output": None, "img_self_res_output": None}

        if (self.share == "full" and not self.split_cls and len(active) > 1
                and self.cfg.fusion_type != "isa"     # ISA fuse: BN inside
                                                      # attention not grouped
                and (not bn or self.batched_train)):
            # Batched fast path: one decoder + one classifier for every
            # stream -> stack the pyramids along batch and decode ONCE.
            # StreamBatchNorm(stream_groups=k) keeps per-stream batch
            # statistics + the sequential running-stat update, so this is
            # numerically the per-stream loop (reference decodes streams
            # one after another through the shared decoder,
            # daformer_head.py:305-322); it cuts the head's op count ~4x
            # (the r3 profile's ~300 ms non-scan tail, docs/PERF.md).
            k = len(active)
            scales = tuple(tuple(f[i] for _, _, f in active)
                           for i in range(len(active[0][2])))

            def stack_decode(mdl, per_scale, bn_train, do_train, groups):
                # concat AND classifier live INSIDE the remat region: the
                # saved residuals are the original per-stream pyramids +
                # the stride-4 logits — not the stacked copy (~130 MB) nor
                # the f32 pre-classifier activations (~512 MB at b8)
                stacked = [jnp.concatenate(list(fs), axis=0)
                           for fs in per_scale]
                dec = DAFormerFusionHead._decode(
                    mdl, "image", stacked, bn_train, groups, remat=False)
                return mdl._cls("image", dec, do_train)

            if self.remat:
                stack_decode = nn.remat(stack_decode, prevent_cse=False,
                                        static_argnums=(2, 3, 4))
            logits = stack_decode(self, scales, bn, train, k)
            b = active[0][2][0].shape[0]
            for j, (_, key, _f) in enumerate(active):
                out[key] = logits[j * b: (j + 1) * b]
            return out

        for name, key, f in active:
            dec_name = "events" if name == "isr" else name
            out[key] = self._cls(name, self._decode(dec_name, f, bn), train)
        return out
