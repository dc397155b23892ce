"""Typed configuration tree (replaces mmcv Config + _base_ inheritance).

The reference composes python config files with ``_base_`` multiple
inheritance (configs/fusion/cs2dsec_image+events_together_b5.py:1-13); here a
run is a plain dataclass tree with preset factory functions.  Presets mirror
the two published CMDA recipes:
  * ``cs2dsec_image_events_b5`` == configs/fusion/cs2dsec_image+events_together_b5.py
  * ``cs2dz_image_rawisr_b5``   == configs/fusion/cs2dz_image+raw-isr_b5.py
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Sequence

from .models.daformer import DAFormerHeadConfig
from .models.segmentor import SegmentorConfig


@dataclass(frozen=True)
class IsrParams:
    """Image Self-Residual parameters (per domain / per use)."""
    val_range: tuple[float, float] = (0.01, 1.01)
    threshold: float = 0.005
    clip_range: float = 0.1
    shift_pixel: int = 1

    @staticmethod
    def from_string(s: str) -> "IsrParams":
        """Parse the reference launcher's 5-float dash string
        ``lo-hi-threshold-clip-shift`` (my_run_experiments.py:411-416)."""
        v = [float(x) for x in s.split("-")]
        assert len(v) == 5, s
        return IsrParams((v[0], v[1]), v[2], v[3], int(v[4]))


# Reference per-domain ISR default tables keyed by *_isr_data_type —
# 'day'/'night' for raw frames, 'new_day'/'new_night' for CycleGAN
# style-transferred frames (reference cityscapes_ic.py:100-116,
# dark_zurich_ic.py:110-127).  The published configs override the single
# entries with explicit isr_parms, so these matter when a launcher selects
# the 'new_*' variants or shift_3_channel.
CS_ISR_PRESETS = {
    "day": IsrParams((1.0, 10.0), 0.03, 0.2, 3),
    "new_day": IsrParams((1e-5, 255 + 1e-5), 0.0, 0.040, 3),
}
CS_ISR_PRESETS_3 = {
    "day": (IsrParams((1.0, 10.0), 0.025, 0.05, 1),
            IsrParams((1.0, 10.0), 0.030, 0.20, 3),
            IsrParams((1.0, 10.0), 0.040, 0.32, 5)),
    "new_day": (IsrParams((1e-5, 255 + 1e-5), 0.0, 0.015, 1),
                IsrParams((1e-5, 255 + 1e-5), 0.0, 0.040, 3),
                IsrParams((1e-5, 255 + 1e-5), 0.0, 0.070, 5)),
}
DZ_ISR_PRESETS = {
    "night": IsrParams((1.0, 100.0), 0.04, 0.2, 3),
    "new_night": IsrParams((500.0, 1000.0), 0.02, 0.12, 3),
}
DZ_ISR_PRESETS_3 = {
    "night": (IsrParams((9.0, 255 + 9.0), 0.012, 0.04, 1),
              IsrParams((9.0, 255 + 9.0), 0.012, 0.12, 3),
              IsrParams((9.0, 255 + 9.0), 0.012, 0.20, 5)),
    "new_night": (IsrParams((500.0, 1000.0), 0.015, 0.05, 1),
                  IsrParams((500.0, 1000.0), 0.020, 0.12, 3),
                  IsrParams((500.0, 1000.0), 0.025, 0.20, 5)),
}


@dataclass(frozen=True)
class UDAConfig:
    """DACS self-training hyperparameters
    (configs/_base_/uda/dacs.py + flagship overrides)."""
    alpha: float = 0.999
    pseudo_threshold: float = 0.968
    pseudo_weight_ignore_top: int = 0
    pseudo_weight_ignore_bottom: int = 0
    blur: bool = True
    color_jitter_strength: float = 0.2
    color_jitter_probability: float = 0.2
    # supervised source loss only, no self-training (control/ablation;
    # the reference's legacy uda='source-only' grids)
    source_only: bool = False
    # multi-stream loss weights (forward_cfg.loss_weight)
    loss_weight_image: float = 0.5
    loss_weight_events: float = 0.5
    loss_weight_fusion: float = 0.5
    loss_weight_isr: float = 0.25
    # fold the 4 per-stream CEs into one stacked resize+CE kernel chain
    # (same math, parity-tested; perf lever — see docs/PERF.md)
    stacked_stream_ce: bool = False
    # route the per-stream upsample+CE and the teacher resize+argmax
    # through the fused Pallas phase kernels (ops/pallas_ce.py; parity-
    # tested values+grads and at full-step level): the [B,H,W,C] resized
    # logits never materialize in HBM.  Default ON — measured 6.585 vs
    # 6.549 samples/s on the flagship b5 step (docs/PERF.md round 4); the
    # gate in DACSTrainer._pallas_ce keeps it off on non-TPU backends and
    # unsupported geometries fall back to the identical XLA math.
    pallas_ce: bool = True
    # feed the (pure-inference) teacher forward a bfloat16 cast of the EMA
    # weights; EMA accumulation itself stays float32.  Perf lever — see
    # docs/PERF.md for the measured effect and the pseudo-label drift bound.
    teacher_bf16: bool = False
    # events-vs-ISR per-iteration coin
    random_choice_thres: float | str = 0.5   # float, or 'a-b' linear schedule
    # mixed-image -> mixed-ISR recomputation
    mixed_image_to_mixed_isr: bool = True
    isr_params: IsrParams = field(default_factory=IsrParams)
    shift_type: str = "random"                # 'random' | 'rightdown' | 'all'
    # ImageNet feature distance
    imnet_feature_dist_lambda: float = 0.0
    imnet_feature_dist_classes: Sequence[int] = (6, 7, 11, 12, 13, 14, 15, 16, 17, 18)
    imnet_feature_dist_scale_min_ratio: float = 0.75
    # variants
    isr_another_fusion: bool = False          # ISR fused via fusion_isr module
    isr_no_fusion: bool = False               # no fusion stream when ISR picked
    isr_edge: bool = False                    # raw-isr_no-fusion edge labels
    lambda_isr_features: float = 1.0
    # 2-class weight [1-w, w] on the edge-stream CE when isr_edge; -1 = off.
    # The reference sets this on the SHARED loss (dacs.py:142-146), which
    # would crash its 19-class image stream — here it applies to the edge
    # stream only (the evident intent).
    isr_edge_class_weight: float = -1.0
    # jitter+blur the class-mixed ISR in the (x+1)/2 domain
    # (reference dacs.py:757-758 isr_flag -> dacs_transforms.py:11-35)
    isr_mix_aug: bool = False
    # validated but functionally dead in the reference: its consuming
    # branch is commented out (dacs.py:684-699); only asserts remain
    img_self_res_reg: str = "no"              # no|only_isr|mixed|average
    fuse_both_ice_and_e: bool = False
    without_events: bool = False
    without_isd: bool = False
    lambda_feature_consistency: float = 0.25
    use_cyclegan_day_events: bool = True      # cyclegan_itrd2en
    use_pallas_isr: bool = True               # fused ISR kernel on TPU
    # mixed-ISR ablations (reference dacs.py:735-756)
    shift_3_channel: bool = False             # 3-channel multi-scale mixed ISR
    isr_params_3: tuple[IsrParams, ...] = (   # the 'day' parameter triplet
        IsrParams((1.0, 10.0), 0.025, 0.05, 1),
        IsrParams((1.0, 10.0), 0.030, 0.20, 3),
        IsrParams((1.0, 10.0), 0.040, 0.32, 5))
    isr_noise_dacs_type: str = ""             # ''|'noise'|'blur'|'noise+blur'
    deflare_aug: bool = False                 # teacher PL on deflared inputs


@dataclass(frozen=True)
class OptimConfig:
    """AdamW + poly-with-warmup (configs/_base_/schedules/adamw.py,
    poly10warm.py; head lr x10, no decay for norm params)."""
    lr: float = 6e-5
    betas: tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    head_lr_mult: float = 10.0
    warmup_iters: int = 1500
    warmup_ratio: float = 1e-6
    power: float = 1.0
    min_lr: float = 0.0
    max_iters: int = 40000
    grad_clip: float | None = None
    # AdamW moment storage dtype; 'bfloat16' halves optimizer-state HBM
    # (~1.6 GB on the b5 flagship) with f32 update arithmetic
    moment_dtype: str = "float32"


@dataclass(frozen=True)
class DataConfig:
    batch_size: int = 2
    # source crop == model input size == DSEC after-crop resize; the DSEC
    # pre-resize crop is separate (reference my_run_experiments.py:212-224
    # --train_size table; flagship: source 512, target 400 -> resize 512)
    crop_size: tuple[int, int] = (512, 512)
    target_crop_size: tuple[int, int] = (400, 400)
    num_classes: int = 19
    source: str = "cityscapes_ic"
    target: str = "dsec"
    source_root: str = "data/cityscapes"
    target_root: str = "data/dsec"
    events_bins: int = 1
    events_clip_scale: float = 1.5 / 500000.0  # adaptive clip per event count
    # rare class sampling
    rcs_enabled: bool = True
    rcs_class_temp: float = 0.01
    rcs_min_pixels: int = 3000
    rcs_min_crop_ratio: float = 0.5
    # source ISR params (on-the-fly from the crop)
    source_isr: IsrParams = field(default_factory=IsrParams)
    target_isr: IsrParams = field(default_factory=IsrParams)
    # shift_3_channel per-dataset parameter triplets (reference
    # cityscapes_ic.py:100-111, dark_zurich_ic.py:110-122)
    source_isr_3: tuple[IsrParams, ...] = CS_ISR_PRESETS_3["day"]
    target_isr_3: tuple[IsrParams, ...] = DZ_ISR_PRESETS_3["night"]
    # 'day'|'new_day' / 'night'|'new_night' preset selectors (launcher
    # --cs_isr_data_type/--dz_isr_data_type); resolved in tools/train.py
    cs_isr_data_type: str = "day"
    dz_isr_data_type: str = "night"
    # reference --dz_auto_threshold: forwarded to get_image_change_from_pil,
    # which raises 'auto_threshold function not implement' (utils.py:124-125)
    dz_auto_threshold: bool = False
    shift_type: str = "random"
    workers: int = 4
    # decoded-base-frame LRU capacity per dataset, in frames (data/cache.py;
    # 0 = off). Draw randomness (crop/flip/augs/ISR/voxel clip) acts after
    # decode, so caching is distribution-transparent — parity-tested.
    decode_cache: int = 0
    # batches staged ahead on device (train/loop.py device_prefetch): h2d
    # for batch N+1 overlaps step N's execution instead of serializing
    # after it; costs this many extra batches of HBM. 0 = place inline.
    device_prefetch: int = 1
    # compact h2d wire for train batches (data/wire.py): bf16 floats,
    # 1-channel mono streams, uint8 labels, decoded inside the jitted step.
    # ~3.6x fewer bytes per step; bf16 wire noise is below the bf16 compute
    # dtype's own rounding. Applies to the runner's loader path only.
    wire_bf16: bool = True
    # source ISR augmentations (reference cityscapes_ic.py:243-336)
    isr_noise: bool = False
    isr_cow_mask: bool = False
    flare_dir: str | None = None
    sky_noise_dir: str | None = None
    sky_mask: bool = False
    shift_3_channel: bool = False
    high_resolution_isr: bool = False
    # fixed events clip override: uniform(lo, hi) replaces the adaptive
    # (n_events/5e5)*1.5 rule (reference dsec.py:359-362,
    # my_run_experiments.py:232-233)
    events_clip_range: tuple[float, float] | None = None
    image_change_range: int = 1
    # img_time_res source mode (reference return_GI_or_IC,
    # my_run_experiments.py:189-210)
    return_gi_or_ic: str = "image_change"


@dataclass(frozen=True)
class RunConfig:
    name: str = "cs2dsec_image+events_b5"
    seed: int = 0
    work_dir: str = "work_dirs"
    model: SegmentorConfig = field(default_factory=SegmentorConfig)
    uda: UDAConfig = field(default_factory=UDAConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval_interval: int = 4000
    checkpoint_interval: int = 40000
    checkpoint_max_keep: int = 1   # reference max_keep_ckpts
    log_interval: int = 50
    debug_img_interval: int = 500
    dtype: str = "float32"  # compute dtype for model ('bfloat16' on TPU)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


def _coerce(value, template, annotation: str = ""):
    """Coerce a string override to the type of the existing field value
    (the typed-dataclass equivalent of mmcv Config's --options merge,
    reference tools/train.py:57,75-76). ``annotation`` is the declared field
    type (a string under ``from __future__ import annotations``): unions with
    ``str`` keep the raw string on a failed numeric cast, unions with
    ``None`` accept 'none'; everything else fails loudly instead of smuggling
    a str into an int field."""
    if not isinstance(value, str):
        return value
    s = value.strip()
    if s.lower() in ("none", "null") and (template is None
                                          or "None" in annotation):
        return None
    if isinstance(template, bool):
        return s.lower() in ("1", "true", "yes", "on")
    if isinstance(template, (int, float)):
        try:
            return type(template)(s)
        except ValueError:
            if isinstance(template, int):
                try:            # accept 1e4 / 4e4-style ints
                    f = float(s)
                    if f == int(f):
                        return int(f)
                except ValueError:
                    pass
            if "str" in annotation:
                return s   # union field (e.g. random_choice_thres schedule)
            raise ValueError(
                f"cannot coerce {s!r} to {type(template).__name__} "
                f"(field type {annotation or type(template).__name__})")
    if isinstance(template, IsrParams):
        return IsrParams.from_string(s)
    if isinstance(template, (tuple, list)):
        elem = template[0] if len(template) else None
        parts = [p for p in s.replace(",", " ").split() if p]
        return type(template)(_coerce(p, elem) for p in parts)
    if isinstance(template, str):
        return s
    if s.lower() in ("none", "null"):
        return None
    if template is None:
        # untyped slot: best-effort scalar / tuple-of-float / string
        if "," in s:
            return tuple(_coerce(p, None) for p in s.split(",") if p.strip())
        for cast in (int, float):
            try:
                return cast(s)
            except ValueError:
                pass
        if s.lower() in ("true", "false"):
            return s.lower() == "true"
        return s
    return s


def set_by_path(cfg, path: str, value):
    """Return a copy of the frozen config tree with ``path`` (dotted,
    e.g. ``uda.pseudo_threshold``) replaced by ``value`` (strings are
    type-coerced against the current field value)."""
    head, _, rest = path.partition(".")
    if not hasattr(cfg, head):
        raise KeyError(f"no config field {head!r} on {type(cfg).__name__} "
                       f"(path {path!r})")
    cur = getattr(cfg, head)
    if rest:
        new = set_by_path(cur, rest, value)
    else:
        ann = ""
        for f in dataclasses.fields(cfg):
            if f.name == head:
                ann = f.type if isinstance(f.type, str) else str(f.type)
        new = _coerce(value, cur, ann)
    return dataclasses.replace(cfg, **{head: new})


def apply_overrides(cfg, overrides):
    """Apply ``["a.b.c=value", ...]`` CLI overrides in order."""
    for ov in overrides or ():
        path, eq, val = ov.partition("=")
        if not eq:
            raise ValueError(f"override {ov!r} is not KEY=VALUE")
        cfg = set_by_path(cfg, path.strip(), val)
    return cfg


def cs2dsec_image_events_b5(**overrides) -> RunConfig:
    """Flagship: Cityscapes(image+IC) -> DSEC-Night image+events fusion UDA."""
    cfg = RunConfig(
        name="cs2dsec_image+events_b5",
        model=SegmentorConfig(
            backbone="mit_b5",
            train_type="cs2dsec_image+events_together",
            fusion="attention_avg",
            fusion_isr="attention",
            share_decoder="full",
            # b5 at 512x512 batch 8 needs ~61 GB HBM without encoder-block
            # rematerialization; the scoreboard recipe (docs/PERF.md) IS
            # remat=block, so the preset defaults to it
            remat=True,
            head=DAFormerHeadConfig()),
        uda=UDAConfig(),
        optim=OptimConfig(),
        data=DataConfig(),
    )
    return replace(cfg, **overrides) if overrides else cfg


def cs2dz_image_rawisr_b5(**overrides) -> RunConfig:
    """Cityscapes -> DarkZurich image+raw-ISR fusion UDA
    (configs/fusion/cs2dz_image+raw-isr_b5.py)."""
    cfg = RunConfig(
        name="cs2dz_image+raw-isr_b5",
        model=SegmentorConfig(
            backbone="mit_b5",
            train_type="cs2dz_image+raw-isr",
            fusion="attention",
            fusion_isr="",
            share_decoder="full",
            remat=True,   # see cs2dsec_image_events_b5
            head=DAFormerHeadConfig()),
        uda=UDAConfig(
            mixed_image_to_mixed_isr=True,
            loss_weight_image=0.7, loss_weight_events=0.7,
            loss_weight_fusion=0.7, loss_weight_isr=0.25,
            pseudo_weight_ignore_top=15, pseudo_weight_ignore_bottom=120,
            shift_type="rightdown",
            isr_params=IsrParams(val_range=(1.0, 100.0), threshold=0.01,
                                 clip_range=0.1, shift_pixel=3),
            use_cyclegan_day_events=False),
        optim=OptimConfig(),
        data=DataConfig(source="cityscapes_ic", target="dark_zurich",
                        target_root="data/dark_zurich",
                        source_isr=IsrParams(val_range=(1.0, 100.0),
                                             threshold=0.01, clip_range=0.1,
                                             shift_pixel=3),
                        target_isr=IsrParams(val_range=(1.0, 100.0),
                                             threshold=0.01, clip_range=0.1,
                                             shift_pixel=3),
                        shift_type="rightdown"),
    )
    return replace(cfg, **overrides) if overrides else cfg


def tiny_test_config(**overrides) -> RunConfig:
    """CPU-testable miniature (mit_b0, small crops)."""
    cfg = RunConfig(
        name="tiny",
        model=SegmentorConfig(
            backbone="mit_b0",
            train_type="cs2dsec_image+events_together",
            fusion="attention_avg",
            fusion_isr="attention",
            share_decoder="full",
            head=DAFormerHeadConfig(in_channels=(32, 64, 160, 256),
                                    embed_dim=64, channels=64)),
        uda=UDAConfig(use_cyclegan_day_events=False),
        optim=OptimConfig(warmup_iters=10, max_iters=100),
        data=DataConfig(batch_size=2, crop_size=(64, 64)),
    )
    return replace(cfg, **overrides) if overrides else cfg


def micro_test_config(**overrides) -> RunConfig:
    """Smallest full-machinery config (mit_micro: 1 block/stage, 32x32
    crops) — for multi-process coordination tests where each worker must
    COMPILE the whole DACS step on the 1-core CPU sandbox."""
    cfg = tiny_test_config()
    cfg = replace(
        cfg, name="micro",
        model=replace(cfg.model, backbone="mit_micro",
                      head=DAFormerHeadConfig(
                          in_channels=(16, 32, 64, 128),
                          embed_dim=32, channels=32)),
        data=replace(cfg.data, batch_size=2, crop_size=(32, 32)))
    return replace(cfg, **overrides) if overrides else cfg
