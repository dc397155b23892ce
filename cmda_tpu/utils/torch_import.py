"""torch -> JAX weight converters.

Imports the reference ecosystem's checkpoints into our flax trees:
  * ``convert_mit``: SegFormer ``mit_b5.pth`` (official NVlabs layout, the
    file loaded at reference mmseg/models/backbones/mix_transformer.py:339-357)
    -> MixVisionTransformer params.
  * ``convert_resnet_generator``: CycleGAN ``cityscapes_ICD_to_dsec_EN.pth``
    (torch nn.Sequential index layout, reference
    mmseg/models/cyclegan/cyclegan_model.py:316-375) -> ResnetGenerator params.
  * ``convert_fusion_checkpoint``: a trained reference ``iter_40000.pth``
    state_dict (student keys ``model.*`` / teacher ``ema_model.*``,
    prefix-stripping semantics of reference tools/test.py:165-169)
    -> FusionEncoderDecoder variables.

Tensors arrive as numpy arrays (pass ``torch.load(...,map_location='cpu')``
state dict through ``to_numpy``). Layout rules:
  Linear  [out,in]        -> kernel [in,out]
  Conv    [out,in,kh,kw]  -> kernel [kh,kw,in,out]
  Depthwise conv [C,1,k,k]-> kernel [k,k,1,C]
  ConvTranspose [in,out,k,k] -> our TorchConvTranspose kernel [k,k,out,in]
  LayerNorm/BN weight,bias -> scale,bias (+ running stats -> batch_stats)
"""
from __future__ import annotations

import re

import numpy as np


def to_numpy(state_dict):
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _lin(sd, key):
    w = sd[f"{key}.weight"].T
    if f"{key}.bias" in sd:
        return {"kernel": w, "bias": sd[f"{key}.bias"]}
    return {"kernel": w}


def _conv(sd, key):
    w = np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _ln(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_params(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_stats(sd, key):
    return {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}


# ---------------------------------------------------------------------------
# MiT backbone
# ---------------------------------------------------------------------------

def convert_mit(sd: dict, depths=(3, 6, 40, 3)) -> dict:
    """NVlabs MiT state_dict (numpy) -> our MixVisionTransformer params.

    Stage blocks are STACKED along a leading depth axis (our encoder scans
    one traced block per stage over stacked parameters)."""
    import jax

    p = {}
    for s in range(1, 5):
        p[f"patch_embed{s}"] = {
            "proj": _conv(sd, f"patch_embed{s}.proj"),
            "norm": _ln(sd, f"patch_embed{s}.norm"),
        }
        p[f"norm{s}"] = _ln(sd, f"norm{s}")
        blocks = [_convert_mit_block(sd, f"block{s}.{i}")
                  for i in range(depths[s - 1])]
        p[f"blocks{s}"] = jax.tree.map(lambda *xs: np.stack(xs), *blocks)
    return p


# ---------------------------------------------------------------------------
# CycleGAN ResnetGenerator
# ---------------------------------------------------------------------------

def convert_resnet_generator(sd: dict, n_blocks: int = 9,
                             norm: str = "instance") -> dict:
    """torch Sequential-index layout -> our named ResnetGenerator params.

    Instance-norm variant indices (9 blocks): 1 conv_in, 4/7 downs,
    10..(10+n-1) resblocks (conv_block.1, conv_block.5), then convT at
    10+n, 10+n+3, final conv at 10+n+6+... — computed below from the
    structural recipe rather than hardcoded."""
    idx = 0
    p = {}
    idx += 1  # ReflectionPad
    p["conv_in"] = _conv(sd, f"model.{idx}"); idx += 1
    has_norm_params = norm == "batch"
    stats = {}

    def norm_layer(name):
        nonlocal idx
        if has_norm_params:
            p[name] = _bn_params(sd, f"model.{idx}")
            stats[name] = _bn_stats(sd, f"model.{idx}")
        idx += 1

    norm_layer("bn_in"); idx += 1  # ReLU
    for i in range(2):
        p[f"down{i}"] = _conv(sd, f"model.{idx}"); idx += 1
        norm_layer(f"bn_down{i}"); idx += 1  # ReLU
    for i in range(n_blocks):
        base = f"model.{idx}.conv_block"
        blk = {}
        # conv_block: pad,1 conv,2 norm,3 relu,(dropout),pad,5 conv,6 norm
        sub = 1
        blk["conv1"] = _conv(sd, f"{base}.{sub}"); sub += 1
        if has_norm_params:
            blk["bn1"] = _bn_params(sd, f"{base}.{sub}")
            stats.setdefault(f"resblock{i}", {})["bn1"] = _bn_stats(sd, f"{base}.{sub}")
        sub += 2  # norm, relu
        sub += 1  # pad
        blk["conv2"] = _conv(sd, f"{base}.{sub}"); sub += 1
        if has_norm_params:
            blk["bn2"] = _bn_params(sd, f"{base}.{sub}")
            stats.setdefault(f"resblock{i}", {})["bn2"] = _bn_stats(sd, f"{base}.{sub}")
        p[f"resblock{i}"] = blk
        idx += 1
    for i in range(2):
        w = sd[f"model.{idx}.weight"]  # torch convT: [in, out, kh, kw]
        up = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # -> [k,k,out,in]
        if f"model.{idx}.bias" in sd:
            up["bias"] = sd[f"model.{idx}.bias"]
        p[f"up{i}"] = up
        idx += 1
        norm_layer(f"bn_up{i}"); idx += 1  # ReLU
    idx += 1  # ReflectionPad
    p["conv_out"] = _conv(sd, f"model.{idx}")
    if has_norm_params:
        return {"params": p, "batch_stats": stats}
    return {"params": p}


# ---------------------------------------------------------------------------
# DAFormer heads + full fusion checkpoints
# ---------------------------------------------------------------------------

def _convmodule(sd, key, with_stats):
    out = {"conv": _conv(sd, f"{key}.conv")}
    stats = {}
    if f"{key}.bn.weight" in sd:
        out["bn"] = _bn_params(sd, f"{key}.bn")
        stats["bn"] = _bn_stats(sd, f"{key}.bn")
    if with_stats:
        return out, stats
    return out


def convert_resnet_backbone(sd: dict, depths=(3, 4, 23, 3)) -> dict:
    """mmcv ResNetV1c checkpoint (``open-mmlab://resnetXX_v1c``, the
    ``pretrained`` source of the legacy exp-grid backbones, reference
    mmseg/models/backbones/resnet.py deep_stem layout: ``stem.{0,3,6}``
    convs + ``stem.{1,4,7}`` BNs, ``layer{s}.{i}.conv{k}/bn{k}`` blocks,
    ``downsample.{0,1}``) -> our ``ResNetV1c`` variables
    ({'params', 'batch_stats'})."""
    if "stem.0.weight" not in sd:
        raise KeyError("expected an mmcv V1c deep-stem checkpoint "
                       "(no stem.0.weight key)")
    params, stats = {}, {}
    for j, (c, b) in enumerate(((0, 1), (3, 4), (6, 7))):
        params[f"stem{j}"] = {"conv": _conv(sd, f"stem.{c}"),
                              "bn": _bn_params(sd, f"stem.{b}")}
        stats[f"stem{j}"] = {"bn": _bn_stats(sd, f"stem.{b}")}
    for s in range(4):
        for i in range(depths[s]):
            t = f"layer{s + 1}.{i}"
            p, st = {}, {}
            for k in (1, 2, 3):
                p[f"conv{k}"] = {"conv": _conv(sd, f"{t}.conv{k}"),
                                 "bn": _bn_params(sd, f"{t}.bn{k}")}
                st[f"conv{k}"] = {"bn": _bn_stats(sd, f"{t}.bn{k}")}
            if f"{t}.downsample.0.weight" in sd:
                p["downsample"] = {"conv": _conv(sd, f"{t}.downsample.0"),
                                   "bn": _bn_params(sd, f"{t}.downsample.1")}
                st["downsample"] = {"bn": _bn_stats(sd, f"{t}.downsample.1")}
            params[f"layer{s + 1}_{i}"] = p
            stats[f"layer{s + 1}_{i}"] = st
    return {"params": params, "batch_stats": stats}


def _sep_aspp(sd, prefix, dilations=(1, 6, 12, 18)):
    params, stats = {}, {}
    for i, d in enumerate(dilations):
        if d == 1:
            p, s = _convmodule(sd, f"{prefix}.aspp_modules.{i}", True)
            params[f"aspp{i}"], stats[f"aspp{i}"] = p, s
        else:
            dw, dws = _convmodule(sd, f"{prefix}.aspp_modules.{i}.depthwise_conv", True)
            pw, pws = _convmodule(sd, f"{prefix}.aspp_modules.{i}.pointwise_conv", True)
            params[f"aspp{i}"] = {"depthwise": dw, "pointwise": pw}
            stats[f"aspp{i}"] = {"depthwise": dws, "pointwise": pws}
    bt, bts = _convmodule(sd, f"{prefix}.bottleneck", True)
    params["bottleneck"], stats["bottleneck"] = bt, bts
    return params, stats


def convert_daformer_decoder(sd: dict, prefix: str, stream: str = "image"):
    """One DAFormer decoder (embeds + sepaspp fuse) -> our DAFormerDecoder."""
    params, stats = {}, {}
    for i in range(4):
        params[f"embed{i}"] = _lin(sd, f"{prefix}.embed_layers_{stream}.{i}.proj")
    fuse_p, fuse_s = _sep_aspp(sd, f"{prefix}.fuse_layer_{stream}")
    params["fuse"] = fuse_p
    stats["fuse"] = fuse_s
    return params, stats


def strip_prefix(sd: dict, prefixes=("module.", "model.")) -> dict:
    """Reference tools/test.py:165-169 prefix revision.

    Prefixes strip repeatedly: the real training artifact is saved from
    MMDataParallel(DACS), so student keys are DOUBLE-prefixed
    ``module.model.backbone_image...`` (mmcv applies its revise_keys list
    sequentially). ``ema_model.*`` / ``imnet_model.*`` / ``cyclegan_*``
    siblings match neither prefix and fall through untouched (ignored by
    the per-submodule subdict() extraction)."""
    out = {}
    for k, v in sd.items():
        changed = True
        while changed:
            changed = False
            for pre in prefixes:
                if k.startswith(pre):
                    k = k[len(pre):]
                    changed = True
                    break
        out[k] = v
    return out


def subdict(sd: dict, prefix: str) -> dict:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_attention_avg_fusion(sd: dict) -> dict:
    """AttentionAvgFusion: torch basic_block[2i]=image, [2i+1]=events."""
    p = {}
    for i in range(4):
        p[f"block_image{i}"] = _convert_mit_block(sd, f"basic_block.{2 * i}")
        p[f"block_events{i}"] = _convert_mit_block(sd, f"basic_block.{2 * i + 1}")
    return p


def convert_attention_fusion(sd: dict) -> dict:
    p = {}
    for i in range(4):
        p[f"block{i}"] = _convert_mit_block(sd, f"basic_block.{i}")
        p[f"mlp{i}"] = {
            "fc1": _lin(sd, f"linear_block.{i}.fc1"),
            "fc2": _lin(sd, f"linear_block.{i}.fc2"),
            "dwconv": {"dwconv": _conv(sd, f"linear_block.{i}.dwconv.dwconv")},
        }
    return p


def _convert_mit_block(sd, t):
    attn = {
        "q": _lin(sd, f"{t}.attn.q"),
        "kv": _lin(sd, f"{t}.attn.kv"),
        "proj": _lin(sd, f"{t}.attn.proj"),
    }
    if f"{t}.attn.sr.weight" in sd:
        attn["sr"] = _conv(sd, f"{t}.attn.sr")
        attn["sr_norm"] = _ln(sd, f"{t}.attn.norm")
    return {
        "norm1": _ln(sd, f"{t}.norm1"),
        "norm2": _ln(sd, f"{t}.norm2"),
        "attn": attn,
        "mlp": {
            "fc1": _lin(sd, f"{t}.mlp.fc1"),
            "fc2": _lin(sd, f"{t}.mlp.fc2"),
            "dwconv": {"dwconv": _conv(sd, f"{t}.mlp.dwconv.dwconv")},
        },
    }


def mmseg_mit_to_nvlabs(sd: dict) -> dict:
    """Inverse of the reference's ``mit_convert``
    (mmseg/models/utils/ckpt_convert.py:8-52): an mmseg-v0.16-layout MiT
    backbone state_dict (``layers.{s}.0.projection`` patch embeds, fused
    ``attn.attn.in_proj_*`` q‖kv projections, conv-shaped ``ffn.layers``
    MLPs) -> the NVlabs layout that ``convert_mit`` ingests. Covers
    checkpoints from the official-mmseg lineage without a second full
    converter."""
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] != "layers":
            out[k] = v
            continue
        s = int(parts[1]) + 1
        kind, rest = parts[2], parts[3:]
        if kind == "0":    # patch embed: projection -> proj
            key = ".".join(rest).replace("projection.", "proj.")
            out[f"patch_embed{s}.{key}"] = v
        elif kind == "2":  # stage norm
            out[f"norm{s}." + ".".join(rest)] = v
        else:              # transformer block
            i, rest = rest[0], rest[1:]
            t = f"block{s}.{i}"
            key = ".".join(rest)
            if key.startswith("attn.attn.in_proj_"):
                # rows are [q (dim); kv (2*dim)] (mit_convert's torch.cat)
                dim = v.shape[0] // 3
                leaf = key[len("attn.attn.in_proj_"):]  # weight | bias
                out[f"{t}.attn.q.{leaf}"] = v[:dim]
                out[f"{t}.attn.kv.{leaf}"] = v[dim:]
            elif key.startswith("attn.attn.out_proj."):
                out[f"{t}.attn.proj." + key[len("attn.attn.out_proj."):]] = v
            elif key.startswith("ffn.layers."):
                j, leaf = key[len("ffn.layers."):].split(".", 1)
                name = {"0": "fc1", "1": "dwconv.dwconv", "4": "fc2"}[j]
                if name in ("fc1", "fc2") and leaf == "weight":
                    v = v.reshape(v.shape[:2])  # (out,in,1,1) -> (out,in)
                out[f"{t}.mlp.{name}.{leaf}"] = v
            else:          # norm1/norm2/attn.sr/attn.norm pass through
                out[f"{t}.{key}"] = v
    return out


def convert_mit_mmseg(sd: dict, depths=(3, 6, 40, 3)) -> dict:
    """mmseg-v0.16-layout MiT backbone -> our stacked-scan flax params
    (the repo-side equivalent of the reference's ckpt_convert.mit_convert,
    pointed the useful direction)."""
    return convert_mit(mmseg_mit_to_nvlabs(sd), depths)


def convert_fusion_checkpoint(sd: dict, depths=(3, 6, 40, 3),
                              fusion: str = "attention_avg",
                              fusion_isr: str = "attention") -> dict:
    """Full reference FusionEncoderDecoder state_dict -> our variables.

    Expects student keys (run ``strip_prefix``/``subdict(sd, 'model.')``
    first for UDA-decorated checkpoints)."""
    sd = strip_prefix(sd)
    params = {
        "backbone_image": convert_mit(subdict(sd, "backbone_image."), depths),
        "backbone_events": convert_mit(subdict(sd, "backbone_events."), depths),
    }
    stats = {}
    if fusion == "attention_avg":
        params["fusion_module"] = convert_attention_avg_fusion(
            subdict(sd, "fusion_module."))
    elif fusion == "attention":
        params["fusion_module"] = convert_attention_fusion(
            subdict(sd, "fusion_module."))
    if fusion_isr and any(k.startswith("fusion_isr_module.") for k in sd):
        params["fusion_isr_module"] = convert_attention_fusion(
            subdict(sd, "fusion_isr_module."))
    head_p, head_s = convert_daformer_decoder(sd, "decode_head", "image")
    head = {"decoder_image": head_p,
            "cls": {"conv_seg": _conv(sd, "decode_head.conv_seg")}}
    params["decode_head"] = head
    stats["decode_head"] = {"decoder_image": head_s}
    return {"params": params, "batch_stats": stats}


def convert_daformer_head_single(sd: dict, prefix: str = "decode_head",
                                 n_scales: int = 4):
    """Single-stream DAFormerHead (reference daformer_head.py:136-197 module
    names: embed_layers.{i}.proj / fuse_layer / conv_seg) -> our
    {decoder: {embed{i}, fuse}, cls: {conv_seg}} (+ batch_stats)."""
    params, stats = {}, {}
    for i in range(n_scales):
        params[f"embed{i}"] = _lin(sd, f"{prefix}.embed_layers.{i}.proj")
    fuse_p, fuse_s = _sep_aspp(sd, f"{prefix}.fuse_layer")
    params["fuse"] = fuse_p
    stats["fuse"] = fuse_s
    head = {"decoder": params,
            "cls": {"conv_seg": _conv(sd, f"{prefix}.conv_seg")}}
    return head, {"decoder": stats}


def convert_encoder_decoder(sd: dict, depths=(3, 6, 40, 3)) -> dict:
    """Image-only mmseg EncoderDecoder (DAFormer/SegFormer) state_dict ->
    our EncoderDecoder variables (backbone + decode_head)."""
    sd = strip_prefix(sd)
    head_p, head_s = convert_daformer_head_single(sd)
    return {
        "params": {
            "backbone": convert_mit(subdict(sd, "backbone."), depths),
            "decode_head": head_p,
        },
        "batch_stats": {"decode_head": head_s},
    }


def merge_pretrained(variables: dict, updates: dict) -> dict:
    """Deep-merge converted torch weights into freshly-initialized flax
    variables, checking shapes (the structural guarantee the reference gets
    from load_state_dict; mismatches raise with the offending path)."""
    import jax
    from flax.core import unfreeze, freeze

    was_frozen = hasattr(variables, "unfreeze")
    out = unfreeze(variables) if was_frozen else jax.tree.map(
        lambda x: x, variables)

    def rec(dst, upd, path):
        for k, v in upd.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                if k not in dst or not isinstance(dst[k], dict):
                    raise KeyError(f"pretrained key {p} not in model tree "
                                   f"(have: {sorted(dst)})")
                rec(dst[k], v, p)
            else:
                if k not in dst:
                    raise KeyError(f"pretrained leaf {p} not in model tree "
                                   f"(have: {sorted(dst)})")
                if tuple(np.shape(dst[k])) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {p}: model "
                        f"{np.shape(dst[k])} vs checkpoint {np.shape(v)}")
                dst[k] = np.asarray(v).astype(np.asarray(dst[k]).dtype)

    rec(out, updates, "")
    return freeze(out) if was_frozen else out


def load_torch_file(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    elif isinstance(ckpt, dict) and "model" in ckpt and hasattr(
            next(iter(ckpt["model"].values()), None), "detach"):
        ckpt = ckpt["model"]
    return to_numpy(ckpt)
