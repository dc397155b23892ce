"""End-to-end pretrained-import parity: a full torch MiT backbone + DAFormer
head assembled from the published recipe (NVlabs mix_transformer.py layout,
daformer_head.py module names), converted with cmda_tpu.utils.torch_import,
must produce matching logits through our EncoderDecoder — including
slide_inference — and a synthesized reference FusionEncoderDecoder
state_dict must load structurally into a DACSTrainer state.

This is the BASELINE config-1 harness (reference tools/test.py:165-169 +
encoder_decoder.py:175-218) runnable without the real .pth files.
"""
import json

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cmda_tpu.models.mit import MixVisionTransformer, MiTConfig
from cmda_tpu.models.segmentor import (
    SegmentorConfig, EncoderDecoder, slide_inference)
from cmda_tpu.models.daformer import DAFormerHeadConfig
from cmda_tpu.utils.torch_import import (
    to_numpy, convert_mit, convert_encoder_decoder, convert_fusion_checkpoint,
    merge_pretrained, strip_prefix)
from tests.test_torch_parity import TorchSRABlock

torch.manual_seed(0)

DIMS = (32, 64, 160, 256)       # mit_b0
HEADS = (1, 2, 5, 8)
DEPTHS = (2, 2, 2, 2)
SRS = (8, 4, 2, 1)


class TorchMiT(nn.Module):
    """NVlabs-layout 4-stage MiT (mix_transformer.py:186-551 recipe)."""

    def __init__(self, in_ch=3, dims=DIMS, heads=HEADS, depths=DEPTHS,
                 srs=SRS):
        super().__init__()
        self.depths = depths
        for s in range(4):
            pe = nn.Module()
            pe.proj = nn.Conv2d(in_ch if s == 0 else dims[s - 1], dims[s],
                                7 if s == 0 else 3, 4 if s == 0 else 2,
                                3 if s == 0 else 1)
            pe.norm = nn.LayerNorm(dims[s], eps=1e-6)
            setattr(self, f"patch_embed{s + 1}", pe)
            setattr(self, f"block{s + 1}", nn.ModuleList(
                [TorchSRABlock(dims[s], heads[s], srs[s])
                 for _ in range(depths[s])]))
            setattr(self, f"norm{s + 1}", nn.LayerNorm(dims[s], eps=1e-6))

    def forward(self, x):
        outs = []
        for s in range(4):
            pe = getattr(self, f"patch_embed{s + 1}")
            x = pe.proj(x)
            B, C, H, W = x.shape
            x = pe.norm(x.flatten(2).transpose(1, 2))
            for blk in getattr(self, f"block{s + 1}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{s + 1}")(x)
            x = x.transpose(1, 2).reshape(B, C, H, W)
            outs.append(x)
        return outs


class TorchConvModule(nn.Module):
    """mmcv ConvModule: conv(no bias) + BN + ReLU."""

    def __init__(self, cin, cout, k, dilation=1, groups=1):
        super().__init__()
        pad = dilation * (k // 2)
        self.conv = nn.Conv2d(cin, cout, k, padding=pad, dilation=dilation,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)
        # randomize running stats so eval-mode BN is a real check
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.05)
            self.bn.running_var.uniform_(0.8, 1.2)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchSepConvModule(nn.Module):
    def __init__(self, cin, cout, k, dilation):
        super().__init__()
        self.depthwise_conv = TorchConvModule(cin, cin, k, dilation, groups=cin)
        self.pointwise_conv = TorchConvModule(cin, cout, 1)

    def forward(self, x):
        return self.pointwise_conv(self.depthwise_conv(x))


class TorchDAFormerHead(nn.Module):
    """daformer_head.py:136-197 with the sepASPP fuse layer
    (ASPPWrapper sep=True, dilations (1,6,12,18), pool=False)."""

    def __init__(self, in_channels=DIMS, embed_dim=64, channels=64,
                 num_classes=19, dilations=(1, 6, 12, 18)):
        super().__init__()
        self.embed_layers = nn.ModuleDict({
            str(i): nn.Module() for i in range(4)})
        for i in range(4):
            self.embed_layers[str(i)].proj = nn.Linear(in_channels[i],
                                                       embed_dim)
        fuse = nn.Module()
        fuse.aspp_modules = nn.ModuleList()
        cin = embed_dim * 4
        for d in dilations:
            if d == 1:
                fuse.aspp_modules.append(TorchConvModule(cin, channels, 1))
            else:
                fuse.aspp_modules.append(
                    TorchSepConvModule(cin, channels, 3, d))
        fuse.bottleneck = TorchConvModule(channels * len(dilations),
                                          channels, 3)
        self.fuse_layer = fuse
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, feats):
        os_size = feats[0].shape[2:]
        outs = []
        for i, f in enumerate(feats):
            B, C, H, W = f.shape
            e = self.embed_layers[str(i)].proj(
                f.flatten(2).transpose(1, 2))
            e = e.transpose(1, 2).reshape(B, -1, H, W)
            if e.shape[2:] != os_size:
                e = F.interpolate(e, size=os_size, mode="bilinear",
                                  align_corners=False)
            outs.append(e)
        x = torch.cat(outs, dim=1)
        branches = [m(x) for m in self.fuse_layer.aspp_modules]
        x = self.fuse_layer.bottleneck(torch.cat(branches, dim=1))
        return self.conv_seg(x)


class TorchEncoderDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchMiT()
        self.decode_head = TorchDAFormerHead()

    def forward(self, x):
        logits = self.decode_head(self.backbone(x))
        return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def our_cfg():
    return SegmentorConfig(
        backbone="mit_b0", drop_path_rate=0.0,
        head=DAFormerHeadConfig(in_channels=DIMS, embed_dim=64, channels=64))


@pytest.fixture(scope="module")
def torch_model():
    return TorchEncoderDecoder().eval()


@pytest.fixture(scope="module")
def our_variables(torch_model):
    sd = to_numpy(torch_model.state_dict())
    return convert_encoder_decoder(sd, depths=DEPTHS)


def test_full_backbone_parity(torch_model, our_variables):
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        oracle = [f.permute(0, 2, 3, 1).numpy()
                  for f in torch_model.backbone(x)]
    mit = MixVisionTransformer(
        MiTConfig(embed_dims=DIMS, num_heads=HEADS, depths=DEPTHS,
                  sr_ratios=SRS, drop_path_rate=0.0))
    ours = mit.apply({"params": our_variables["params"]["backbone"]},
                     jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    for o, t in zip(ours, oracle):
        np.testing.assert_allclose(np.asarray(o), t, atol=2e-4)


def test_encoder_decoder_logit_parity(torch_model, our_variables):
    """BASELINE config 1: whole-image logits must match mmseg's ≤1e-3."""
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        oracle = torch_model(x).permute(0, 2, 3, 1).numpy()
    model = EncoderDecoder(our_cfg())
    ours = model.apply(our_variables, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=1e-3)


def test_slide_inference_parity(torch_model, our_variables):
    """Our one-XLA-program slide == the reference crop-accumulate loop
    (encoder_decoder.py:175-218) through the same converted weights."""
    x = torch.randn(1, 3, 96, 96)
    h_crop = w_crop = 64
    h_stride = w_stride = 32
    with torch.no_grad():
        _, _, h, w = x.shape
        preds = torch.zeros((1, 19, h, w))
        count = torch.zeros((1, 1, h, w))
        h_grids = max(h - h_crop + h_stride - 1, 0) // h_stride + 1
        w_grids = max(w - w_crop + w_stride - 1, 0) // w_stride + 1
        for hi in range(h_grids):
            for wi in range(w_grids):
                y1 = min(hi * h_stride, h - h_crop)
                x1 = min(wi * w_stride, w - w_crop)
                crop = x[:, :, y1:y1 + h_crop, x1:x1 + w_crop]
                logit = torch_model(crop)
                preds[:, :, y1:y1 + h_crop, x1:x1 + w_crop] += logit
                count[:, :, y1:y1 + h_crop, x1:x1 + w_crop] += 1
        oracle = (preds / count).permute(0, 2, 3, 1).numpy()

    model = EncoderDecoder(our_cfg())

    def apply_fn(crop):
        return model.apply(our_variables, crop)

    ours = slide_inference(apply_fn, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()), crop_size=(64, 64), stride=(32, 32),
        num_classes=19)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-3)


def test_fusion_checkpoint_structural_load():
    """A UDA-decorated reference checkpoint (model.* keys + ema_model noise)
    must convert and merge into a DACSTrainer state without key or shape
    mismatch, and run inference (VERDICT r1 item 1)."""
    from cmda_tpu.config import tiny_test_config, replace
    from cmda_tpu.uda.dacs import DACSTrainer

    # synthesize the reference layout from the torch oracles
    sd = {}
    for name in ("backbone_image", "backbone_events"):
        for k, v in TorchMiT().state_dict().items():
            sd[f"model.{name}.{k}"] = v
    for i in range(4):   # AttentionAvgFusion: basic_block[2i]=img, [2i+1]=ev
        for j, stream in enumerate(("image", "events")):
            blk = TorchSRABlock(DIMS[i], 1, 1)
            for k, v in blk.state_dict().items():
                sd[f"model.fusion_module.basic_block.{2 * i + j}.{k}"] = v
    head = TorchDAFormerHead()
    for k, v in head.state_dict().items():
        if k.startswith("embed_layers."):
            k = k.replace("embed_layers.", "embed_layers_image.")
        elif k.startswith("fuse_layer."):
            k = k.replace("fuse_layer.", "fuse_layer_image.")
        sd[f"model.decode_head.{k}"] = v
    sd["ema_model.backbone_image.patch_embed1.proj.weight"] = \
        torch.zeros(1)  # decorated checkpoints carry teacher keys; ignored

    cfg = tiny_test_config()
    cfg = replace(cfg, model=replace(
        cfg.model, fusion="attention_avg", fusion_isr="",
        head=DAFormerHeadConfig(in_channels=DIMS, embed_dim=64, channels=64)))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))

    conv = convert_fusion_checkpoint(to_numpy(sd), depths=DEPTHS,
                                     fusion="attention_avg", fusion_isr="")
    params = merge_pretrained(state.params, conv["params"])
    bstats = merge_pretrained(state.batch_stats, conv["batch_stats"])
    state = state.replace(params=params, batch_stats=bstats)

    x = jnp.zeros((1, 64, 64, 3))
    out = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, x, None, mode="default", output="fusion")
    assert out.shape == (1, 64, 64, 19)
    assert np.all(np.isfinite(np.asarray(out)))


def test_merge_pretrained_shape_mismatch_raises():
    from cmda_tpu.utils.torch_import import merge_pretrained
    variables = {"a": {"kernel": np.zeros((3, 4))}}
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_pretrained(variables, {"a": {"kernel": np.zeros((4, 3))}})
    with pytest.raises(KeyError, match="not in model tree"):
        merge_pretrained(variables, {"b": {"kernel": np.zeros((3, 4))}})


# ---------------------------------------------------------------------------
# ResNetV1c backbone import (open-mmlab://resnetXX_v1c layout)
# ---------------------------------------------------------------------------

class TorchResNetV1c(nn.Module):
    """mmcv ResNetV1c oracle, tiny depths, deep stem + pytorch-style
    bottlenecks (stride on conv2) — the checkpoint layout of
    open-mmlab://resnet101_v1c (reference mmseg/models/backbones/resnet.py)."""

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride=1, dilation=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=dilation, dilation=dilation,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = None
            if stride != 1 or cin != planes * 4:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes * 4))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            return F.relu(self.bn3(self.conv3(y)) + idt)

    def __init__(self, depths=(1, 1, 1, 1)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(),
            nn.Conv2d(32, 32, 3, padding=1, bias=False),
            nn.BatchNorm2d(32), nn.ReLU(),
            nn.Conv2d(32, 64, 3, padding=1, bias=False),
            nn.BatchNorm2d(64), nn.ReLU())
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
        cin, planes = 64, 64
        for s in range(4):
            blocks = []
            for i in range(depths[s]):
                blocks.append(self.Bottleneck(
                    cin, planes, stride=strides[s] if i == 0 else 1,
                    dilation=dils[s]))
                cin = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
            planes *= 2

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


def test_resnet_backbone_import_parity():
    """convert_resnet_backbone: converted mmcv V1c weights reproduce the
    torch forward (d8 dilated variant) to fp32 tolerance."""
    from cmda_tpu.models.resnet import ResNetV1c, ResNetConfig
    from cmda_tpu.utils.torch_import import convert_resnet_backbone

    depths = (1, 1, 1, 1)
    tm = TorchResNetV1c(depths).eval()
    # randomize BN stats so the test is sensitive to stats mapping
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.1)
                m.bias.normal_(0, 0.1)
    conv = convert_resnet_backbone(to_numpy(tm.state_dict()), depths)

    ours = ResNetV1c(ResNetConfig(depths=depths, strides=(1, 2, 1, 1),
                                  dilations=(1, 1, 2, 4)))
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # structural match against a fresh init (same key sets and shapes)
    flat_a = jax.tree_util.tree_leaves_with_path(init["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(conv["params"])
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    assert all(a.shape == b.shape for (_, a), (_, b) in zip(flat_a, flat_b))

    got = ours.apply({"params": conv["params"],
                      "batch_stats": conv["batch_stats"]},
                     jnp.asarray(x), train=False)
    want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), w.detach().permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4)


def test_cyclegan_checkpoint_keeps_model_prefix(tmp_path):
    """The generator's own Sequential is named ``model.*`` — a blanket
    model.-strip (tools/test.py-style) breaks the converter (r3 CLI bug):
    only a DataParallel ``module.`` wrapper may be stripped."""
    from tests.test_torch_parity import TorchResnetGenerator
    from cmda_tpu.utils import torch_import as TI
    gen = TorchResnetGenerator(ngf=4, n_blocks=1)
    p = tmp_path / "cg.pth"
    torch.save(gen.state_dict(), p)
    sd = TI.strip_prefix(TI.load_torch_file(str(p)), prefixes=("module.",))
    out = TI.convert_resnet_generator(sd, n_blocks=1, norm="instance")
    assert "params" in out and "conv_in" in out["params"]
    # wrapped variant also works
    wrapped = {f"module.{k}": v for k, v in gen.state_dict().items()}
    sd2 = TI.strip_prefix(TI.to_numpy(wrapped), prefixes=("module.",))
    out2 = TI.convert_resnet_generator(sd2, n_blocks=1, norm="instance")
    assert "params" in out2


# ---------------------------------------------------------------------------
# b5-shaped reference-artifact rehearsal (VERDICT r1 item 7)
# ---------------------------------------------------------------------------

def _dump(module, prefix, sd):
    for k, v in module.state_dict().items():
        sd[f"{prefix}{k}"] = v


def test_b5_reference_checkpoint_rehearsal(tmp_path, monkeypatch, capsys):
    """Synthesize the FULL reference iter_40000.pth layout — b5 dims,
    MMDataParallel double prefix (module.model.*), ema_model.* /
    imnet_model.* / cyclegan_itrd2en.* siblings, fusion + fusion_isr
    modules, shared-decoder head aliases — and drive the exact code path
    that touches the real artifact: tools/test.py --torch-checkpoint
    end-to-end (reference tools/test.py:165-169, function.py:29-38).

    Asserts: structural load at b5 scale, STUDENT (not teacher) weights
    land in params, alias/sibling keys are ignored, and fusion-stream
    evaluation runs."""
    import sys
    from tests.test_torch_parity import TorchSRABlock
    from cmda_tpu.utils import torch_import as TI

    B5_DIMS, B5_DEPTHS = (64, 128, 320, 512), (3, 6, 40, 3)
    torch.manual_seed(0)
    sd = {}
    mit_img = TorchMiT(dims=B5_DIMS, depths=B5_DEPTHS)
    _dump(mit_img, "module.model.backbone_image.", sd)
    _dump(TorchMiT(dims=B5_DIMS, depths=B5_DEPTHS),
          "module.model.backbone_events.", sd)
    for i in range(4):   # AttentionAvgFusion: [2i]=image, [2i+1]=events
        for j in range(2):
            _dump(TorchSRABlock(B5_DIMS[i], 1, SRS[i]),
                  f"module.model.fusion_module.basic_block.{2 * i + j}.", sd)
    for i in range(4):   # AttentionFusion (ISR): Block(2C) + Mlp(2C->C)
        c = B5_DIMS[i]
        _dump(TorchSRABlock(2 * c, 1, SRS[i]),
              f"module.model.fusion_isr_module.basic_block.{i}.", sd)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(2 * c, c)
        mlp.dwconv = nn.Module()
        mlp.dwconv.dwconv = nn.Conv2d(c, c, 3, 1, 1, groups=c)
        mlp.fc2 = nn.Linear(c, c)
        _dump(mlp, f"module.model.fusion_isr_module.linear_block.{i}.", sd)
    head = TorchDAFormerHead(in_channels=B5_DIMS, embed_dim=256,
                             channels=256)
    for k, v in head.state_dict().items():
        k2 = k.replace("embed_layers.", "embed_layers_image.").replace(
            "fuse_layer.", "fuse_layer_image.")
        sd[f"module.model.decode_head.{k2}"] = v
        if k2 != k or k.startswith("conv_seg"):
            # share_decoder='full' ties events/fusion decoders to the image
            # decoder (reference daformer_head.py:251-258) — the checkpoint
            # carries the tied params under every alias name
            alias = k.replace("embed_layers.", "embed_layers_events.").replace(
                "fuse_layer.", "fuse_layer_events.")
            sd[f"module.model.decode_head.{alias}"] = v
    # teacher siblings: full copy, ALL-ZERO values — if the loader ever
    # read teacher keys into student params the probe below would be zero
    for k in [k for k in sd if k.startswith("module.model.")]:
        sd["module.ema_model." + k[len("module.model."):]] = \
            torch.zeros_like(sd[k])
    # frozen-net siblings (present in the real artifact, must be ignored)
    sd["module.imnet_model.backbone.conv1.weight"] = torch.zeros(8, 3, 3, 3)
    sd["module.cyclegan_itrd2en.model.1.weight"] = torch.zeros(8, 1, 7, 7)

    path = tmp_path / "iter_40000.pth"
    torch.save({"meta": {"CLASSES": ("road",), "mmseg_version": "0.16"},
                "state_dict": sd, "optimizer": {}}, path)

    # -- the conversion itself: student-vs-teacher separation ----------
    conv = TI.convert_fusion_checkpoint(
        TI.load_torch_file(str(path)), depths=B5_DEPTHS,
        fusion="attention_avg", fusion_isr="attention")
    got = conv["params"]["backbone_image"]["patch_embed1"]["proj"]["kernel"]
    want = mit_img.state_dict()["patch_embed1.proj.weight"].numpy()
    np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0), atol=1e-6)
    assert np.abs(got).sum() > 0          # i.e. NOT the zeroed teacher
    assert "fusion_isr_module" in conv["params"]

    # -- end-to-end: the real artifact circuit through tools/test.py ---
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--config", "cs2dsec", "--synthetic",
        "--torch-checkpoint", str(path), "--max-samples", "2",
        "--set", "data.crop_size=128,128"])
    from tools.test import main
    main()
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "mIoU" in summary and np.isfinite(summary["mIoU"])


def _nvlabs_synth_sd(dims=(8, 16, 24, 32), depths=(2, 1, 1, 2),
                     srs=(8, 4, 2, 1), seed=0):
    """Random NVlabs-layout MiT backbone state_dict (numpy)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def add(key, *shape):
        sd[key] = rng.randn(*shape).astype(np.float32)

    for s in range(1, 5):
        d = dims[s - 1]
        cin = 3 if s == 1 else dims[s - 2]
        k = 7 if s == 1 else 3
        add(f"patch_embed{s}.proj.weight", d, cin, k, k)
        add(f"patch_embed{s}.proj.bias", d)
        add(f"patch_embed{s}.norm.weight", d)
        add(f"patch_embed{s}.norm.bias", d)
        add(f"norm{s}.weight", d)
        add(f"norm{s}.bias", d)
        for i in range(depths[s - 1]):
            t = f"block{s}.{i}"
            for n in ("norm1", "norm2"):
                add(f"{t}.{n}.weight", d)
                add(f"{t}.{n}.bias", d)
            add(f"{t}.attn.q.weight", d, d)
            add(f"{t}.attn.q.bias", d)
            add(f"{t}.attn.kv.weight", 2 * d, d)
            add(f"{t}.attn.kv.bias", 2 * d)
            add(f"{t}.attn.proj.weight", d, d)
            add(f"{t}.attn.proj.bias", d)
            if srs[s - 1] > 1:
                add(f"{t}.attn.sr.weight", d, d, srs[s - 1], srs[s - 1])
                add(f"{t}.attn.sr.bias", d)
                add(f"{t}.attn.norm.weight", d)
                add(f"{t}.attn.norm.bias", d)
            h = d * 4
            add(f"{t}.mlp.fc1.weight", h, d)
            add(f"{t}.mlp.fc1.bias", h)
            add(f"{t}.mlp.dwconv.dwconv.weight", h, 1, 3, 3)
            add(f"{t}.mlp.dwconv.dwconv.bias", h)
            add(f"{t}.mlp.fc2.weight", d, h)
            add(f"{t}.mlp.fc2.bias", d)
    return sd


def _mit_convert_oracle(sd):
    """The reference's ckpt_convert.mit_convert key transformation
    (mmseg/models/utils/ckpt_convert.py:8-52), numpy re-derivation: maps an
    NVlabs MiT state_dict to the mmseg-v0.16 layout."""
    out = {}
    for k, v in sd.items():
        if k.startswith("head"):
            continue
        if k.startswith("patch_embed"):
            s = int(k.split(".")[0][len("patch_embed"):])
            nk = k.replace(f"patch_embed{s}", f"layers.{s-1}.0")
            out[nk.replace("proj.", "projection.")] = v
        elif k.startswith("block"):
            s = int(k.split(".")[0][len("block"):])
            nk = k.replace(f"block{s}", f"layers.{s-1}.1")
            if "attn.q." in nk:
                kv = sd[k.replace("q.", "kv.")]
                out[nk.replace("q.", "attn.in_proj_")] = np.concatenate(
                    [v, kv], axis=0)
            elif "attn.kv." in nk:
                continue
            elif "attn.proj." in nk:
                out[nk.replace("proj.", "attn.out_proj.")] = v
            elif "mlp." in nk:
                nk = nk.replace("mlp.", "ffn.layers.")
                if "fc1.weight" in nk or "fc2.weight" in nk:
                    v = v.reshape((*v.shape, 1, 1))
                nk = nk.replace("fc1.", "0.").replace(
                    "dwconv.dwconv.", "1.").replace("fc2.", "4.")
                out[nk] = v
            else:
                out[nk] = v
        elif k.startswith("norm"):
            s = int(k.split(".")[0][len("norm"):])
            out[k.replace(f"norm{s}", f"layers.{s-1}.2")] = v
        else:
            out[k] = v
    return out


def test_mmseg_layout_mit_import_matches_nvlabs():
    # official-mmseg-lineage checkpoints (reference ckpt_convert.mit_convert
    # output layout) must convert to the identical flax param tree as the
    # NVlabs original they were derived from
    from cmda_tpu.utils.torch_import import convert_mit_mmseg
    depths = (2, 1, 1, 2)
    nv = _nvlabs_synth_sd(depths=depths)
    mm = _mit_convert_oracle(nv)
    assert not any(k.startswith(("block", "patch_embed")) for k in mm)
    ours_nv = convert_mit(nv, depths)
    ours_mm = convert_mit_mmseg(mm, depths)
    la, lb = jax.tree.leaves(ours_nv), jax.tree.leaves(ours_mm)
    assert len(la) == len(lb)
    assert jax.tree.structure(ours_nv) == jax.tree.structure(ours_mm)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(a, b)
