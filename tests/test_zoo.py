"""Model-zoo coverage tests: legacy heads, ResNet backbones, early-fusion
segmentor, multi-scale flip inference, OHEM, BCE."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.models.heads import (
    HeadConfig, SegFormerHead, FCNHead, ASPPHead, PSPHead, UPerHead, DLV2Head,
    ISAHead, DAHead)
from cmda_tpu.models.resnet import ResNetV1c, RESNET_VARIANTS
from cmda_tpu.models.segmentor import (
    SegmentorConfig, EventsEncoderDecoder, multi_scale_flip_inference,
    EncoderDecoder)
from cmda_tpu.models.daformer import DAFormerHeadConfig
from cmda_tpu.ops.losses import weighted_binary_cross_entropy, ohem_weights

FEATS = [jnp.ones((1, 24, 24, 64)), jnp.ones((1, 12, 12, 128)),
         jnp.ones((1, 6, 6, 320)), jnp.ones((1, 3, 3, 512))]
HCFG = HeadConfig(channels=64)


@pytest.mark.parametrize("cls,kwargs,out_hw", [
    (SegFormerHead, {}, (24, 24)),
    (FCNHead, {}, (3, 3)),
    (ASPPHead, dict(dilations=(1, 6, 12), sep=True, c1_channels=48), (24, 24)),
    (ASPPHead, dict(dilations=(1, 6, 12)), (3, 3)),
    (PSPHead, {}, (3, 3)),
    (UPerHead, {}, (24, 24)),
    (DLV2Head, {}, (3, 3)),
    (ISAHead, dict(isa_channels=32, down_factor=(2, 2)), (3, 3)),
    (DAHead, dict(pam_channels=16), (3, 3)),
])
def test_legacy_heads(cls, kwargs, out_hw):
    head = cls(HCFG, **kwargs)
    variables = head.init(jax.random.PRNGKey(0), FEATS)
    out = head.apply(variables, FEATS)
    assert out.shape == (1,) + out_hw + (19,)


def test_resnet_backbones():
    x = jnp.zeros((1, 64, 64, 3))
    m = ResNetV1c(RESNET_VARIANTS["resnet50"])
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]
    m8 = ResNetV1c(RESNET_VARIANTS["resnet50_d8"])
    v8 = m8.init(jax.random.PRNGKey(0), x)
    outs8 = m8.apply(v8, x)
    # dilated: stages 3/4 keep stride 8
    assert outs8[2].shape[1:3] == (8, 8) and outs8[3].shape[1:3] == (8, 8)


def test_resnext_resnest_backbones():
    x = jnp.zeros((1, 64, 64, 3))
    for name in ("resnext50", "resnest50"):
        m = ResNetV1c(RESNET_VARIANTS[name])
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
            (1, 2, 2, 2048)], name
        assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_events_encoder_decoder_early_fusion():
    cfg = SegmentorConfig(
        backbone="mit_b0",
        head=DAFormerHeadConfig(in_channels=(32, 64, 160, 256),
                                embed_dim=64, channels=64))
    model = EventsEncoderDecoder(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    ev = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img, ev)
    out = model.apply(variables, img, ev)
    assert out.shape == (1, 64, 64, 19)


def test_multi_scale_flip_inference():
    cfg = SegmentorConfig(
        backbone="mit_b0",
        head=DAFormerHeadConfig(in_channels=(32, 64, 160, 256),
                                embed_dim=64, channels=64))
    model = EncoderDecoder(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)

    prob = multi_scale_flip_inference(
        lambda x: model.apply(variables, x), img,
        scales=(0.75, 1.0), flip=True)
    assert prob.shape == (1, 64, 64, 19)
    np.testing.assert_allclose(np.asarray(jnp.sum(prob, -1)), 1.0, atol=1e-4)


def test_bce_and_ohem():
    g = np.random.default_rng(0)
    logits = jnp.asarray(g.normal(size=(2, 16, 16, 2)).astype(np.float32))
    labels = jnp.asarray(g.integers(0, 2, size=(2, 16, 16)).astype(np.int32))
    loss = weighted_binary_cross_entropy(logits, labels)
    assert np.isfinite(float(loss))
    w = ohem_weights(logits, labels, thresh=0.7, min_kept=50)
    assert w.shape == (2, 16, 16)
    assert float(jnp.sum(w[0])) >= 50  # at least min_kept selected


def test_segformer_adapter_neck():
    """SegFormerAdapter (reference necks/segformer_adapter.py): stage-3
    upsampled 4x replaces the last feature; earlier slots pass through;
    parameter-free; and the sfa_ grid combo trains through it."""
    from cmda_tpu.models.heads import SegFormerAdapter

    neck = SegFormerAdapter()
    feats = [jnp.ones((1, 16 // (2 ** i), 16 // (2 ** i), 8 * (i + 1)))
             for i in range(4)]
    variables = neck.init(jax.random.PRNGKey(0), feats)
    assert not variables.get("params")  # parameter-free
    out = neck.apply(variables, feats)
    assert out[-1].shape == (1, 8, 8, 32)   # 2x2 stage-3 upsampled 4x
    assert out[0] is feats[0] and out[1] is feats[1]

    # multi-layer variant: concat of two upsampled stages
    neck2 = SegFormerAdapter(out_layers=(2, 3), scales=(2, 4))
    out2 = neck2.apply({}, feats)
    assert out2[-1].shape == (1, 8, 8, 24 + 32)

    # the grid entry end-to-end (2 supervised iterations) — the grid now
    # yields (name, zero-arg builder) pairs; the sfa_ builder wires the
    # adapter neck internally (_legacy_model_builder)
    from tools.run_experiments import (legacy_architecture_grid,
                                       supervised_smoke)
    name, builder = next(
        c for c in legacy_architecture_grid() if c[0].startswith("sfa_"))
    loss = supervised_smoke(name, builder, iters=2, hw=32)
    assert np.isfinite(loss)
