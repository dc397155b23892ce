"""Model-layer tests: shapes, modes, parameter counts, train-mode apply."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.models.mit import MixVisionTransformer, MIT_VARIANTS
from cmda_tpu.models.daformer import DAFormerHead, DAFormerHeadConfig
from cmda_tpu.models.fusion import (
    AttentionAvgFusion, AttentionFusion, AverageFusion, ConcatenateFusion,
    ConvertAvgFusion, FeaturesSplit,
)
from cmda_tpu.models.segmentor import (
    SegmentorConfig, EncoderDecoder, FusionEncoderDecoder, slide_inference,
)


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


B0_CFG = SegmentorConfig(
    backbone="mit_b0",
    head=DAFormerHeadConfig(in_channels=(32, 64, 160, 256), embed_dim=64,
                            channels=64))


def test_mit_b0_stage_shapes():
    model = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    dims = MIT_VARIANTS["mit_b0"].embed_dims
    assert [o.shape for o in outs] == [
        (1, 16, 16, dims[0]), (1, 8, 8, dims[1]),
        (1, 4, 4, dims[2]), (1, 2, 2, dims[3])]


def test_mit_b5_param_count():
    """MiT-b5 is ~81.4M params (BASELINE.md model-size row)."""
    model = MixVisionTransformer(MIT_VARIANTS["mit_b5"])
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    n = count_params(variables["params"])
    assert 80e6 < n < 83e6, n


def test_daformer_head_shapes():
    cfg = DAFormerHeadConfig(in_channels=(32, 64, 160, 256), embed_dim=64,
                             channels=64)
    head = DAFormerHead(cfg)
    feats = [jnp.zeros((2, 16, 16, 32)), jnp.zeros((2, 8, 8, 64)),
             jnp.zeros((2, 4, 4, 160)), jnp.zeros((2, 2, 2, 256))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    assert out.shape == (2, 16, 16, 19)


FEATS = [jnp.ones((2, 16, 16, 64)), jnp.ones((2, 8, 8, 128)),
         jnp.ones((2, 4, 4, 320)), jnp.ones((2, 2, 2, 512))]


@pytest.mark.parametrize("cls", [AttentionAvgFusion, AttentionFusion,
                                 AverageFusion, ConcatenateFusion,
                                 ConvertAvgFusion])
def test_fusion_modules_preserve_shapes(cls):
    mod = cls()
    variables = mod.init(jax.random.PRNGKey(0), FEATS, FEATS)
    outs = mod.apply(variables, FEATS, FEATS)
    assert [o.shape for o in outs] == [f.shape for f in FEATS]


def test_features_split():
    mod = FeaturesSplit()
    variables = mod.init(jax.random.PRNGKey(0), FEATS)
    outs = mod.apply(variables, FEATS)
    assert [o.shape for o in outs] == [f.shape for f in FEATS]


def test_fusion_encoder_decoder_modes():
    model = FusionEncoderDecoder(B0_CFG)
    img = jnp.zeros((1, 64, 64, 3))
    ev = jnp.zeros((1, 64, 64, 3))
    isr = jnp.zeros((1, 64, 64, 3))
    # init must trace 'fusion_all' so both fusion modules create params
    variables = model.init(jax.random.PRNGKey(0), img, ev, isr,
                           mode="fusion_all", method=model.forward_logits)
    for mode in ["default", "fusion_isr", "fusion_all", "no_fusion"]:
        out = model.apply(variables, img, ev, isr, mode=mode,
                          method=model.forward_logits)
        assert out["image_output"].shape == (1, 64, 64, 19)
        assert out["events_output"].shape == (1, 64, 64, 19)
        assert out["img_self_res_output"].shape == (1, 64, 64, 19)
        if mode == "no_fusion":
            assert out["fusion_output"] is None
        else:
            assert out["fusion_output"].shape == (1, 64, 64, 19)


def test_fusion_encoder_decoder_train_mode():
    """Train-mode apply: droppath/dropout rngs + mutable batch_stats."""
    model = FusionEncoderDecoder(B0_CFG)
    img = jnp.zeros((2, 64, 64, 3))
    ev = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img, ev, None,
                           method=model.forward_logits)
    (logits, feats), updates = model.apply(
        variables, img, ev, None, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1),
              "droppath": jax.random.PRNGKey(2)},
        method=model.forward_train)
    assert logits["fusion_output"].shape == (2, 16, 16, 19)
    assert "batch_stats" in updates
    # shared decoder: one decoder + one classifier in the head
    head_params = variables["params"]["decode_head"]
    assert "decoder_image" in head_params and "decoder_events" not in head_params


def test_encoder_decoder_and_slide():
    model = EncoderDecoder(B0_CFG)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.shape == (1, 64, 64, 19)

    def crop_fn(crop):
        return model.apply(variables, crop)

    full = jax.random.normal(jax.random.PRNGKey(1), (1, 96, 96, 3))
    pred = slide_inference(crop_fn, full, crop_size=(64, 64), stride=(32, 32),
                           num_classes=19)
    assert pred.shape == (1, 96, 96, 19)
    assert bool(jnp.all(jnp.isfinite(pred)))
    # HBM-bounded chunking (crop_chunk) is numerically identical to the
    # single [G*B] forward (eval BN uses running stats, so batch
    # composition cannot change values)
    chunked = slide_inference(crop_fn, full, crop_size=(64, 64),
                              stride=(32, 32), num_classes=19, crop_chunk=2)
    assert bool(jnp.allclose(pred, chunked, atol=1e-5))


def test_mit_split_transpose_grad_parity():
    """scan _split_transpose (model.scan_split_transpose perf lever) is an
    implementation detail of the scan backward — values and grads must be
    identical to the default scan."""
    m0 = MixVisionTransformer(MIT_VARIANTS["mit_b0"], remat=True)
    m1 = MixVisionTransformer(MIT_VARIANTS["mit_b0"], remat=True,
                              split_transpose=True)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m, p):
        outs = m.apply({"params": p}, x)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g0, g1)


def test_mit_unroll_short_grad_parity():
    """scan unroll of the short stages (model.scan_unroll_short perf lever,
    VERDICT r4 item 6: the grad-stacking DUS bucket) is an implementation
    detail of the scan loop — param tree, values, and grads must be
    identical to the default scan (stacked layout preserved)."""
    m0 = MixVisionTransformer(MIT_VARIANTS["mit_b0"], remat=True)
    m1 = MixVisionTransformer(MIT_VARIANTS["mit_b0"], remat=True,
                              unroll_short=True)
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(1, 32, 32, 3)).astype(np.float32))
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    params1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree.structure(params) == jax.tree.structure(params1)
            and all(a.shape == b.shape for a, b in
                    zip(jax.tree.leaves(params), jax.tree.leaves(params1))))

    def loss(m, p):
        outs = m.apply({"params": p}, x)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g0, g1)
