"""Pallas ISR kernel vs the jnp reference implementation (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cmda_tpu.ops.isr import image_change_from_gray
from cmda_tpu.ops.pallas_kernels import pallas_batched_isr

PARAMS = dict(val_range=(0.01, 1.01), threshold=0.005, clip_range=0.1)


def test_pallas_isr_matches_jnp_interpret():
    g = np.random.default_rng(0)
    gray = (g.random((3, 64, 128)) * 255).astype(np.float32)
    dirs = jnp.asarray([0, 2, 3], jnp.int32)
    out = pallas_batched_isr(jnp.asarray(gray), dirs, shift_pixel=2,
                             interpret=True, **PARAMS)
    for i, d in enumerate([0, 2, 3]):
        ref = image_change_from_gray(
            jnp.asarray(gray[i]), shift_pixel=2, shift_direction=None,
            direction_idx=jnp.asarray(d), **PARAMS)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# fused upsample+CE kernel (ops/pallas_ce.py)
# ---------------------------------------------------------------------------
from cmda_tpu.ops.losses import weighted_cross_entropy
from cmda_tpu.ops.pallas_ce import fused_resize_ce, supported
from cmda_tpu.ops.resize import resize_bilinear


def _ce_case(seed=0, b=2, h=6, w=10, c=5, fh=4, fw=4, ignored=True):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
    lbl = g.integers(0, c, size=(b, h * fh, w * fw)).astype(np.int32)
    if ignored:
        lbl[0, :3, :5] = 255
    wgt = jnp.asarray(
        g.uniform(0.2, 1.5, size=(b, h * fh, w * fw)).astype(np.float32))
    return x, jnp.asarray(lbl), wgt


def _xla_ce(x, lbl, wgt):
    return weighted_cross_entropy(
        resize_bilinear(x, lbl.shape[1:3]), lbl, wgt)


@pytest.mark.parametrize("with_weight", [True, False])
def test_fused_resize_ce_values_and_grads(with_weight):
    x, lbl, wgt = _ce_case()
    wgt = wgt if with_weight else None
    ref = _xla_ce(x, lbl, wgt)
    out = fused_resize_ce(x, lbl, wgt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    gr = jax.grad(_xla_ce)(x, lbl, wgt)
    gk = jax.grad(lambda *a: fused_resize_ce(*a, interpret=True))(x, lbl, wgt)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-7, rtol=1e-4)


def test_fused_resize_ce_weight_grad():
    x, lbl, wgt = _ce_case(seed=1)
    gr = jax.grad(_xla_ce, argnums=2)(x, lbl, wgt)
    gk = jax.grad(lambda *a: fused_resize_ce(*a, interpret=True),
                  argnums=2)(x, lbl, wgt)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               atol=1e-7, rtol=1e-4)


def test_fused_resize_ce_nonsquare_factors():
    x, _, _ = _ce_case(seed=2)
    g = np.random.default_rng(3)
    lbl = jnp.asarray(g.integers(0, 5, size=(2, 12, 40)).astype(np.int32))
    ref = weighted_cross_entropy(resize_bilinear(x, (12, 40)), lbl, None)
    out = fused_resize_ce(x, lbl, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_resize_ce_all_ignored():
    x, lbl, wgt = _ce_case(seed=4)
    lbl = jnp.full_like(lbl, 255)
    out = fused_resize_ce(x, lbl, wgt, interpret=True)
    assert float(out) == 0.0
    gk = jax.grad(lambda *a: fused_resize_ce(*a, interpret=True))(x, lbl, wgt)
    assert float(jnp.max(jnp.abs(gk))) == 0.0


def test_supported_gate():
    x = jnp.zeros((2, 8, 128, 19))
    assert supported(x, jnp.zeros((2, 32, 512), jnp.int32))
    # not an integer factor
    assert not supported(x, jnp.zeros((2, 33, 512), jnp.int32))
    # same size (no upsample)
    assert not supported(x, jnp.zeros((2, 8, 128), jnp.int32))
    # lane-hostile coarse width
    assert not supported(jnp.zeros((2, 8, 100, 19)),
                         jnp.zeros((2, 32, 400), jnp.int32))


def test_multi_stream_loss_pallas_parity():
    """The uda.pallas_ce wiring == the checkpointed XLA path (auto-interpret
    on CPU), on the 4-stream flagship loss shape."""
    from cmda_tpu.uda.transforms import multi_stream_loss
    g = np.random.default_rng(5)
    b, h, w, c = 2, 8, 128, 6
    # h=8 passes the supported() gate (h % 8 == 0) — the pallas branch
    # must actually engage in this test
    from cmda_tpu.ops.pallas_ce import supported as _sup
    assert _sup(jnp.zeros((b, h, w, c)), jnp.zeros((b, h * 4, w * 4), jnp.int32))
    logits = {k: jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
              for k in ("image_output", "fusion_output", "events_output",
                        "img_self_res_output")}
    lbl = jnp.asarray(g.integers(0, c, size=(b, h * 4, w * 4)).astype(np.int32))
    wgt = jnp.asarray(
        g.uniform(0.0, 1.0, size=(b, h * 4, w * 4)).astype(np.float32))
    kw = dict(w_image=0.5, w_events=0.5, w_fusion=0.5, w_isr=0.25)

    def loss(lgts, use_pallas):
        return multi_stream_loss(lgts, lbl, wgt, pallas_ce=use_pallas, **kw)

    l_ref, logs_ref = loss(logits, False)
    l_pal, logs_pal = loss(logits, True)
    np.testing.assert_allclose(np.asarray(l_pal), np.asarray(l_ref),
                               rtol=1e-5)
    for k in logs_ref:
        np.testing.assert_allclose(np.asarray(logs_pal[k]),
                                   np.asarray(logs_ref[k]), rtol=1e-4,
                                   err_msg=k)
    g_ref = jax.grad(lambda l: loss(l, False)[0])(logits)
    g_pal = jax.grad(lambda l: loss(l, True)[0])(logits)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pal[k]), np.asarray(g_ref[k]),
                                   atol=1e-7, rtol=1e-4, err_msg=k)


def test_fused_resize_argmax_matches_xla():
    from cmda_tpu.ops.pallas_ce import fused_resize_argmax
    g = np.random.default_rng(7)
    b, h, w, c = 2, 8, 128, 7
    x = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
    out_size = (h * 4, w * 4)
    label, prob = fused_resize_argmax(x, out_size, interpret=True)
    big = resize_bilinear(x, out_size).astype(jnp.float32)
    sm = jax.nn.softmax(big, axis=-1)
    ref_label = jnp.argmax(sm, axis=-1).astype(jnp.int32)
    ref_prob = jnp.max(sm, axis=-1)
    agree = float(np.mean(np.asarray(label) == np.asarray(ref_label)))
    assert agree > 0.999, agree   # float-roundoff argmax ties only
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ref_prob),
                               atol=1e-5)
    lbl_only, none_prob = fused_resize_argmax(x, out_size, with_prob=False,
                                              interpret=True)
    assert none_prob is None
    np.testing.assert_array_equal(np.asarray(lbl_only), np.asarray(label))


def test_pseudo_label_and_weight_coarse_parity():
    from cmda_tpu.uda.transforms import (
        pseudo_label_and_weight, pseudo_label_and_weight_coarse)
    g = np.random.default_rng(8)
    b, h, w, c = 2, 8, 128, 19
    x = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
    out_size = (h * 4, w * 4)
    ref_l, ref_w = pseudo_label_and_weight(
        resize_bilinear(x, out_size), threshold=0.3, ignore_top=5,
        ignore_bottom=3)
    pal_l, pal_w = pseudo_label_and_weight_coarse(
        x, out_size, threshold=0.3, ignore_top=5, ignore_bottom=3,
        pallas_ce=True)
    assert float(np.mean(np.asarray(pal_l) == np.asarray(ref_l))) > 0.999
    np.testing.assert_allclose(np.asarray(pal_w), np.asarray(ref_w),
                               atol=1e-4)
