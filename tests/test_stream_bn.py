"""Batched multi-stream head decode == the per-stream sequential loop.

The r3 profile showed ~300 ms/step of tiny head ops (4 streams x 2 passes
through the shared decoder). The batched fast path stacks streams along
batch with StreamBatchNorm keeping per-stream batch statistics and the
exact k-fold sequential running-stat update — these tests pin that
equivalence (reference daformer_head.py:305-322 sequential decode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from cmda_tpu.models.common import StreamBatchNorm
from cmda_tpu.models.daformer import DAFormerHeadConfig, DAFormerFusionHead

DIMS = (8, 16, 24, 32)


def test_stream_bn_matches_flax_batchnorm():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6, 6, 5)),
                    jnp.float32)
    ours = StreamBatchNorm()
    ref = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    v1 = ours.init(jax.random.PRNGKey(0), x, train=True)
    v2 = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # same variable tree
    assert set(v1["params"]) == set(v2["params"]) == {"scale", "bias"}
    assert set(v1["batch_stats"]) == set(v2["batch_stats"]) == {"mean", "var"}
    y1, u1 = ours.apply(v1, x, train=True, mutable=["batch_stats"])
    y2, u2 = ref.apply(v2, x, use_running_average=False,
                       mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(u1["batch_stats"][k]),
                                   np.asarray(u2["batch_stats"][k]),
                                   atol=1e-6)
    # eval path uses running stats
    y1e = ours.apply(v1, x, train=False)
    y2e = ref.apply({"params": v2["params"],
                     "batch_stats": v2["batch_stats"]}, x,
                    use_running_average=True)
    np.testing.assert_allclose(np.asarray(y1e), np.asarray(y2e), atol=1e-5)


def test_stream_bn_groups_equals_sequential_calls():
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(3, 4, 4, 5)), jnp.float32)
          for _ in range(3)]
    mod = StreamBatchNorm()
    v = mod.init(jax.random.PRNGKey(0), xs[0], train=True)
    v = jax.tree.map(lambda a: a + 0.1, v)   # non-trivial scale/bias/stats

    # grouped: one call on the stacked batch
    yg, ug = mod.apply(v, jnp.concatenate(xs, axis=0), train=True,
                       stream_groups=3, mutable=["batch_stats"])
    # oracle: three sequential calls threading the running stats
    cur = v["batch_stats"]
    ys = []
    for x in xs:
        y, upd = mod.apply({"params": v["params"], "batch_stats": cur}, x,
                           train=True, mutable=["batch_stats"])
        cur = upd["batch_stats"]
        ys.append(y)
    np.testing.assert_allclose(np.asarray(yg),
                               np.asarray(jnp.concatenate(ys, axis=0)),
                               atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(ug["batch_stats"][k]),
                                   np.asarray(cur[k]), rtol=1e-5, atol=1e-6)


def _pyramid(rng, b=2):
    return [jnp.asarray(rng.normal(size=(b, 8 // (2 ** i) + 8, 8, DIMS[i])),
                        jnp.float32) for i in range(4)]


def test_fusion_head_batched_path_equals_sequential():
    cfg = DAFormerHeadConfig(in_channels=DIMS, embed_dim=16, channels=16,
                             num_classes=7)
    head = DAFormerFusionHead(cfg, share="full", batched_train=True)
    rng = np.random.default_rng(2)
    feats = {"f_image": _pyramid(rng), "f_events": _pyramid(rng),
             "f_fusion": _pyramid(rng), "f_img_self_res": _pyramid(rng)}
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    params, stats = v["params"], v["batch_stats"]

    # batched fast path (train=False -> no dropout; bn_train=True -> batch
    # statistics, the teacher/student BN mode)
    outB, updB = head.apply({"params": params, "batch_stats": stats}, feats,
                            train=False, bn_train=True,
                            mutable=["batch_stats"])
    # sequential oracle: one stream per call, running stats threaded
    cur = stats
    outS = {}
    for s, key in (("image", "image_output"), ("events", "events_output"),
                   ("fusion", "fusion_output"), ("isr", "img_self_res_output")):
        o, upd = head.apply({"params": params, "batch_stats": cur}, feats,
                            train=False, bn_train=True, streams=[s],
                            mutable=["batch_stats"])
        cur = upd["batch_stats"]
        outS[key] = o[key]
    for key in outS:
        np.testing.assert_allclose(np.asarray(outB[key]),
                                   np.asarray(outS[key]),
                                   rtol=2e-4, atol=2e-4)
    flatB = jax.tree_util.tree_leaves_with_path(updB["batch_stats"])
    flatS = dict(jax.tree_util.tree_leaves_with_path(cur))
    for path, leafB in flatB:
        np.testing.assert_allclose(np.asarray(leafB),
                                   np.asarray(flatS[path]),
                                   rtol=1e-4, atol=1e-5)


def test_fusion_head_subset_and_single_stream_unchanged():
    cfg = DAFormerHeadConfig(in_channels=DIMS, embed_dim=16, channels=16,
                             num_classes=7)
    head = DAFormerFusionHead(cfg, share="full")
    rng = np.random.default_rng(3)
    feats = {"f_image": _pyramid(rng), "f_events": _pyramid(rng),
             "f_fusion": None, "f_img_self_res": None}
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    out, _ = head.apply(v, feats, train=False, bn_train=True,
                        mutable=["batch_stats"])
    assert out["image_output"].shape == (2, 16, 8, 7)
    assert out["events_output"].shape == (2, 16, 8, 7)
    assert out["fusion_output"] is None and out["img_self_res_output"] is None


def test_fusion_head_eval_batched_equals_sequential():
    """Default (batched_train=False) heads still batch in EVAL mode
    (running-stats BN) — exactly the per-stream results."""
    cfg = DAFormerHeadConfig(in_channels=DIMS, embed_dim=16, channels=16,
                             num_classes=7)
    head = DAFormerFusionHead(cfg, share="full")
    rng = np.random.default_rng(4)
    feats = {"f_image": _pyramid(rng), "f_events": _pyramid(rng),
             "f_fusion": _pyramid(rng), "f_img_self_res": _pyramid(rng)}
    v = head.init(jax.random.PRNGKey(0), feats, train=False)
    v = jax.tree.map(lambda a: a + 0.05, v)
    outB = head.apply(v, feats, train=False, bn_train=False)
    for s, key in (("image", "image_output"), ("events", "events_output"),
                   ("fusion", "fusion_output"),
                   ("isr", "img_self_res_output")):
        o = head.apply(v, feats, train=False, bn_train=False, streams=[s])
        np.testing.assert_allclose(np.asarray(outB[key]),
                                   np.asarray(o[key]), rtol=2e-4, atol=2e-4)
