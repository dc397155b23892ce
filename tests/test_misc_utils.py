"""Rho/Diff edge kernels vs torch oracle, zipdir, WGAN-GP penalty."""
import os
import zipfile

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from cmda_tpu.utils.misc import rho_edges, diff_edges, zipdir
from cmda_tpu.models.cyclegan import gradient_penalty


def _torch_rho(x, n_kernels):
    kernels = [torch.tensor([[3, -1], [-1, -1]], dtype=torch.float),
               torch.tensor([[-1, 3], [-1, -1]], dtype=torch.float),
               torch.tensor([[-1, -1], [-1, 3]], dtype=torch.float),
               torch.tensor([[-1, -1], [3, -1]], dtype=torch.float)]
    conv = nn.Conv2d(1, n_kernels, kernel_size=2, padding=1, bias=False,
                     padding_mode="reflect")
    with torch.no_grad():
        for i in range(n_kernels):
            conv.weight[i].copy_(kernels[i].unsqueeze(0))
        return conv(x)[:, :, :-1, :-1].numpy()


def test_rho_diff_match_torch():
    g = np.random.default_rng(0)
    x = g.normal(size=(2, 9, 11, 1)).astype(np.float32)
    xt = torch.as_tensor(np.transpose(x, (0, 3, 1, 2)))
    oracle4 = np.transpose(_torch_rho(xt, 4), (0, 2, 3, 1))
    ours4 = np.asarray(rho_edges(jnp.asarray(x)))
    np.testing.assert_allclose(ours4, oracle4, atol=1e-5)
    oracle1 = np.transpose(_torch_rho(xt, 1), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(diff_edges(jnp.asarray(x))),
                               oracle1, atol=1e-5)


def test_zipdir(tmp_path):
    (tmp_path / "src" / "keep").mkdir(parents=True)
    (tmp_path / "src" / "work_dirs").mkdir()
    (tmp_path / "src" / "keep" / "a.py").write_text("x=1")
    (tmp_path / "src" / "work_dirs" / "b.log").write_text("skip")
    out = zipdir(str(tmp_path / "src"), str(tmp_path / "code.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert any("a.py" in n for n in names)
    assert not any("b.log" in n for n in names)


def test_gradient_penalty_linear_critic():
    """For critic(x) = sum(w * x), ||grad||_2 = ||w||_2 everywhere, so the
    penalty is lambda * (||w|| - 1)^2 exactly."""
    w = np.full((4, 4, 1), 0.5, np.float32)
    wn = float(np.linalg.norm(w))

    def critic(x):  # [B,4,4,1] -> [B]
        return jnp.sum(x * jnp.asarray(w), axis=(1, 2, 3))

    g = np.random.default_rng(1)
    real = jnp.asarray(g.normal(size=(3, 4, 4, 1)).astype(np.float32))
    fake = jnp.asarray(g.normal(size=(3, 4, 4, 1)).astype(np.float32))
    gp = gradient_penalty(critic, jax.random.PRNGKey(0), real, fake,
                          lambda_gp=10.0)
    np.testing.assert_allclose(float(gp), 10.0 * (wn - 1.0) ** 2, rtol=1e-5)
    assert float(gradient_penalty(critic, jax.random.PRNGKey(0), real, fake,
                                  lambda_gp=0.0)) == 0.0

def test_scale_by_adam_lp_matches_optax():
    """scale_by_adam_lp at f32 must reproduce optax.scale_by_adam exactly;
    bf16 moment storage must track it closely (HBM buy-back lever)."""
    import jax
    import jax.numpy as jnp
    import optax
    from cmda_tpu.train.optim import scale_by_adam_lp

    params = {"w": jnp.linspace(-1, 1, 32).reshape(4, 8),
              "b": jnp.ones((8,))}
    ref_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    f32_tx = scale_by_adam_lp(0.9, 0.999, moment_dtype=jnp.float32)
    bf_tx = scale_by_adam_lp(0.9, 0.999, moment_dtype=jnp.bfloat16)
    states = [ref_tx.init(params), f32_tx.init(params), bf_tx.init(params)]
    assert jax.tree.leaves(states[2].mu)[0].dtype == jnp.bfloat16

    g = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    for step in range(5):
        grads = {"w": g * (step + 1) * 0.1, "b": jnp.full((8,), 0.01 * step)}
        out = []
        for i, tx in enumerate((ref_tx, f32_tx, bf_tx)):
            u, states[i] = tx.update(grads, states[i])
            out.append(u)
        # optax orders the bias-correction arithmetic slightly
        # differently; 1e-4 on O(1) updates is float32 round-off level
        np.testing.assert_allclose(np.asarray(out[1]["w"]),
                                   np.asarray(out[0]["w"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[2]["w"]),
                                   np.asarray(out[0]["w"]), atol=0.05)


def test_analyze_trace_chrome_grouping(tmp_path):
    """tools/analyze_trace.py: device-lane filtering + instance-suffix
    grouping over a synthetic Chrome trace dump."""
    import gzip
    import json as _json
    import sys as _sys
    from tools.analyze_trace import (find_artifacts, load_chrome_events,
                                     device_events_from_chrome)

    run = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    run.mkdir(parents=True)
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host thread"}},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 100.0, "ts": 0},
        {"ph": "X", "pid": 1, "name": "fusion.2", "dur": 50.0, "ts": 1},
        {"ph": "X", "pid": 1, "name": "while", "dur": 400.0, "ts": 2},
        # host event must be filtered out
        {"ph": "X", "pid": 2, "name": "python_call", "dur": 999.0, "ts": 3},
    ]
    with gzip.open(run / "vm.trace.json.gz", "wt") as f:
        _json.dump({"traceEvents": events}, f)

    chrome, xplanes = find_artifacts(str(tmp_path))
    assert chrome and not xplanes
    got = list(device_events_from_chrome(load_chrome_events(chrome[0])))
    assert ("while", 400.0) in got
    assert all(name != "python_call" for name, _ in got)
    # grouping collapses fusion.1/fusion.2 under one key
    import collections, re
    total = collections.Counter()
    for name, dur in got:
        total[re.sub(r"\.\d+$", "", name)] += dur
    assert total["fusion"] == 150.0 and total["while"] == 400.0


def test_lean_closure_guard():
    """HTTP-413 regression guard (VERDICT r4 item 8): a jitted eval fn
    that closes over model-weight-sized arrays must be rejected; the
    weights-as-arguments pattern must pass (train/loop.py NOTE)."""
    import pytest
    from cmda_tpu.utils.guards import assert_lean_closure, FatClosureError

    big = np.zeros((600, 600), np.float32)           # 1.44 MB > 1 MB limit
    variables = {"params": {"w": big}}

    def bad(image):
        return image @ variables["params"]["w"]

    with pytest.raises(FatClosureError):
        assert_lean_closure(jax.jit(bad))

    def good(variables, image):
        return image @ variables["params"]["w"]

    assert_lean_closure(jax.jit(good))               # no raise

    # nested capture (a jitted wrapper closing over a helper that closes
    # over the weights) is caught too
    def helper(x):
        return x @ big

    def bad_nested(image):
        return helper(image)

    with pytest.raises(FatClosureError):
        assert_lean_closure(bad_nested)

    # small captures (thresholds, class tables) stay allowed
    table = np.arange(19, dtype=np.int32)

    def fine(image):
        return image[..., table]

    assert_lean_closure(fine)


def test_train_chunked_helpers(tmp_path):
    """Segment launcher (leak workaround, r5): checkpoint discovery picks
    the highest iter_N; the watchdog kills a child that stops advancing
    the log and reports rc 99."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    import train_chunked as tc

    wd = tmp_path / "wd"
    wd.mkdir()
    assert tc.latest_checkpoint(str(wd)) == (None, 0)
    (wd / "iter_2000").mkdir()
    (wd / "iter_500").mkdir()
    (wd / "not_a_ckpt").mkdir()
    path, it = tc.latest_checkpoint(str(wd))
    assert it == 2000 and path.endswith("iter_2000")

    # watchdog: a sleeping child that never writes the log gets killed
    rc = tc.run_segment([sys.executable, "-c", "import time; time.sleep(600)"],
                        str(wd), stall_timeout=1.0)
    assert rc == 99
    # a child that exits cleanly passes its rc through
    rc = tc.run_segment([sys.executable, "-c", "raise SystemExit(0)"],
                        str(wd), stall_timeout=30.0)
    assert rc == 0
