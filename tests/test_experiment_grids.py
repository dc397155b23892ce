"""Structural tests for the legacy ablation-table grids (exp 3-8).

The reference's experiments.py:277-393 generates the DAFormer-paper
ablation tables; tools/run_experiments.py replicates them in smoke mode.
These tests validate the grid synthesis (combo counts, name scheme, uda ->
UDAConfig mapping) without compiling any model — the 2-iter execution path
is exercised by `--exp 3..8` runs (docs/COVERAGE.md) and shares all its
machinery with the tested exp-100/101/102 paths.
"""
import math

from tools.run_experiments import (
    legacy_table_grid, _legacy_uda_cfg, _legacy_model_builder)
from cmda_tpu.config import tiny_test_config, replace


def test_grid_combo_counts():
    # reference experiments.py:277-297 (6 pairs x 3 udas), :301-316 (2x2),
    # :320-334 (7 rows), :338-359 (7 archs x 2 udas), :363-376 (1),
    # :380-393 (2 targets)
    expected = {3: 18, 4: 4, 5: 7, 6: 14, 7: 1, 8: 2}
    for exp_id, n in expected.items():
        combos = legacy_table_grid(exp_id)
        assert len(combos) == n, (exp_id, len(combos))
        names = [c["name"] for c in combos]
        assert len(set(names)) == n, f"duplicate names in exp {exp_id}"


def test_grid_name_scheme():
    # reference cfg['name'] scheme: source2target_uda[_rcsX][_cpl]_arch_bb_sched
    combos = {c["name"]: c for c in legacy_table_grid(5)}
    assert "gta2cs_dacs_rcsinf_segformer_mitb5_poly10warm" in combos
    assert "gta2cs_dacs_rcs001_segformer_mitb5_poly10warm" in combos
    assert ("gta2cs_dacs_a999_fdthings_rcs001_cpl_dlv2red_r101v1c_poly10warm"
            in combos)
    # rcs/plcrop apply only to dacs variants (experiments.py:112-116)
    for c in legacy_table_grid(3):
        if "dacs" not in c["uda"]:
            assert c["rcs_T"] is None and not c["plcrop"], c["name"]
    # exp 4 is the no-warmup schedule
    for c in legacy_table_grid(4):
        assert not c["warmup"] and c["name"].endswith("_poly10"), c["name"]
    # exp 7 is SYNTHIA 16-class
    (c7,) = legacy_table_grid(7)
    assert c7["num_classes"] == 16 and c7["name"].startswith("syn2cs")


def test_legacy_uda_cfg_mapping():
    base = tiny_test_config()
    base = replace(base, model=replace(base.model, train_type="cs2dz_image",
                                       fusion="", fusion_isr=""))
    plain = _legacy_uda_cfg(base, "dacs", None, False)
    assert plain.uda.alpha == 0.99
    assert plain.uda.imnet_feature_dist_lambda == 0.0
    assert not plain.data.rcs_enabled

    fdthings = _legacy_uda_cfg(base, "dacs_a999_fdthings", 0.01, True)
    assert fdthings.uda.alpha == 0.999
    assert fdthings.uda.imnet_feature_dist_lambda == 0.005
    assert fdthings.uda.imnet_feature_dist_classes == (
        6, 7, 11, 12, 13, 14, 15, 16, 17, 18)
    assert fdthings.uda.pseudo_weight_ignore_top == 15
    assert fdthings.uda.pseudo_weight_ignore_bottom == 120
    assert fdthings.data.rcs_enabled and fdthings.data.rcs_class_temp == 0.01

    fd_all = _legacy_uda_cfg(base, "dacs_fd", None, False)
    assert fd_all.uda.imnet_feature_dist_classes == tuple(range(19))

    rcs_inf = _legacy_uda_cfg(base, "dacs", math.inf, False)
    assert rcs_inf.data.rcs_class_temp == math.inf

    nowarm = _legacy_uda_cfg(base, "dacs", None, False, warmup=False)
    assert nowarm.optim.warmup_iters == 0


def test_frozen_imnet_with_bn_backbone_applies():
    """Regression: exp-5 combo *_fdthings_*_dlv2red_r101v1c failed because
    the frozen ImageNet feature-distance net was applied with bare params —
    eval-mode BatchNorm then read an empty batch_stats collection. The
    trainers now route through uda.transforms.frozen_variables, which
    accepts either bare params (MiT, no BN) or a full variables dict."""
    import jax
    import jax.numpy as jnp
    from cmda_tpu.uda.transforms import frozen_variables

    model = _legacy_model_builder("dlv2red", "r101v1c", 19)()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables  # ResNet stem carries running stats
    # full-variables path: frozen apply must succeed in eval mode
    feats = model.apply(frozen_variables(variables), x,
                        method=model.extract_feat)
    assert len(feats) == 4
    # bare-params path (MiT imnets) still wraps without copying
    wrapped = frozen_variables(variables["params"])
    assert wrapped["params"] is variables["params"]


def test_legacy_model_builders_instantiate():
    # builders are zero-arg closures; constructing the flax module (no
    # init) proves every (arch, backbone) id in the tables resolves
    seen = set()
    for exp_id in (3, 4, 5, 6, 7, 8):
        for c in legacy_table_grid(exp_id):
            key = (c["arch"], c["backbone"], c["num_classes"])
            if key in seen:
                continue
            seen.add(key)
            model = _legacy_model_builder(*key)()
            assert model is not None, key
    assert len(seen) >= 12
