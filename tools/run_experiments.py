"""Experiment grid launcher (replaces reference run_experiments.py +
experiments.py + my_run_experiments.py).

``--exp 100`` = the Architecture Startup Test (reference experiments.py:
395-427): instantiate every architecture combo and run 2 end-to-end
iterations each.  ``--exp 101`` = the UDA Training Startup Test (:429-455):
2-iteration smoke runs of every UDA variant.  Both run on synthetic data by
default so they double as integration tests. ``--exp 1`` = the flagship
cs2dsec recipe, ``--exp 2`` = cs2dz.

``--exp 3..8`` = the reference legacy ablation-table grids
(experiments.py:277-393) in 2-iter smoke mode: 3 = Encoder Study,
4 = LR-Warmup Ablation (poly10 without warmup), 5 = RCS & Feature-Distance,
6 = Decoder Study, 7 = Final DAFormer on SYNTHIA (16 classes),
8 = Further Datasets (cs->acdc, cs->darkzurich).  Every combo instantiates
its (architecture, backbone) pair, maps the uda id onto UDAConfig
(dacs / dacs_fd / dacs_fdthings / dacs_a999_fdthings / plcrop), validates
the RCS temperature through ``rcs_class_probs``, and runs 2 iterations —
OrgDACS for 'dacs*' ids, a supervised step for source-/target-only.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def architecture_grid():
    """(name, builder) pairs covering the model zoo."""
    from cmda_tpu.config import tiny_test_config, replace
    from cmda_tpu.models.daformer import DAFormerHeadConfig

    combos = []
    base = tiny_test_config()
    for fusion in ["attention_avg", "attention", "average", "concatenate",
                   "convert_avg"]:
        combos.append((f"fusion_{fusion}", replace(
            base, model=replace(base.model, fusion=fusion))))
    for share in ["full", "none"]:
        combos.append((f"share_{share}", replace(
            base, model=replace(base.model, share_decoder=share))))
    for backbone in ["mit_b0", "mit_b1"]:
        combos.append((f"backbone_{backbone}", replace(
            base, model=replace(base.model, backbone=backbone,
                                head=DAFormerHeadConfig(
                                    in_channels=(32, 64, 160, 256) if backbone == "mit_b0"
                                    else (64, 128, 320, 512),
                                    embed_dim=64, channels=64)))))
    return [c if len(c) == 4 else c + (None,) for c in combos]


# reference backbone id (experiments.py:51-100) -> repo RESNET_VARIANTS key.
# s200 has no dedicated variant table entry; it smoke-maps to the deepest
# ResNeSt preset (the reference distinction is depth only).
_LEGACY_RESNET_MAP = {
    "r50v1c": "resnet50_d8",
    "r101v1c": "resnet101_d8",
    "s50": "resnest50",
    "s101": "resnest101_d8",
    "s200": "resnest101_d8",
    "x50-32": "resnext50",
    "x101-32": "resnext101_d8",
}


def _legacy_model_builder(arch: str, backbone: str, num_classes: int = 19):
    """Zero-arg builder for a reference legacy (architecture, backbone) id
    pair (reference experiments.py:6-29 get_model_base / :51-100
    get_backbone_cfg), smoke-sized: ResNet variants run depths=(1,1,1,1),
    every MiT size maps to mit_b0, head channels shrink to 64.  Returns a
    builder (not an instance) so fdist variants can build a twin imnet.
    The '_nodbn' suffix (decoder-BN ablation) and the 'sfa_' prefix
    (SegFormerAdapter neck, experiments.py:134-135) are honored."""
    from cmda_tpu.models.resnet import ResNetV1c, RESNET_VARIANTS, ResNetConfig
    from cmda_tpu.models.mit import MixVisionTransformer, MIT_VARIANTS
    from cmda_tpu.models.heads import (
        HeadConfig, SegFormerHead, ASPPHead, DAHead, ISAHead, DLV2Head,
        UPerHead, SegFormerAdapter)
    from cmda_tpu.models.daformer import DAFormerHead, DAFormerHeadConfig
    from cmda_tpu.models.segmentor import GenericEncoderDecoder

    is_mit = "mit" in backbone

    def build():
        if is_mit:
            bb = MixVisionTransformer(MIT_VARIANTS["mit_b0"])
            ch = (32, 64, 160, 256)
        else:
            base = RESNET_VARIANTS[_LEGACY_RESNET_MAP[backbone]]
            bb = ResNetV1c(ResNetConfig(**{**base.__dict__,
                                           "depths": (1, 1, 1, 1)}))
            ch = (256, 512, 1024, 2048)
        hc = HeadConfig(in_channels=ch, channels=64, num_classes=num_classes)
        a = arch
        neck = None
        if a.startswith("sfa_"):
            neck = SegFormerAdapter()
            a = a[len("sfa_"):]
        a = a.replace("_nodbn", "")

        def daformer(fusion_type):
            return DAFormerHead(DAFormerHeadConfig(
                in_channels=ch, embed_dim=64, channels=64,
                num_classes=num_classes, fusion_type=fusion_type))

        head = {
            "dlv2red": lambda: DLV2Head(hc),
            "dlv2": lambda: DLV2Head(hc),
            "dlv3p": lambda: ASPPHead(hc, dilations=(1, 12, 24), sep=True,
                                      c1_channels=48),
            "da": lambda: DAHead(hc),
            "isa": lambda: ISAHead(hc, isa_channels=32, down_factor=(2, 2)),
            "segformer": lambda: SegFormerHead(hc),
            "daformer_conv1": lambda: daformer("conv"),
            "daformer_isa": lambda: daformer("isa"),
            "daformer_sepaspp_bottleneck": lambda: daformer(
                "rawconv_and_aspp"),
            "daformer_aspp": lambda: daformer("aspp_nonsep"),
            "daformer_sepaspp": lambda: daformer("aspp"),
            "upernet": lambda: UPerHead(hc),
            "upernet_ch256": lambda: UPerHead(hc, pool_scales=(1, 2)),
        }[a]()
        return GenericEncoderDecoder(bb, head, neck=neck)

    return build


def legacy_architecture_grid():
    """The reference exp-100 architecture/backbone table
    (experiments.py:398-427), scaled to smoke-size backbones: each entry
    builds a GenericEncoderDecoder and is trained 2 supervised iterations.
    Backbone name mapping: r101v1c/r50v1c -> ResNetV1c (d8 dilated),
    s50/s101/s200 -> ResNeSt, x50-32/x101-32 -> ResNeXt, mitbX -> MiT."""
    pairs = [
        ("dlv2red", "r101v1c"), ("dlv3p_nodbn", "r101v1c"),
        ("da_nodbn", "r101v1c"), ("segformer", "mitb5"),
        ("isa_nodbn", "r101v1c"), ("dlv2red", "r50v1c"),
        ("dlv2red", "s50"), ("dlv2red", "s101"), ("dlv2red", "s200"),
        ("dlv2red", "x50-32"), ("dlv2red", "x101-32"),
        ("segformer", "mitb4"), ("segformer", "mitb3"),
        ("sfa_dlv3p_nodbn", "mitb5-del"), ("segformer", "r101v1c"),
        ("daformer_conv1", "mitb5"), ("daformer_isa", "mitb5"),
        ("daformer_sepaspp_bottleneck", "mitb5"), ("daformer_aspp", "mitb5"),
        ("daformer_sepaspp", "mitb5"), ("upernet", "mitb5"),
        ("upernet_ch256", "mitb5"),
    ]
    return [(f"{a}_{b}", _legacy_model_builder(a, b)) for a, b in pairs]


def supervised_smoke(name, model_builder, iters=2, hw=48, num_classes=19):
    """2-iteration supervised train smoke (the reference exp-100 runs each
    architecture for iters=2 with uda='target-only')."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from cmda_tpu.ops.losses import weighted_cross_entropy

    model = model_builder()
    g = np.random.default_rng(0)
    img = jnp.asarray(g.normal(size=(1, hw, hw, 3)).astype(np.float32))
    lbl = jnp.asarray(g.integers(0, num_classes,
                                 size=(1, hw, hw)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    tx = optax.sgd(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, img, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1),
                      "droppath": jax.random.PRNGKey(2)})
            return weighted_cross_entropy(out, lbl, None), upd.get(
                "batch_stats", bstats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    for _ in range(iters):
        params, bstats, opt, loss = step(params, bstats, opt)
    return float(loss)


def uda_grid():
    from cmda_tpu.config import tiny_test_config, replace
    base = tiny_test_config()
    variants = []
    for tt in ["cs2dsec_image+events_together", "cs2dsec_image+events",
               "cs2dz_image+raw-isr"]:
        variants.append((tt, replace(base, model=replace(
            base.model, train_type=tt))))
    variants.append(("cs2dz_image+raw-isr_split", replace(
        base, model=replace(base.model, train_type="cs2dz_image+raw-isr_split",
                            fusion="", fusion_isr="", split_cls=True))))
    variants.append(("cs2dz_image+raw-isr_no-fusion", replace(
        base, model=replace(base.model,
                            train_type="cs2dz_image+raw-isr_no-fusion",
                            fusion="", fusion_isr="", split_cls=True,
                            events_classes=2),
        uda=replace(base.uda, isr_edge=True))))
    variants.append(("cs2dz_image+d2n-isr", replace(
        base, model=replace(base.model, train_type="cs2dz_image+d2n-isr",
                            fusion="", fusion_isr=""))))
    # ablation knobs (reference my_run_experiments.py flags / dacs.py:496-507,
    # 735-756)
    variants.append(("isr_another_fusion", replace(
        base, uda=replace(base.uda, isr_another_fusion=True))))
    variants.append(("isr_another_fusion_image+events", replace(
        base,
        model=replace(base.model, train_type="cs2dsec_image+events"),
        uda=replace(base.uda, isr_another_fusion=True))))
    variants.append(("isr_no_fusion", replace(
        base,
        model=replace(base.model, train_type="cs2dsec_image+events"),
        uda=replace(base.uda, isr_no_fusion=True))))
    variants.append(("shift_3_channel+isr_noise", replace(
        base, uda=replace(base.uda, shift_3_channel=True,
                          isr_noise_dacs_type="noise+blur"))))
    variants.append(("fuse_both_ice_and_e", replace(
        base, uda=replace(base.uda, fuse_both_ice_and_e=True))))
    variants.append(("without_events", replace(
        base, uda=replace(base.uda, without_events=True))))
    variants.append(("without_isd", replace(
        base, uda=replace(base.uda, without_isd=True))))
    return variants


def legacy_uda_grid():
    """OrgDACS (image-only DAFormer DACS) variant axes of the reference
    legacy experiment grids (reference experiments.py:320-362 exp 5/6:
    dacs / dacs_fd / dacs_a999_fdthings / plcrop)."""
    from cmda_tpu.config import tiny_test_config, replace
    base = tiny_test_config()
    base = replace(base, model=replace(base.model, train_type="cs2dz_image",
                                       fusion="", fusion_isr=""))
    fd_classes = (6, 7, 11, 12, 13, 14, 15, 16, 17, 18)
    return [
        ("org_dacs", base),
        ("org_dacs_fd", replace(base, uda=replace(
            base.uda, imnet_feature_dist_lambda=0.005))),
        ("org_dacs_a999_fdthings", replace(base, uda=replace(
            base.uda, alpha=0.999, imnet_feature_dist_lambda=0.005,
            imnet_feature_dist_classes=fd_classes,
            imnet_feature_dist_scale_min_ratio=0.75))),
        ("org_dacs_plcrop", replace(base, uda=replace(
            base.uda, pseudo_weight_ignore_top=15,
            pseudo_weight_ignore_bottom=120))),
    ]


# the DAFormer 'things' classes of dacs_fdthings
# (reference configs/_base_/uda/dacs_a999_fdthings.py)
_FD_THINGS = (6, 7, 11, 12, 13, 14, 15, 16, 17, 18)


def _legacy_uda_cfg(base, uda: str, rcs_T, plcrop: bool, num_classes=19,
                    warmup=True):
    """Map a reference legacy uda id (dacs / dacs_fd / dacs_fdthings /
    dacs_a999_fdthings) + rcs/plcrop/schedule knobs onto RunConfig
    (reference experiments.py:112-116 setup_rcs, :151-154 plcrop,
    _base_/uda/dacs*.py for alpha/fdist)."""
    from cmda_tpu.config import replace
    u = replace(base.uda, alpha=0.999 if "a999" in uda else 0.99)
    if "fdthings" in uda:
        u = replace(u, imnet_feature_dist_lambda=0.005,
                    imnet_feature_dist_classes=_FD_THINGS,
                    imnet_feature_dist_scale_min_ratio=0.75)
    elif "fd" in uda:
        u = replace(u, imnet_feature_dist_lambda=0.005,
                    imnet_feature_dist_classes=tuple(range(num_classes)),
                    imnet_feature_dist_scale_min_ratio=0.75)
    else:
        u = replace(u, imnet_feature_dist_lambda=0.0)
    if plcrop:
        u = replace(u, pseudo_weight_ignore_top=15,
                    pseudo_weight_ignore_bottom=120)
    data = replace(base.data, num_classes=num_classes,
                   rcs_enabled=rcs_T is not None,
                   rcs_class_temp=rcs_T if rcs_T is not None else 0.01)
    optim = base.optim if warmup else replace(base.optim, warmup_iters=0)
    return replace(base, uda=u, data=data, optim=optim)


def legacy_table_grid(exp_id: int):
    """The reference ablation-table grids 3-8 (experiments.py:277-393),
    smoke-sized with seeds collapsed to one.  Returns combo dicts; names
    follow the reference cfg['name'] scheme (source2target_uda_arch_...)."""
    import math
    combos = []

    def add(arch, backbone, uda, rcs_T=None, plcrop=False, warmup=True,
            nc=19, source="gta", target="cs"):
        if "dacs" not in uda:   # reference applies rcs/plcrop only to dacs
            rcs_T, plcrop = None, False
        uda_mod = uda
        if rcs_T is not None:
            uda_mod += "_rcsinf" if rcs_T == math.inf else f"_rcs{rcs_T}"
        if plcrop:
            uda_mod += "_cpl"
        sched = "poly10warm" if warmup else "poly10"
        combos.append(dict(
            name=f"{source}2{target}_{uda_mod}_{arch}_{backbone}_{sched}"
                 .replace(".", ""),
            arch=arch, backbone=backbone, uda=uda, rcs_T=rcs_T,
            plcrop=plcrop, warmup=warmup, num_classes=nc))

    if exp_id == 3:    # Encoder Study (experiments.py:277-297)
        for arch, bb in [("dlv2red", "r50v1c"), ("dlv2red", "s50"),
                         ("dlv2red", "s101"), ("dlv2red", "s200"),
                         ("segformer", "mitb3"), ("segformer", "mitb4")]:
            for uda in ["source-only", "dacs", "target-only"]:
                add(arch, bb, uda)
    elif exp_id == 4:  # LR-Warmup Ablation (:301-316): poly10, no warmup
        for arch, bb in [("dlv2red", "r101v1c"), ("segformer", "mitb5")]:
            for uda in ["dacs", "target-only"]:
                add(arch, bb, uda, warmup=False)
    elif exp_id == 5:  # RCS and FD (:320-334)
        for arch, bb, uda, rcs_T, plcrop in [
                ("segformer", "mitb5", "dacs", math.inf, False),
                ("segformer", "mitb5", "dacs", 0.01, False),
                ("segformer", "mitb5", "dacs_fd", None, False),
                ("segformer", "mitb5", "dacs_fdthings", None, False),
                ("segformer", "mitb5", "dacs_fdthings", 0.01, False),
                ("segformer", "mitb5", "dacs_a999_fdthings", 0.01, True),
                ("dlv2red", "r101v1c", "dacs_a999_fdthings", 0.01, True)]:
            add(arch, bb, uda, rcs_T, plcrop)
    elif exp_id == 6:  # Decoder Study (:338-359)
        for arch in ["daformer_conv1", "upernet", "upernet_ch256",
                     "daformer_isa", "daformer_sepaspp_bottleneck",
                     "daformer_aspp", "daformer_sepaspp"]:
            for uda in ["dacs_a999_fdthings", "target-only"]:
                add(arch, "mitb5", uda, 0.01, True)
    elif exp_id == 7:  # Final DAFormer on SYNTHIA, 16 classes (:363-376)
        add("daformer_sepaspp", "mitb5", "dacs_a999_fdthings", 0.01, True,
            nc=16, source="syn")
    elif exp_id == 8:  # Further Datasets (:380-393)
        for target in ["acdc", "dzur"]:
            add("daformer_sepaspp", "mitb5", "dacs_a999_fdthings", 0.01,
                True, source="cs", target=target)
    else:
        raise NotImplementedError(f"unknown legacy grid id {exp_id}")
    return combos


def legacy_combo_run(combo, iters=2, eager=False):
    """Instantiate one legacy-grid combo and run ``iters`` steps: OrgDACS
    for 'dacs*' ids, a supervised step for source-/target-only (the smoke
    data is synthetic either way, matching exp 100/101)."""
    from cmda_tpu.config import tiny_test_config, replace

    nc = combo["num_classes"]
    builder = _legacy_model_builder(combo["arch"], combo["backbone"], nc)
    out = {}
    if combo["rcs_T"] is not None:
        # prove the RCS wiring at this temperature on synthetic class stats
        # (the file-level sampler is covered by tests/test_data.py)
        import numpy as np
        from cmda_tpu.data.uda import rcs_class_probs
        stats = {f"f{i}": {str(c): (c + 1) * 100 for c in range(nc)}
                 for i in range(3)}
        classes, probs = rcs_class_probs(stats, combo["rcs_T"], nc)
        assert abs(float(np.sum(probs)) - 1.0) < 1e-6
        out["rcs_prob_max"] = round(float(np.max(probs)), 4)
    if combo["uda"] in ("source-only", "target-only"):
        out["loss"] = supervised_smoke(combo["name"], builder, iters,
                                       num_classes=nc)
        return out
    base = tiny_test_config()
    base = replace(base, model=replace(base.model, train_type="cs2dz_image",
                                       fusion="", fusion_isr=""))
    cfg = _legacy_uda_cfg(base, combo["uda"], combo["rcs_T"],
                          combo["plcrop"], num_classes=nc,
                          warmup=combo["warmup"])
    out["loss"] = org_smoke_run(combo["name"], cfg, iters, eager=eager,
                                model_builder=builder)
    return out


def org_smoke_run(name, cfg, iters=2, eager=False, model_builder=None):
    """2-iter OrgDACS smoke (the legacy-grid analogue of smoke_run).
    ``model_builder`` swaps the default MiT EncoderDecoder for a legacy
    architecture combo (called twice when fdist needs a twin imnet)."""
    import contextlib
    import jax
    import jax.numpy as jnp
    from cmda_tpu.uda.org_dacs import OrgDACSTrainer
    from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
    from cmda_tpu.data.uda import UDAPairDataset

    src = SyntheticSource(crop_size=cfg.data.crop_size, with_time_res=False,
                          num_classes=cfg.data.num_classes)
    tgt = SyntheticTarget(crop_size=cfg.data.crop_size, with_events=False,
                          num_classes=cfg.data.num_classes)
    pair = UDAPairDataset(src, tgt, seed=0)
    enable_fdist = cfg.uda.imnet_feature_dist_lambda > 0
    trainer = OrgDACSTrainer(
        cfg,
        model=model_builder() if model_builder else None,
        imnet_model=model_builder() if (model_builder and enable_fdist)
        else None)
    imnet = None
    if trainer.enable_fdist:
        # frozen "ImageNet" feature net: random stand-in for the smoke run
        # (real runs import torch weights via tools/train.py --imnet)
        h, w = cfg.data.crop_size
        # keep the FULL variables dict: BN-bearing legacy backbones
        # (ResNet/ResNeSt) need their batch_stats when applied frozen
        imnet = trainer.imnet.init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, h, w, 3), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), imnet_params=imnet)
    step = (trainer.train_step if eager
            else jax.jit(trainer.train_step, donate_argnums=()))
    ctx = jax.disable_jit() if eager else contextlib.nullcontext()
    with ctx:
        loss = _run_iters(cfg, pair, trainer, state, step, iters)
    return loss


def smoke_run(name, cfg, iters=2, eager=False):
    import contextlib
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cmda_tpu.uda.dacs import DACSTrainer
    from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
    from cmda_tpu.data.uda import UDAPairDataset
    from cmda_tpu.data.loader import collate

    with_events = cfg.model.train_type.startswith("cs2dsec")
    src = SyntheticSource(crop_size=cfg.data.crop_size,
                          with_time_res=with_events)
    tgt = SyntheticTarget(crop_size=cfg.data.crop_size,
                          with_events=with_events)
    pair = UDAPairDataset(src, tgt, seed=0)
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step = trainer.jit_train_step(donate=False)
    ctx = jax.disable_jit() if eager else contextlib.nullcontext()
    if eager:
        step = trainer.train_step
    with ctx:
        loss = _run_iters(cfg, pair, trainer, state, step, iters)
    return loss


def _run_iters(cfg, pair, trainer, state, step, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cmda_tpu.data.loader import collate
    for i in range(iters):
        batch = jax.tree.map(jnp.asarray, collate([pair[j] for j in range(
            cfg.data.batch_size)]))
        if cfg.model.train_type == "cs2dz_image+d2n-isr":
            g = np.random.default_rng(i)
            b, (h, w) = cfg.data.batch_size, cfg.data.crop_size
            batch["target"]["day_image"] = jnp.asarray(
                g.normal(size=(b, h, w, 3)).astype(np.float32))
            batch["target"]["day_isr"] = jnp.asarray(
                g.normal(size=(b, h, w, 3)).astype(np.float32))
        state, logs = step(state, batch, jax.random.PRNGKey(1))
    return float(logs["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, required=True,
                    help="1=cs2dsec 2=cs2dz 3..8=reference ablation-table "
                         "grids (smoke mode) 100=arch grid 101=uda grid "
                         "102=legacy OrgDACS grid")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--eager", action="store_true",
                    help="run steps with jax.disable_jit (the tiny-config "
                         "fused step takes minutes to COMPILE per variant "
                         "on CPU; eager numerics are identical)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (eager grids on a remote TPU "
                         "pay a network round-trip per op — use cpu)")
    ap.add_argument("--only", default=None,
                    help="substring filter on combo names (grids 3-8): run "
                         "only matching combos — debugging aid")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.exp in (1, 2):
        from tools.train import main as train_main
        sys.argv = ["train.py", "--config",
                    "cs2dsec" if args.exp == 1 else "cs2dz"]
        return train_main()

    results = {}
    if args.exp == 100:
        # fusion-framework combos (2-iter UDA smokes)
        for name, cfg in architecture_grid():
            try:
                loss = smoke_run(name, cfg, args.iters, eager=args.eager)
                results[name] = {"ok": True, "loss": loss}
                print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
            except Exception as e:
                results[name] = {"ok": False,
                                 "error": f"{type(e).__name__}: {e}"}
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc()
        # reference exp-100 architecture table (supervised smokes)
        for name, builder in legacy_architecture_grid():
            try:
                loss = supervised_smoke(name, builder, args.iters)
                results[name] = {"ok": True, "loss": loss}
                print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
            except Exception as e:
                results[name] = {"ok": False,
                                 "error": f"{type(e).__name__}: {e}"}
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc()
    elif args.exp in (3, 4, 5, 6, 7, 8):
        for combo in legacy_table_grid(args.exp):
            name = combo["name"]
            if args.only and args.only not in name:
                continue
            try:
                r = legacy_combo_run(combo, args.iters, eager=args.eager)
                results[name] = {"ok": True, **r}
                print(f"[OK]   {name}: loss={r['loss']:.3f}", flush=True)
            except Exception as e:
                results[name] = {"ok": False,
                                 "error": f"{type(e).__name__}: {e}"}
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc()
    elif args.exp == 102:
        for name, cfg in legacy_uda_grid():
            try:
                loss = org_smoke_run(name, cfg, args.iters, eager=args.eager)
                results[name] = {"ok": True, "loss": loss}
                print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
            except Exception as e:
                results[name] = {"ok": False,
                                 "error": f"{type(e).__name__}: {e}"}
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc()
    else:
        for name, cfg in uda_grid():
            try:
                loss = smoke_run(name, cfg, args.iters, eager=args.eager)
                results[name] = {"ok": True, "loss": loss}
                print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
            except Exception as e:
                results[name] = {"ok": False,
                                 "error": f"{type(e).__name__}: {e}"}
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc()
    print(json.dumps(results, indent=2))
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
