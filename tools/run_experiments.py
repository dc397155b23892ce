"""Experiment grid launcher (replaces reference run_experiments.py +
experiments.py + my_run_experiments.py).

``--exp 100`` = the Architecture Startup Test (reference experiments.py:
395-427): instantiate every architecture combo and run 2 end-to-end
iterations each.  ``--exp 101`` = the UDA Training Startup Test (:429-455):
2-iteration smoke runs of every UDA variant.  Both run on synthetic data by
default so they double as integration tests. ``--exp 1`` = the flagship
cs2dsec recipe, ``--exp 2`` = cs2dz.
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


def legacy_architecture_grid():
    """The reference exp-100 architecture/backbone table
    (experiments.py:398-427), scaled to smoke-size backbones: each entry
    builds a GenericEncoderDecoder and is trained 2 supervised iterations.
    Backbone name mapping: r101v1c/r50v1c -> ResNetV1c (d8 dilated),
    s50/s101/s200 -> ResNeSt, x50-32/x101-32 -> ResNeXt, mitbX -> MiT."""
    from cmda_tpu.models.resnet import ResNetV1c, RESNET_VARIANTS, ResNetConfig
    from cmda_tpu.models.mit import MixVisionTransformer, MIT_VARIANTS
    from cmda_tpu.models.heads import (
        HeadConfig, SegFormerHead, ASPPHead, DAHead, ISAHead, DLV2Head,
        UPerHead, SegFormerAdapter)
    from cmda_tpu.models.daformer import DAFormerHead, DAFormerHeadConfig

    rcfg = HeadConfig(in_channels=(256, 512, 1024, 2048), channels=64)
    mit_hc = HeadConfig(in_channels=(32, 64, 160, 256), channels=64)

    def resnet(name):
        # smoke-size: 2 blocks per stage, same block types/strides/dilations
        base = RESNET_VARIANTS[name]
        return ResNetV1c(ResNetConfig(**{**base.__dict__,
                                         "depths": (1, 1, 1, 1)}))

    def mit(name="mit_b0"):
        return MixVisionTransformer(MIT_VARIANTS["mit_b0"])

    def daformer(fusion_type):
        return DAFormerHead(DAFormerHeadConfig(
            in_channels=(32, 64, 160, 256), embed_dim=64, channels=64,
            fusion_type=fusion_type))

    combos = [
        ("dlv2red_r101v1c", resnet("resnet101_d8"), DLV2Head(rcfg)),
        ("dlv3p_nodbn_r101v1c", resnet("resnet101_d8"),
         ASPPHead(rcfg, dilations=(1, 12, 24), sep=True, c1_channels=48)),
        ("da_nodbn_r101v1c", resnet("resnet101_d8"), DAHead(rcfg)),
        ("segformer_mitb5", mit(), SegFormerHead(mit_hc)),
        ("isa_nodbn_r101v1c", resnet("resnet101_d8"),
         ISAHead(rcfg, isa_channels=32, down_factor=(2, 2))),
        ("dlv2red_r50v1c", resnet("resnet50_d8"), DLV2Head(rcfg)),
        ("dlv2red_s50", resnet("resnest50"), DLV2Head(rcfg)),
        ("dlv2red_s101", resnet("resnest101_d8"), DLV2Head(rcfg)),
        ("dlv2red_s200", resnet("resnest101_d8"), DLV2Head(rcfg)),
        ("dlv2red_x50-32", resnet("resnext50"), DLV2Head(rcfg)),
        ("dlv2red_x101-32", resnet("resnext101_d8"), DLV2Head(rcfg)),
        ("segformer_mitb4", mit(), SegFormerHead(mit_hc)),
        ("segformer_mitb3", mit(), SegFormerHead(mit_hc)),
        # 'sfa_' wires the SegFormerAdapter neck (experiments.py:134-135):
        # stage-3 upsampled 4x replaces the last feature before the head
        ("sfa_dlv3p_nodbn_mitb5-del", mit(),
         ASPPHead(mit_hc, dilations=(1, 12, 24), sep=True, c1_channels=48),
         SegFormerAdapter()),
        ("segformer_r101v1c", resnet("resnet101_d8"), SegFormerHead(rcfg)),
        ("daformer_conv1_mitb5", mit(), daformer("conv")),
        ("daformer_isa_mitb5", mit(), daformer("isa")),
        ("daformer_sepaspp_bottleneck_mitb5", mit(),
         daformer("rawconv_and_aspp")),
        ("daformer_aspp_mitb5", mit(), daformer("aspp_nonsep")),
        ("daformer_sepaspp_mitb5", mit(), daformer("aspp")),
        ("upernet_mitb5", mit(), UPerHead(mit_hc)),
        ("upernet_ch256_mitb5", mit(), UPerHead(mit_hc, pool_scales=(1, 2))),
    ]
    return [c if len(c) == 4 else c + (None,) for c in combos]


def supervised_smoke(name, backbone, head, iters=2, hw=48, neck=None):
    """2-iteration supervised train smoke (the reference exp-100 runs each
    architecture for iters=2 with uda='target-only')."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from cmda_tpu.models.segmentor import GenericEncoderDecoder
    from cmda_tpu.ops.losses import weighted_cross_entropy

    model = GenericEncoderDecoder(backbone, head, neck=neck)
    g = np.random.default_rng(0)
    img = jnp.asarray(g.normal(size=(1, hw, hw, 3)).astype(np.float32))
    lbl = jnp.asarray(g.integers(0, 19, size=(1, hw, hw)).astype(np.int32))
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


def org_smoke_run(name, cfg, iters=2, eager=False):
    """2-iter OrgDACS smoke (the legacy-grid analogue of smoke_run)."""
    import contextlib
    import jax
    import jax.numpy as jnp
    from cmda_tpu.uda.org_dacs import OrgDACSTrainer
    from cmda_tpu.data.synthetic import SyntheticSource, SyntheticTarget
    from cmda_tpu.data.uda import UDAPairDataset

    src = SyntheticSource(crop_size=cfg.data.crop_size, with_time_res=False)
    tgt = SyntheticTarget(crop_size=cfg.data.crop_size, with_events=False)
    pair = UDAPairDataset(src, tgt, seed=0)
    trainer = OrgDACSTrainer(cfg)
    imnet = None
    if trainer.enable_fdist:
        # frozen "ImageNet" feature net: random stand-in for the smoke run
        # (real runs import torch weights via tools/train.py --imnet)
        h, w = cfg.data.crop_size
        imnet = trainer.model.init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, h, w, 3), jnp.float32))["params"]
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
                    help="1=cs2dsec 2=cs2dz 100=arch grid 101=uda grid 102=legacy OrgDACS grid")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--eager", action="store_true",
                    help="run steps with jax.disable_jit (the tiny-config "
                         "fused step takes minutes to COMPILE per variant "
                         "on CPU; eager numerics are identical)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a jax platform (eager grids on a remote TPU "
                         "pay a network round-trip per op — use cpu)")
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
        for name, backbone, head, neck in legacy_architecture_grid():
            try:
                loss = supervised_smoke(name, backbone, head, args.iters,
                                        neck=neck)
                results[name] = {"ok": True, "loss": loss}
                print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
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
