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
    return combos


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
    return variants


def smoke_run(name, cfg, iters=2):
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
                    help="1=cs2dsec 2=cs2dz 100=arch grid 101=uda grid")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    if args.exp in (1, 2):
        from tools.train import main as train_main
        sys.argv = ["train.py", "--config",
                    "cs2dsec" if args.exp == 1 else "cs2dz"]
        return train_main()

    grid = architecture_grid() if args.exp == 100 else uda_grid()
    results = {}
    for name, cfg in grid:
        try:
            loss = smoke_run(name, cfg, args.iters)
            results[name] = {"ok": True, "loss": loss}
            print(f"[OK]   {name}: loss={loss:.3f}", flush=True)
        except Exception as e:
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            print(f"[FAIL] {name}: {e}", flush=True)
            traceback.print_exc()
    print(json.dumps(results, indent=2))
    if not all(r["ok"] for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
