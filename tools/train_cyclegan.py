"""Train the CycleGAN Image Content-Extractor (ICD -> EN) on TPU.

The reference trains this generator OUTSIDE the repo (junyanz CycleGAN;
only the resulting cityscapes_ICD_to_dsec_EN.pth is consumed, reference
mmseg/models/uda/dacs.py:96-103). This CLI runs the full unpaired recipe
natively, on the crop folders produced by
``tools/create_cityscapes_image_change.py --mode crops``:

  python tools/create_cityscapes_image_change.py --mode crops \
      --src data/cityscapes/leftImg8bit_IC1/train --dst /tmp/cg/trainA
  python tools/create_cityscapes_image_change.py --mode crops \
      --src data/dsec_en_frames --dst /tmp/cg/trainB
  python tools/train_cyclegan.py --data-a /tmp/cg/trainA \
      --data-b /tmp/cg/trainB --work-dir work_dirs/cyclegan_icd2en

The exported ``cyclegan_final.npz`` plugs straight into training/tools:
  python tools/train.py ... --cyclegan work_dirs/cyclegan_icd2en/cyclegan_final.npz
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="cmda_tpu CycleGAN trainer")
    p.add_argument("--data-a", required=True, help="domain-A image folder "
                   "(day IC crops for the ICD->EN recipe)")
    p.add_argument("--data-b", required=True, help="domain-B image folder "
                   "(night event-frame crops)")
    p.add_argument("--work-dir", default="work_dirs/cyclegan")
    p.add_argument("--steps", type=int, default=None,
                   help="total steps (default: epochs * steps-per-epoch)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--load-size", type=int, default=286)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--rgb", action="store_true",
                   help="3-channel nets/data (default 1-channel grayscale)")
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--n-blocks", type=int, default=9)
    p.add_argument("--n-layers-d", type=int, default=3,
                   help="PatchGAN depth (use 2 for crops < 48px; an empty "
                        "patch map raises at init)")
    p.add_argument("--netd", default="patch", choices=["patch", "pixel"])
    p.add_argument("--gan-mode", default="lsgan", choices=["lsgan", "vanilla"])
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--pool-size", type=int, default=50)
    p.add_argument("--lambda-a", type=float, default=10.0)
    p.add_argument("--lambda-b", type=float, default=10.0)
    p.add_argument("--lambda-identity", type=float, default=0.5)
    p.add_argument("--epochs", type=int, default=100,
                   help="constant-lr epochs (then --epochs-decay to 0)")
    p.add_argument("--epochs-decay", type=int, default=100)
    p.add_argument("--steps-per-epoch", type=int, default=None,
                   help="default: len(domain A) / batch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--save-interval", type=int, default=5000)
    p.add_argument("--sample-interval", type=int, default=1000,
                   help="dump a real_a|fake_b|rec_a sample strip every N steps")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--eager", action="store_true",
                   help="run steps with jax.disable_jit (tiny-config "
                        "smoke runs; skips the XLA compile)")
    p.add_argument("--platform", default=None, choices=["cpu", "axon"],
                   help="force a JAX backend in-process (the sandbox env "
                        "var is pinned; see CLAUDE.md)")
    return p.parse_args()


def save_sample(path, trainer, state, batch):
    import jax.numpy as jnp
    from PIL import Image
    a = jnp.asarray(batch["a"][:1])
    fake_b = trainer.generate(state.g_params["g_a"], a, "a2b")
    rec_a = trainer.generate(state.g_params["g_b"], fake_b, "b2a")
    strip = np.concatenate(
        [np.asarray(t)[0] for t in (a, fake_b, rec_a)], axis=1)
    strip = np.clip((strip * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    if strip.shape[-1] == 1:
        strip = strip[..., 0]
    Image.fromarray(strip).save(path)


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from cmda_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import contextlib
    import jax.numpy as jnp
    from cmda_tpu.data.loader import PrefetchLoader
    from cmda_tpu.data.unpaired import UnpairedFolderDataset
    from cmda_tpu.uda.cyclegan_train import (
        CycleGANConfig, CycleGANTrainer, save_checkpoint)

    dataset = UnpairedFolderDataset(
        args.data_a, args.data_b,
        load_size=(args.load_size, args.load_size),
        crop_size=(args.crop, args.crop), grayscale=not args.rgb)
    spe = args.steps_per_epoch or max(1, len(dataset) // args.batch)
    cfg = CycleGANConfig(
        input_nc=3 if args.rgb else 1, ngf=args.ngf, ndf=args.ndf,
        n_blocks=args.n_blocks, n_layers_d=args.n_layers_d,
        netd=args.netd, gan_mode=args.gan_mode,
        lambda_a=args.lambda_a, lambda_b=args.lambda_b,
        lambda_identity=args.lambda_identity, pool_size=args.pool_size,
        lr=args.lr, n_epochs=args.epochs, n_epochs_decay=args.epochs_decay,
        steps_per_epoch=spe)
    steps = args.steps or spe * (args.epochs + args.epochs_decay)

    trainer = CycleGANTrainer(cfg)

    def ctx():
        return jax.disable_jit() if args.eager else contextlib.nullcontext()

    with ctx():
        state = trainer.init_state(jax.random.PRNGKey(args.seed),
                                   (args.crop, args.crop))
    step_fn = trainer.jit_train_step(donate=True)
    rng = jax.random.PRNGKey(args.seed + 1)
    loader = PrefetchLoader(dataset, args.batch,
                            num_workers=args.num_workers, seed=args.seed)
    log_path = os.path.join(args.work_dir, "cyclegan.log.json")
    n_params = sum(x.size for x in jax.tree.leaves(state.g_params))
    print(f"[cyclegan] {len(dataset)} A-images, {steps} steps, "
          f"{n_params/1e6:.1f}M generator params", flush=True)

    t0 = time.perf_counter()
    try:
        with ctx(), open(log_path, "a") as log:
            for it in range(1, steps + 1):
                batch = next(loader)
                a = jnp.asarray(batch["a"])
                b = jnp.asarray(batch["b"])
                state, logs = step_fn(state, a, b, rng)
                if it % args.log_interval == 0 or it == steps:
                    rec = {k: round(float(v), 4) for k, v in logs.items()}
                    rec.update(iter=it,
                               time=round(time.perf_counter() - t0, 1))
                    log.write(json.dumps(rec) + "\n")
                    log.flush()
                    print(f"[cyclegan] it {it}/{steps} "
                          f"G {rec['loss_g']:.3f} D {rec['loss_d']:.3f}",
                          flush=True)
                if args.sample_interval and it % args.sample_interval == 0:
                    save_sample(os.path.join(args.work_dir,
                                             f"sample_{it:06d}.png"),
                                trainer, state, batch)
                if it % args.save_interval == 0 or it == steps:
                    save_checkpoint(
                        os.path.join(args.work_dir, "cyclegan_final.npz"),
                        state)
    finally:
        loader.close()
    print(json.dumps({"done": True, "steps": steps,
                      "checkpoint": os.path.join(args.work_dir,
                                                 "cyclegan_final.npz")}))


if __name__ == "__main__":
    main()
    # the TPU client can hang at teardown with live loader threads
    sys.stdout.flush()
    os._exit(0)
