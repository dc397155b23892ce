"""AOT serving-artifact export: compile the inference forward once,
serialize it, run it anywhere without model code.

The reference has no deployment story beyond "load the checkpoint into
python and call the model" (reference tools/test.py:161-188). TPU-native
serving wants an ahead-of-time artifact instead: this tool traces the
checkpoint-loaded inference function with `jax.export`, serializes the
StableHLO (portable across jax versions and, with --platforms, across
cpu/tpu backends) next to a meta.json (config, stream, geometry, class
names/palette), and can reload + numerically verify the artifact against
the live model.

    # export the whole-inference forward at the DSEC eval geometry
    python tools/export_model.py export out.cmda --config tiny --height 64 --width 64

    # reload the artifact (no model code used) and run it on zeros
    python tools/export_model.py run out.cmda

Artifact layout: <name>/fn.stablehlo (serialized jax.export.Exported),
<name>/meta.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle")


def build_export(args):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from cmda_tpu.apis import init_segmentor

    seg = init_segmentor(args.config, checkpoint=args.checkpoint,
                         torch_checkpoint=args.torch_checkpoint,
                         output=args.output, overrides=args.set or ())
    model, state, cfg = seg.model, seg.state, seg.cfg
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    output = seg.output
    with_second = not args.image_only

    def fn(image, second):
        if output == "image" or not with_second:
            logits = model.apply(variables, image, None, None,
                                 mode="no_fusion", output="image")
        elif output == "isr":
            logits = model.apply(variables, image, None, second,
                                 mode="no_fusion", output="isr")
        else:
            logits = model.apply(variables, image, second, None,
                                 mode="default", output=output)
        return logits, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    shape = (args.batch, args.height, args.width, 3)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    exported = jexport.export(jax.jit(fn),
                              platforms=args.platforms.split(","))(spec, spec)
    os.makedirs(args.artifact, exist_ok=True)
    with open(os.path.join(args.artifact, "fn.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    meta = {
        "framework": "cmda_tpu",
        "train_type": cfg.model.train_type,
        "backbone": cfg.model.backbone,
        "output_stream": output,
        "with_second": with_second,
        "input_shape": list(shape),
        "platforms": args.platforms.split(","),
        "num_classes": cfg.data.num_classes,
        "classes": CITYSCAPES_CLASSES[:cfg.data.num_classes],
    }
    with open(os.path.join(args.artifact, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"artifact": args.artifact, **meta}))

    if args.verify:
        logits_live, pred_live = fn(jnp.zeros(shape), jnp.zeros(shape))
        logits_art, pred_art = load_and_call(
            args.artifact, np.zeros(shape, np.float32),
            np.zeros(shape, np.float32))
        np.testing.assert_allclose(np.asarray(logits_live),
                                   np.asarray(logits_art), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(pred_live),
                                      np.asarray(pred_art))
        print(json.dumps({"verified": True}))


def load_and_call(artifact: str, image, second):
    """Deserialize + call the artifact — no cmda_tpu model code involved."""
    from jax import export as jexport
    with open(os.path.join(artifact, "fn.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call(image, second)


def run_artifact(args):
    with open(os.path.join(args.artifact, "meta.json")) as f:
        meta = json.load(f)
    shape = tuple(meta["input_shape"])
    rng = np.random.default_rng(0)
    image = rng.normal(size=shape).astype(np.float32)
    second = rng.normal(size=shape).astype(np.float32)
    logits, pred = load_and_call(args.artifact, image, second)
    print(json.dumps({
        "artifact": args.artifact, "logits_shape": list(logits.shape),
        "pred_shape": list(pred.shape),
        "pred_classes": sorted(set(np.asarray(pred).ravel().tolist()))[:10],
    }))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("export", help="trace + serialize the inference fn")
    ex.add_argument("artifact")
    ex.add_argument("--config", default="cs2dsec")
    ex.add_argument("--checkpoint")
    ex.add_argument("--torch-checkpoint")
    ex.add_argument("--output", default=None,
                    help="logit stream (fusion/image/events/isr)")
    ex.add_argument("--image-only", action="store_true",
                    help="export the image-stream-only forward")
    ex.add_argument("--batch", type=int, default=1)
    ex.add_argument("--height", type=int, default=440)
    ex.add_argument("--width", type=int, default=640)
    ex.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ex.add_argument("--set", nargs="*", help="config dotted overrides")
    ex.add_argument("--verify", action="store_true",
                    help="reload the artifact and compare against the live model")
    ex.set_defaults(func=build_export)

    rn = sub.add_parser("run", help="deserialize + run an artifact")
    rn.add_argument("artifact")
    rn.set_defaults(func=run_artifact)

    args = ap.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
