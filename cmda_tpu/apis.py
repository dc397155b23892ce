"""Single-image inference API (reference mmseg/apis/inference.py).

The smallest unit of "load a checkpoint, segment one image": the
reference's ``init_segmentor`` / ``inference_segmentor`` /
``show_result_pyplot`` (mmseg/apis/inference.py:15-136) without the
dataset/runner plumbing.

    from cmda_tpu.apis import init_segmentor, inference_segmentor
    seg = init_segmentor("cs2dz", checkpoint="work_dirs/.../iter_40000")
    pred = inference_segmentor(seg, "night.png")        # [H, W] int32
    inference_segmentor(seg, "night.png", out_file="panel.png")

For image-only input the second modality (ISR for cs2dz, simulated
events for cs2dsec checkpoints run without a recording) is computed
on the fly from the image itself with the config's target ISR
parameters — the reference's DarkZurich protocol (dark_zurich_ic.py
night_isr on-the-fly ISR).
"""
from __future__ import annotations

import numpy as np

from . import config as C
from .data.host_isr import (host_image_change, normalize_image, open_rgb,
                            pick_shift_direction)


class Segmentor:
    """A checkpoint-loaded model with a shape-cached jitted forward."""

    def __init__(self, cfg: "C.RunConfig", state, output: str = "fusion",
                 use_teacher: bool = False):
        from .uda.dacs import DACSTrainer
        self.cfg = cfg
        self.trainer = DACSTrainer(cfg)
        self.state = state
        self.output = output
        self.use_teacher = use_teacher
        self._jitted = {}

    @property
    def model(self):
        return self.trainer.model

    def _infer_fn(self, key):
        import jax
        import jax.numpy as jnp
        if key in self._jitted:
            return self._jitted[key]
        params = (self.state.ema_params if self.use_teacher
                  else self.state.params)
        variables = {"params": params, "batch_stats": self.state.batch_stats}
        output, with_second = key

        @jax.jit
        def fn(image, second):
            if output == "image" or not with_second:
                logits = self.model.apply(variables, image, None, None,
                                          mode="no_fusion", output="image")
            elif output == "isr":
                logits = self.model.apply(variables, image, None, second,
                                          mode="no_fusion", output="isr")
            else:
                logits = self.model.apply(variables, image, second, None,
                                          mode="default", output=output)
            return logits, jnp.argmax(logits, axis=-1)

        self._jitted[key] = fn
        return fn

    def __call__(self, image: np.ndarray, second: np.ndarray | None = None,
                 output: str | None = None):
        """Normalized [H,W,3] image (+ optional second modality) ->
        (logits [H,W,19], pred [H,W]). Pads to a /32 multiple for the
        backbone strides and crops the logits back."""
        import jax.numpy as jnp
        output = output or self.output
        h, w = image.shape[:2]
        ph, pw = (-h) % 32, (-w) % 32
        img = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        sec = (np.pad(second, ((0, ph), (0, pw), (0, 0)), mode="reflect")
               if second is not None else np.zeros_like(img))
        fn = self._infer_fn((output, second is not None))
        logits, pred = fn(jnp.asarray(img)[None], jnp.asarray(sec)[None])
        return (np.asarray(logits)[0, :h, :w],
                np.asarray(pred)[0, :h, :w].astype(np.int32))


def init_segmentor(config="cs2dz", checkpoint: str | None = None,
                   torch_checkpoint: str | None = None,
                   output: str | None = None, use_teacher: bool = False,
                   overrides=()) -> Segmentor:
    """Build a Segmentor from a preset name (or RunConfig) + checkpoint.

    ``checkpoint`` is an orbax dir saved by the train loop;
    ``torch_checkpoint`` a reference ``iter_40000.pth`` (converted via
    utils/torch_import, prefixes revised as reference tools/test.py:165-169).
    Default output stream: 'fusion' for cs2dsec, 'image' for cs2dz (the
    reference's test defaults, encoder_decoder.py:914-918)."""
    import jax
    from .uda.dacs import DACSTrainer

    cfg = config
    if isinstance(config, str):
        cfg = {"cs2dsec": C.cs2dsec_image_events_b5,
               "cs2dz": C.cs2dz_image_rawisr_b5,
               "tiny": C.tiny_test_config}[config]()
    cfg = C.apply_overrides(cfg, list(overrides))
    trainer = DACSTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed))
    if checkpoint:
        from .train.loop import load_checkpoint
        state = load_checkpoint(state, checkpoint)
    elif torch_checkpoint:
        from .models.mit import MIT_VARIANTS
        from .utils import torch_import as TI
        conv = TI.convert_fusion_checkpoint(
            TI.load_torch_file(torch_checkpoint),
            depths=tuple(MIT_VARIANTS[cfg.model.backbone].depths),
            fusion=cfg.model.fusion, fusion_isr=cfg.model.fusion_isr)
        params = TI.merge_pretrained(state.params, conv["params"])
        bstats = TI.merge_pretrained(state.batch_stats,
                                     conv.get("batch_stats", {}))
        state = state.replace(
            params=params, batch_stats=bstats,
            ema_params=jax.tree.map(lambda x: x.copy(), params))
    if output is None:
        output = ("fusion" if cfg.model.train_type.startswith("cs2dsec")
                  else "image")
    return Segmentor(cfg, state, output=output, use_teacher=use_teacher)


def inference_segmentor(segmentor: Segmentor, image, second=None,
                        out_file: str | None = None,
                        opacity: float | None = None):
    """Segment one image file (or pre-normalized array).

    When ``second`` is None and the selected stream needs a second
    modality, the ISR is computed on the fly from the image with the
    config's target ISR parameters. Returns the [H,W] int32 prediction;
    with ``out_file`` also writes an image|second|pred panel
    (reference show_result_pyplot / base.py:745-837)."""
    d = segmentor.cfg.data
    if isinstance(image, str):
        pil = open_rgb(image)
        arr = normalize_image(pil)
        if second is None and segmentor.output != "image":
            p = d.target_isr
            isr = host_image_change(
                pil, val_range=tuple(p.val_range), threshold=p.threshold,
                clip_range=p.clip_range, shift_pixel=p.shift_pixel,
                shift_direction=pick_shift_direction(d.shift_type, 0, 0))
            second = np.repeat(isr[..., None], 3, axis=-1)
    else:
        arr = np.asarray(image, np.float32)
    _, pred = segmentor(arr, second)
    if out_file:
        from .utils.visualization import show_result
        show_result(arr, pred, events=second, out_path=out_file,
                    opacity=opacity)
    return pred
