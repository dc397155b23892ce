"""Host-side (numpy/PIL) ISR — used by the input pipeline workers.

Same math as cmda_tpu.ops.isr (the jnp/device implementation); golden-tested
against it. Mirrors reference mmseg/datasets/utils.py:87-152 exactly,
including PIL 'L' grayscale and the concatenation border-replication shifts.
"""
from __future__ import annotations

import numpy as np

IMAGENET_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


def _norm_range(x, lo, hi):
    xmin, xmax = x.min(), x.max()
    return (x - xmin) / (xmax - xmin + 1e-8) * (hi - lo) + lo


def host_get_ic(front, now, val_range, threshold, clip_range):
    lo, hi = float(val_range[0]), float(val_range[1])
    a = np.log(front.astype(np.float32) / 255.0 * (hi - lo) + lo)
    b = np.log(now.astype(np.float32) / 255.0 * (hi - lo) + lo)
    d = b - a
    span = np.log(hi) - np.log(lo)
    thr, clip = span * threshold, span * clip_range
    d[np.abs(d) <= thr] = 0.0
    pos = np.clip(np.maximum(d, 0.0), 0.0, clip)
    pos = _norm_range(pos, 0.0, 1.0)
    neg = np.clip(np.minimum(d, 0.0), -clip, 0.0)
    neg = _norm_range(neg, -1.0, 0.0)
    return pos + neg


def _shift(gray, s, direction):
    h, w = gray.shape
    if direction == "right":
        return np.concatenate([gray[:, :s], gray[:, : w - s]], axis=1)
    if direction == "left":
        return np.concatenate([gray[:, s:], gray[:, w - s:]], axis=1)
    if direction == "down":
        return np.concatenate([gray[:s, :], gray[: h - s, :]], axis=0)
    assert direction == "up"
    return np.concatenate([gray[s:, :], gray[h - s:, :]], axis=0)


def host_image_change_numpy(gray, *, val_range, threshold, clip_range,
                            shift_pixel=1, shift_direction="rightdown"):
    """Pure-numpy ISR core on an (H, W) float32 grayscale array.

    Kept native-free so tests can pit the C++ kernel against it
    (the independent oracle — see tests/test_native.py)."""
    def ic(now):
        return host_get_ic(gray, now, val_range, threshold, clip_range)

    s = shift_pixel
    if shift_direction == "all":
        return (ic(_shift(gray, s, "up")) + ic(_shift(gray, s, "left"))
                + ic(_shift(gray, s, "down")) + ic(_shift(gray, s, "right"))) / 4.0
    row = "left" if "left" in shift_direction else "right"
    col = "up" in shift_direction and "up" or "down"
    return ic(_shift(gray, s, row)) / 2.0 + ic(_shift(gray, s, col)) / 2.0


def host_image_change(pil_image, *, val_range, threshold, clip_range,
                      shift_pixel=1, shift_direction="rightdown"):
    """PIL image -> ISR float32 (H, W) in [-1, 1].

    Uses the C++ ingest kernel when built (bit-compatible; tests/test_native)."""
    from .. import native
    if native.available():
        if pil_image.mode == "RGB":
            gray_n = native.grayscale(np.asarray(pil_image, np.uint8))
        else:
            gray_n = np.asarray(pil_image.convert("L"), np.float32)
        return native.isr(gray_n, val_range=val_range, threshold=threshold,
                          clip_range=clip_range, shift_pixel=shift_pixel,
                          direction=shift_direction)
    gray = np.array(pil_image.convert("L"), dtype=np.float32)
    return host_image_change_numpy(
        gray, val_range=val_range, threshold=threshold, clip_range=clip_range,
        shift_pixel=shift_pixel, shift_direction=shift_direction)


def pick_shift_direction(shift_type: str, a: int, b: int) -> str:
    """The reference's deterministic-from-crop 'random' direction
    (cityscapes_ic.py:232-234 / dsec.py:253-255): direct[a % 2][b % 2]."""
    if shift_type != "random":
        return shift_type
    direct = [["leftdown", "leftup"], ["rightdown", "rightup"]]
    return direct[a % 2][b % 2]


def normalize_image(pil_image) -> np.ndarray:
    """RGB PIL -> normalized float32 HWC (in place on the fresh conversion
    buffer — this runs per sample per step on the loader's single core)."""
    arr = np.asarray(pil_image, dtype=np.float32)
    arr -= IMAGENET_MEAN
    arr /= IMAGENET_STD
    return arr


def open_rgb(path: str):
    """Open an RGB frame as a PIL Image, decoding PNGs via libpng in C++
    when available (GIL-free; SURVEY §2.9 host decode path).

    The C++ path is used only for plain 8-bit grayscale/truecolor PNGs
    (IHDR color type 0/2), where libpng's PNG_FORMAT_RGB expansion is
    pixel-identical to PIL ``convert('RGB')``. Palette, alpha, and 16-bit
    images fall back to PIL: libpng would alpha-composite / rescale where
    PIL drops alpha, so they are not interchangeable."""
    from PIL import Image
    from .. import native
    if path.endswith(".png") and native.png_available():
        try:
            with open(path, "rb") as f:
                data = f.read()
            # IHDR is the first chunk: bit depth at byte 24, color type at 25
            if (len(data) > 26 and data[24] == 8 and data[25] in (0, 2)):
                return Image.fromarray(native.png_decode(data))
        except (OSError, ValueError):
            pass
    return Image.open(path).convert("RGB")
