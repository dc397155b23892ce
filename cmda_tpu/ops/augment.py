"""On-device augmentations for the DACS strong transform + ClassMix.

Replaces the reference's host/GPU mix of kornia + per-sample python loops
(reference mmseg/models/utils/dacs_transforms.py:11-131) with batched jnp ops
that run inside the jitted train step:

  * ``one_mix`` / ``batched_class_mix``: ClassMix blending. The reference
    picks, per sample, a random half (ceil(n/2)) of the classes present in
    the *whole batch* label (a reference quirk — ``torch.unique(labels)`` at
    dacs_transforms.py:104 uses the batch, not the sample) and pastes source
    pixels of those classes onto the target sample.
  * ``color_jitter``: brightness/contrast/saturation/hue jitter with
    per-sample factors U[1-s, 1+s] (hue U[-s, s]), applied on the [0, 1]
    denormalized image, matching kornia.augmentation.ColorJitter
    semantics statistically (exact RNG replay with kornia is impossible).
  * ``gaussian_blur``: reflect-padded separable Gaussian with the reference's
    kernel-size rule ``k = floor(ceil(0.1*dim) - 0.5 + ceil(0.1*dim) % 2)``
    and traced sigma (dacs_transforms.py:81-98).
  * ``cow_masks``: CowMix-style smooth-noise threshold masks
    (reference mmseg/datasets/utils.py:171-200).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .normalize import IMAGENET_MEAN, IMAGENET_STD, denorm_image, renorm_image


# ---------------------------------------------------------------------------
# ClassMix
# ---------------------------------------------------------------------------

def sample_class_half(rng: jax.Array, batch_labels: jax.Array,
                      num_classes: int = 19,
                      ignore_index: int = 255) -> jax.Array:
    """Pick, independently per sample, a random ~half of the label ids
    present in the *batch*.

    Returns a bool matrix [B, num_classes + 1] (last slot = the ignore id,
    which torch.unique also surfaces and can be selected). The present-set
    is computed over the whole batch — a reference quirk
    (``torch.unique(labels)`` at dacs_transforms.py:104 uses the batch) —
    but the ceil(n/2)-subset is drawn independently per sample, matching
    the per-image ``np.random.choice`` at dacs_transforms.py:106-108.
    Selection: rank present ids by iid uniform scores; keep ranks
    < ceil(n_present / 2).
    """
    batch = batch_labels.shape[0]
    ids = jnp.concatenate(
        [jnp.arange(num_classes), jnp.asarray([ignore_index])])
    present = jnp.any(
        batch_labels[..., None] == ids[None, None, None, :], axis=(0, 1, 2))
    n_present = jnp.sum(present)
    k = (n_present + n_present % 2) // 2  # == ceil(n/2)
    scores = jax.random.uniform(rng, (batch,) + ids.shape)
    scores = jnp.where(present[None, :], scores, -jnp.inf)
    # per-sample rank r_bi = number of scores strictly greater than score_bi
    rank = jnp.sum(scores[:, None, :] > scores[:, :, None], axis=2)
    return present[None, :] & (rank < k)


def class_mix_mask(labels: jax.Array, selected: jax.Array,
                   num_classes: int = 19, ignore_index: int = 255) -> jax.Array:
    """Per-pixel bool mask: label id is one of the selected ids. [B, H, W].

    ``selected`` may be [num_classes + 1] (one subset for the batch) or
    [B, num_classes + 1] (per-sample subsets, the reference semantics).
    """
    idx = jnp.where(labels == ignore_index, num_classes, labels)
    idx = jnp.clip(idx, 0, num_classes)
    # compare+any instead of a gather: the [B,HW]-from-[B,C] gather lowers
    # to a ~21 ms scalar-unit op on v5e (r2 profile); the one-hot AND runs
    # on the VPU and fuses
    onehot = idx[..., None] == jnp.arange(selected.shape[-1], dtype=idx.dtype)
    if selected.ndim == 1:
        sel = selected[None, None, None, :]
    else:
        sel = selected[:, None, None, :]
    return jnp.any(onehot & sel, axis=-1)


def one_mix(mask: jax.Array, source: jax.Array, target: jax.Array) -> jax.Array:
    """mask * source + (1 - mask) * target; mask [B, H, W] broadcast."""
    while mask.ndim < source.ndim:
        mask = mask[..., None]
    m = mask.astype(source.dtype)
    return m * source + (1 - m) * target


# ---------------------------------------------------------------------------
# Color jitter (per-sample factors)
# ---------------------------------------------------------------------------

def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe_delta = jnp.where(delta > 0, delta, 1.0)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # select-chains instead of jnp.choose: the 6-way choose lowers to a
    # [6,B,H,W] gather (~36 ms each on v5e, r2 profile); nested where is a
    # fused VPU select
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0,
               jnp.where(i == 1, c1,
               jnp.where(i == 2, c2,
               jnp.where(i == 3, c3,
               jnp.where(i == 4, c4, c5)))))

    rgb = jnp.stack([
        pick(v, q, p, p, t, v),
        pick(t, v, v, q, p, p),
        pick(p, p, t, v, v, q),
    ], axis=-1)
    return rgb


def color_jitter(rng: jax.Array, img01: jax.Array, strength: float = 0.2) -> jax.Array:
    """Jitter a batch of [0,1] NHWC images with per-sample random factors."""
    b = img01.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)
    s = strength
    brightness = jax.random.uniform(kb, (b, 1, 1, 1), minval=1 - s, maxval=1 + s)
    contrast = jax.random.uniform(kc, (b, 1, 1, 1), minval=1 - s, maxval=1 + s)
    saturation = jax.random.uniform(ks, (b, 1, 1, 1), minval=1 - s, maxval=1 + s)
    hue = jax.random.uniform(kh, (b, 1, 1), minval=-s, maxval=s)

    x = jnp.clip(img01 * brightness, 0.0, 1.0)
    gray_mean = jnp.mean(
        x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114,
        axis=(1, 2), keepdims=True)[..., None]
    x = jnp.clip((x - gray_mean) * contrast + gray_mean, 0.0, 1.0)
    gray = (x[..., 0] * 0.299 + x[..., 1] * 0.587 + x[..., 2] * 0.114)[..., None]
    x = jnp.clip(gray + (x - gray) * saturation, 0.0, 1.0)
    hsv = _rgb_to_hsv(x)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + hue) % 1.0)
    return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)


def maybe_color_jitter_normalized(rng: jax.Array, img: jax.Array,
                                  apply: jax.Array, strength: float = 0.2,
                                  mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """Jitter a *normalized* image batch when ``apply`` (traced bool)."""
    jittered = renorm_image(color_jitter(rng, denorm_image(img, mean, std),
                                         strength), mean, std)
    return jnp.where(apply, jittered, img)


# ---------------------------------------------------------------------------
# Gaussian blur
# ---------------------------------------------------------------------------

def reference_blur_kernel_size(dim: int) -> int:
    """k = floor(ceil(0.1*dim) - 0.5 + ceil(0.1*dim) % 2)."""
    c = math.ceil(0.1 * dim)
    return int(math.floor(c - 0.5 + c % 2))


def gaussian_blur(img: jax.Array, sigma: jax.Array,
                  kernel_size: tuple[int, int]) -> jax.Array:
    """Separable reflect-padded Gaussian blur of NHWC, traced sigma."""
    ky, kx = kernel_size

    def kernel_1d(k):
        half = (k - 1) // 2
        xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
        w = jnp.exp(-0.5 * (xs / sigma) ** 2)
        return w / jnp.sum(w)

    wy = kernel_1d(ky)
    wx = kernel_1d(kx)
    c = img.shape[-1]
    x = jnp.pad(img, ((0, 0), ((ky - 1) // 2,) * 2, (0, 0), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(wy[:, None, None, None], (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    x = jnp.pad(x, ((0, 0), (0, 0), ((kx - 1) // 2,) * 2, (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(wx[None, :, None, None], (1, 1, 1, c)),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return x


def maybe_gaussian_blur(img: jax.Array, sigma: jax.Array, apply: jax.Array) -> jax.Array:
    k = (reference_blur_kernel_size(img.shape[1]),
         reference_blur_kernel_size(img.shape[2]))
    return jnp.where(apply, gaussian_blur(img, sigma, k), img)


# ---------------------------------------------------------------------------
# ISR noise (reference mmseg/models/utils/dacs_transforms.py:186-211)
# ---------------------------------------------------------------------------

def add_noise_on_isr(rng: jax.Array, isr: jax.Array,
                     transform_type: str = "noise+blur") -> jax.Array:
    """Degrade an ISR batch [B, H, W, C] in [-1, 1] on device.

    'blur': with p=0.5 (per batch, as in the reference which draws one
    torch.rand(1) per call), 2x average-pool then bilinear-resize back.
    'noise': zero out pixels where |N(0,1)| < U(1.0,1.5) (per-sample
    threshold), then add gaussian noise of intensity U(0.1,0.3) on pixels
    where |N(0,1)| < U(0.4,0.6); clip to [-1, 1].
    """
    b, h, w, c = isr.shape
    k_gate, k_d, k_dm, k_r, k_ri, k_rm, k_rn = jax.random.split(rng, 7)
    out = isr
    if "blur" in transform_type:
        small = jax.lax.reduce_window(
            out, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        from .resize import resize_bilinear
        blurred = resize_bilinear(small, (h, w))
        out = jnp.where(jax.random.uniform(k_gate) < 0.5, blurred, out)
    if "noise" in transform_type:
        shp = (b, 1, 1, 1)
        dis_thr = jax.random.uniform(k_d, shp, minval=1.0, maxval=1.5)
        disappear = jnp.abs(jax.random.normal(k_dm, out.shape)) < dis_thr
        out = out * disappear
        rnd_thr = jax.random.uniform(k_r, shp, minval=0.4, maxval=0.6)
        intensity = jax.random.uniform(k_ri, shp, minval=0.1, maxval=0.3)
        rnd_mask = jnp.abs(jax.random.normal(k_rm, out.shape)) < rnd_thr
        out = out + jax.random.normal(k_rn, out.shape) * intensity * rnd_mask
        out = jnp.clip(out, -1.0, 1.0)
    return out


# ---------------------------------------------------------------------------
# Cow masks (reference mmseg/datasets/utils.py:171-200)
# ---------------------------------------------------------------------------

def cow_masks(rng: jax.Array, batch: int, height: int, width: int,
              log_sigma_range=(math.log(4), math.log(16)), max_sigma: int = 16,
              prop_range=(0.25, 1.0)) -> jax.Array:
    """Smooth-noise threshold masks [B, H, W] bool."""
    kp, ks, kn = jax.random.split(rng, 3)
    p = jax.random.uniform(kp, (batch,), minval=prop_range[0], maxval=prop_range[1])
    threshold_factors = jax.scipy.special.erfinv(2 * p - 1) * math.sqrt(2.0)
    sigmas = jnp.exp(jax.random.uniform(
        ks, (batch,), minval=log_sigma_range[0], maxval=log_sigma_range[1]))
    noise = jax.random.normal(kn, (batch, height, width, 1))

    size = round(max_sigma * 3) * 2 + 1
    xs = jnp.arange(-size, size + 1, dtype=jnp.float32)
    kernels = jnp.exp(-0.5 * xs[None, :] ** 2 / sigmas[:, None] ** 2)
    kernels = kernels / (sigmas[:, None] * math.sqrt(2 * math.pi))
    kw = kernels.shape[1]

    def smooth_one(noise_i, kern):
        x = jnp.pad(noise_i[None], ((0, 0), (0, 0), ((kw - 1) // 2,) * 2, (0, 0)),
                    mode="reflect")
        x = jax.lax.conv_general_dilated(
            x, kern[None, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.pad(x, ((0, 0), ((kw - 1) // 2,) * 2, (0, 0), (0, 0)),
                    mode="reflect")
        x = jax.lax.conv_general_dilated(
            x, kern[:, None, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x[0]

    smooth = jax.vmap(smooth_one)(noise, kernels)
    mean = jnp.mean(smooth, axis=(1, 2, 3), keepdims=True)
    std = jnp.std(smooth, axis=(1, 2, 3), keepdims=True, ddof=1)
    thresholds = threshold_factors[:, None, None, None] * std + mean
    return (smooth <= thresholds)[..., 0]
