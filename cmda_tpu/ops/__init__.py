from .resize import resize_bilinear, resize_nearest
from .normalize import (
    IMAGENET_MEAN, IMAGENET_STD, normalize_to_range, denorm_image, renorm_image,
)
from .isr import get_ic, image_change_from_gray, pil_grayscale, image_to_isr
from .voxel import events_to_voxel_grid, events_norm
from .losses import weighted_cross_entropy, pixel_accuracy, charbonnier_loss
from .metrics import intersect_and_union, eval_metrics

__all__ = [
    "resize_bilinear", "resize_nearest",
    "IMAGENET_MEAN", "IMAGENET_STD", "normalize_to_range",
    "denorm_image", "renorm_image",
    "get_ic", "image_change_from_gray", "pil_grayscale", "image_to_isr",
    "events_to_voxel_grid", "events_norm",
    "weighted_cross_entropy", "pixel_accuracy", "charbonnier_loss",
    "intersect_and_union", "eval_metrics",
]
