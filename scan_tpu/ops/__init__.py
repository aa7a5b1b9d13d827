from .focal_loss import (
    sigmoid_focal_loss,
    softmax_focal_loss,
    bce_focal_loss,
    binary_adversarial_focal_loss,
)
from .iou_loss import iou_loss
from .locations import compute_locations, compute_locations_level, level_sizes_from_image
from .nms import nms, ml_nms, nms_keep_mask
from .dynamic_conv import dynamic_conv

__all__ = [
    "sigmoid_focal_loss",
    "softmax_focal_loss",
    "bce_focal_loss",
    "binary_adversarial_focal_loss",
    "iou_loss",
    "compute_locations",
    "compute_locations_level",
    "level_sizes_from_image",
    "nms",
    "ml_nms",
    "nms_keep_mask",
    "dynamic_conv",
]
