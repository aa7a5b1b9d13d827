"""FCOS losses (classification / IoU regression / centerness).

Parity target: reference ``fcos_core/modeling/rpn/fcos/loss.py:168-230``:
  * sigmoid focal loss summed over every (location, class), divided by
    (num_pos + batch_size) — the reference's zero-guard normaliser;
  * centerness-weighted IoU loss over positive locations;
  * BCE-with-logits centerness loss (mean over positives).

The reference flattens per level then gathers positives with dynamic shapes;
here everything stays fixed-shape: positives are a boolean mask over the
concatenated (B*L,) location axis and reductions are mask-weighted.
"""

from typing import Sequence

import jax.numpy as jnp

from ...ops.focal_loss import sigmoid_focal_loss
from ...ops.iou_loss import iou_loss
from .targets import centerness_targets, compute_targets, expand_soi


def _flatten_levels(maps: Sequence[jnp.ndarray], channels: int) -> jnp.ndarray:
    """list of (B, H, W, C) -> (B * sum(HW), C), level-major like the
    reference's cat of per-level flattens (loss.py:191-202)."""
    return jnp.concatenate(
        [m.reshape(m.shape[0], -1, channels) for m in maps], axis=1
    ).reshape(-1, channels)


def fcos_losses(
    locations: Sequence[jnp.ndarray],
    box_cls: Sequence[jnp.ndarray],
    box_regression: Sequence[jnp.ndarray],
    centerness: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,   # (B, G, 4)
    gt_labels: jnp.ndarray,  # (B, G)
    gt_mask: jnp.ndarray,    # (B, G)
    gamma: float = 2.0,
    alpha: float = 0.25,
):
    num_classes = box_cls[0].shape[-1]
    batch = box_cls[0].shape[0]
    num_points = [loc.shape[0] for loc in locations]
    locs_all = jnp.concatenate(locations, axis=0)
    soi = expand_soi(num_points)

    labels, reg_targets = compute_targets(locs_all, soi, gt_boxes, gt_labels, gt_mask)
    labels = labels.reshape(-1)
    reg_targets = reg_targets.reshape(-1, 4)

    cls_flat = _flatten_levels(box_cls, num_classes)
    reg_flat = _flatten_levels(box_regression, 4)
    ctr_flat = _flatten_levels(centerness, 1)[:, 0]

    pos = labels > 0
    num_pos = jnp.sum(pos.astype(jnp.float32))

    cls_loss = sigmoid_focal_loss(cls_flat, labels, gamma, alpha) / (num_pos + batch)

    ctr_targets = centerness_targets(reg_targets)
    reg_loss = iou_loss(reg_flat, reg_targets, weight=ctr_targets, valid_mask=pos)

    # BCE-with-logits, mean over positives (zero-safe)
    bce = (
        jnp.maximum(ctr_flat, 0)
        - ctr_flat * ctr_targets
        + jnp.log1p(jnp.exp(-jnp.abs(ctr_flat)))
    )
    ctr_loss = jnp.sum(bce * pos) / jnp.maximum(num_pos, 1.0)

    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)
    ctr_loss = jnp.where(num_pos > 0, ctr_loss, 0.0)

    return {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss,
        "loss_centerness": ctr_loss,
    }
