"""RetinaNet head/loss/inference.

Parity target: reference ``fcos_core/modeling/rpn/retinanet/retinanet.py:13-151``
(+ loss.py, inference.py): shared 4-conv towers WITHOUT norm, A = ratios x
scales_per_octave anchors per cell, IoU matcher (fg 0.5 / bg 0.4), sigmoid
focal loss normalised by positives, smooth-L1 box regression on
Faster-RCNN-encoded deltas, per-level topk + per-class NMS inference.
"""

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.focal_loss import sigmoid_focal_loss
from ..structures.boxes import box_iou, encode_boxes
from .layers import Conv


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    num_classes: int = 81
    num_convs: int = 4
    prior_prob: float = 0.01
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    strides: tuple = (8, 16, 32, 64, 128)
    octave: float = 2.0
    scales_per_octave: int = 3
    fg_iou: float = 0.5
    bg_iou: float = 0.4
    loss_gamma: float = 2.0
    loss_alpha: float = 0.25
    bbox_reg_weight: float = 4.0
    bbox_reg_beta: float = 0.11

    @property
    def num_anchors(self):
        return len(self.aspect_ratios) * self.scales_per_octave

    @staticmethod
    def from_cfg(cfg):
        r = cfg.MODEL.RETINANET
        return RetinaNetConfig(
            num_classes=r.NUM_CLASSES,
            num_convs=r.NUM_CONVS,
            prior_prob=r.PRIOR_PROB,
            anchor_sizes=tuple(r.ANCHOR_SIZES),
            aspect_ratios=tuple(r.ASPECT_RATIOS),
            strides=tuple(r.ANCHOR_STRIDES),
            octave=r.OCTAVE,
            scales_per_octave=r.SCALES_PER_OCTAVE,
            fg_iou=r.FG_IOU_THRESHOLD,
            bg_iou=r.BG_IOU_THRESHOLD,
            loss_gamma=r.LOSS_GAMMA,
            loss_alpha=r.LOSS_ALPHA,
            bbox_reg_weight=r.BBOX_REG_WEIGHT,
            bbox_reg_beta=r.BBOX_REG_BETA,
        )


class RetinaNetHead(nn.Module):
    cfg: RetinaNetConfig
    in_channels: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features):
        c = self.cfg
        num_fg = c.num_classes - 1
        na = c.num_anchors
        bias_value = -math.log((1 - c.prior_prob) / c.prior_prob)
        logits, bbox_reg = [], []
        # towers are conv+relu (no GN) in the reference retinanet.py:36-56
        cls_convs = [
            Conv(self.in_channels, 3, dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(c.num_convs)
        ]
        box_convs = [
            Conv(self.in_channels, 3, dtype=self.dtype, name=f"box_conv{i}")
            for i in range(c.num_convs)
        ]
        cls_logits = Conv(
            na * num_fg, 3, dtype=self.dtype,
            bias_init=nn.initializers.constant(bias_value), name="cls_logits",
        )
        bbox_pred = Conv(na * 4, 3, dtype=self.dtype, name="bbox_pred")
        for f in features:
            ct = f
            bt = f
            for conv in cls_convs:
                ct = nn.relu(conv(ct))
            for conv in box_convs:
                bt = nn.relu(conv(bt))
            logits.append(cls_logits(ct).astype(jnp.float32))
            bbox_reg.append(bbox_pred(bt).astype(jnp.float32))
        return logits, bbox_reg


def matcher_assign(ious, fg_thresh, bg_thresh, allow_low_quality=True):
    """Reference Matcher semantics (modeling/matcher.py): per-anchor best
    gt; < bg -> -1 (background), in [bg, fg) -> -2 (ignored); low-quality
    matches force each gt's best anchor positive. Returns matched gt index
    (or -1 / -2)."""
    vals = jnp.max(ious, axis=1)
    idx = jnp.argmax(ious, axis=1)
    matches = jnp.where(vals >= fg_thresh, idx, -1)
    matches = jnp.where((vals >= bg_thresh) & (vals < fg_thresh), -2, matches)
    if allow_low_quality:
        best_per_gt = jnp.max(ious, axis=0)  # (G,)
        is_best = ious >= jnp.maximum(best_per_gt[None, :], 1e-5)
        force = jnp.any(is_best, axis=1)
        matches = jnp.where(force, idx, matches)
    return matches


def smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def retinanet_losses(cfg: RetinaNetConfig, anchors_levels, box_cls,
                     box_regression, gt_boxes, gt_labels, gt_mask):
    num_fg = cfg.num_classes - 1
    anchors_cat = jnp.concatenate(anchors_levels, axis=0)

    def assign_one(boxes, labels, mask):
        ious = box_iou(anchors_cat, boxes, plus_one=True)
        ious = ious * mask[None, :]
        matches = matcher_assign(ious, cfg.fg_iou, cfg.bg_iou)
        has_gt = jnp.any(mask)
        matches = jnp.where(has_gt, matches, -1)
        cls = jnp.where(matches >= 0, jnp.take(labels, jnp.maximum(matches, 0)), 0)
        cls = jnp.where(matches == -2, -1, cls)  # ignored
        matched_boxes = jnp.take(boxes, jnp.maximum(matches, 0), axis=0)
        reg = encode_boxes(matched_boxes, anchors_cat)
        return cls.astype(jnp.int32), reg

    labels, reg_targets = jax.vmap(assign_one)(gt_boxes, gt_labels, gt_mask)

    cls_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, num_fg) for m in box_cls], axis=1
    ).reshape(-1, num_fg)
    reg_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, 4) for m in box_regression], axis=1
    ).reshape(-1, 4)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_targets.reshape(-1, 4)

    pos = labels_flat > 0
    valid = labels_flat >= 0
    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

    cls_loss = sigmoid_focal_loss(
        cls_flat, labels_flat, cfg.loss_gamma, cfg.loss_alpha, valid_mask=valid
    ) / jnp.maximum(num_pos + cls_flat.shape[0] / 1000.0, 1.0)

    reg_loss = jnp.sum(
        jnp.sum(smooth_l1(reg_flat - reg_t_flat, cfg.bbox_reg_beta), axis=1)
        * pos
    ) / (num_pos * 4.0) * cfg.bbox_reg_weight

    return {"loss_retina_cls": cls_loss, "loss_retina_reg": reg_loss}
