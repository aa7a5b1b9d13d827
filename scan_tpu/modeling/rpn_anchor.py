"""Anchor-based RPN (Faster R-CNN proposal network), fixed-shape.

Parity target: reference ``fcos_core/modeling/rpn/rpn.py:16-198`` +
``rpn/loss.py`` + ``rpn/inference.py``: single 3x3 conv head with per-anchor
objectness and 4-delta regression, IoU matcher (0.7/0.3) with low-quality
matches, balanced 256-sample binary objectness loss, smooth-L1 on positives,
per-level top-k + NMS proposal selection.

TPU-native: proposals are a fixed (B, POST_NMS_TOP_N, 4) array with a
validity mask. Random balanced sampling is replaced by deterministic
top-score selection capped at the configured counts (the reference samples
uniformly; at convergence the estimator difference is negligible and it
keeps the step shape-static).
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import nms_keep_mask
from ..structures.boxes import box_iou, decode_boxes, encode_boxes
from .layers import Conv, normal_init
from .retinanet import matcher_assign, smooth_l1


@dataclasses.dataclass(frozen=True)
class RPNConfig:
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    strides: tuple = (4, 8, 16, 32, 64)
    fg_iou: float = 0.7
    bg_iou: float = 0.3
    batch_per_image: int = 256
    positive_fraction: float = 0.5
    pre_nms_top_n: int = 2000
    post_nms_top_n: int = 1000
    nms_thresh: float = 0.7
    min_size: float = 0.0

    @property
    def num_anchors(self):
        return len(self.aspect_ratios)

    @staticmethod
    def from_cfg(cfg, is_train: bool):
        r = cfg.MODEL.RPN
        strides = tuple(r.ANCHOR_STRIDE) if len(r.ANCHOR_STRIDE) > 1 else (
            tuple(r.ANCHOR_STRIDE) * len(r.ANCHOR_SIZES)
            if r.USE_FPN else tuple(r.ANCHOR_STRIDE)
        )
        return RPNConfig(
            anchor_sizes=tuple(r.ANCHOR_SIZES),
            aspect_ratios=tuple(r.ASPECT_RATIOS),
            strides=strides,
            fg_iou=r.FG_IOU_THRESHOLD,
            bg_iou=r.BG_IOU_THRESHOLD,
            batch_per_image=r.BATCH_SIZE_PER_IMAGE,
            positive_fraction=r.POSITIVE_FRACTION,
            pre_nms_top_n=r.PRE_NMS_TOP_N_TRAIN if is_train else r.PRE_NMS_TOP_N_TEST,
            post_nms_top_n=r.POST_NMS_TOP_N_TRAIN if is_train else r.POST_NMS_TOP_N_TEST,
            nms_thresh=r.NMS_THRESH,
            min_size=r.MIN_SIZE,
        )


class RPNHead(nn.Module):
    """SingleConvRPNHead (reference rpn.py:60-87)."""

    num_anchors: int
    in_channels: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features):
        conv = Conv(self.in_channels, 3, kernel_init=normal_init(0.01),
                    dtype=self.dtype, name="conv")
        logits_conv = Conv(self.num_anchors, 1, kernel_init=normal_init(0.01),
                           dtype=self.dtype, name="cls_logits")
        pred_conv = Conv(self.num_anchors * 4, 1, kernel_init=normal_init(0.01),
                         dtype=self.dtype, name="bbox_pred")
        logits, bbox_reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(logits_conv(t).astype(jnp.float32))
            bbox_reg.append(pred_conv(t).astype(jnp.float32))
        return logits, bbox_reg


def rpn_losses(cfg: RPNConfig, anchors_levels, objectness, box_regression,
               gt_boxes, gt_mask):
    anchors_cat = jnp.concatenate(anchors_levels, axis=0)

    def assign_one(boxes, mask):
        ious = box_iou(anchors_cat, boxes, plus_one=True) * mask[None, :]
        matches = matcher_assign(ious, cfg.fg_iou, cfg.bg_iou)
        matches = jnp.where(jnp.any(mask), matches, -1)
        matched_boxes = jnp.take(boxes, jnp.maximum(matches, 0), axis=0)
        reg = encode_boxes(matched_boxes, anchors_cat)
        return matches, reg

    matches, reg_targets = jax.vmap(assign_one)(gt_boxes, gt_mask)

    obj_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1) for m in objectness], axis=1
    ).reshape(-1)
    reg_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, 4) for m in box_regression], axis=1
    ).reshape(-1, 4)
    matches_flat = matches.reshape(-1)
    reg_t_flat = reg_targets.reshape(-1, 4)

    pos = matches_flat >= 0
    neg = matches_flat == -1
    n_pos = jnp.sum(pos.astype(jnp.float32))
    n_neg_want = cfg.batch_per_image - jnp.minimum(
        n_pos, cfg.batch_per_image * cfg.positive_fraction
    )
    # deterministic balanced subset: all positives (capped), hardest negs
    neg_scores = jnp.where(neg, obj_flat, -jnp.inf)
    k = min(cfg.batch_per_image, neg_scores.shape[0])
    _, hard_neg_idx = jax.lax.top_k(neg_scores, k)
    neg_sel = jnp.zeros_like(neg).at[hard_neg_idx].set(True) & neg
    rank = jnp.cumsum(neg_sel) - 1
    neg_sel = neg_sel & (rank < n_neg_want)

    sampled = pos | neg_sel
    tgt = pos.astype(jnp.float32)
    bce = (
        jnp.maximum(obj_flat, 0)
        - obj_flat * tgt
        + jnp.log1p(jnp.exp(-jnp.abs(obj_flat)))
    )
    denom = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)
    obj_loss = jnp.sum(bce * sampled) / denom

    reg_loss = jnp.sum(
        jnp.sum(smooth_l1(reg_flat - reg_t_flat, 1.0 / 9), axis=1) * pos
    ) / jnp.maximum(denom, 1.0)

    return {"loss_objectness": obj_loss, "loss_rpn_box_reg": reg_loss}


def rpn_proposals(cfg: RPNConfig, anchors_levels, objectness, box_regression,
                  image_sizes, use_pallas_nms=False):
    """Fixed-shape proposal selection. Returns dict(boxes (B,N,4),
    scores (B,N), valid (B,N)) with N = post_nms_top_n."""

    def single(obj_levels, reg_levels, image_size):
        boxes_all, scores_all, valid_all = [], [], []
        for anchors, obj, reg in zip(anchors_levels, obj_levels, reg_levels):
            scores = jax.nn.sigmoid(obj.reshape(-1))
            k = min(cfg.pre_nms_top_n, scores.shape[0])
            top_scores, idx = jax.lax.top_k(scores, k)
            props = decode_boxes(reg.reshape(-1, 4)[idx], anchors[idx])
            h = image_size[0].astype(jnp.float32)
            w = image_size[1].astype(jnp.float32)
            props = jnp.stack(
                [
                    jnp.clip(props[:, 0], 0, w - 1),
                    jnp.clip(props[:, 1], 0, h - 1),
                    jnp.clip(props[:, 2], 0, w - 1),
                    jnp.clip(props[:, 3], 0, h - 1),
                ],
                axis=1,
            )
            ok = (
                (props[:, 2] - props[:, 0] >= cfg.min_size)
                & (props[:, 3] - props[:, 1] >= cfg.min_size)
            )
            keep = nms_keep_mask(
                props, top_scores, ok, cfg.nms_thresh,
                use_pallas=use_pallas_nms,
            )
            boxes_all.append(props)
            scores_all.append(jnp.where(keep, top_scores, -1.0))
            valid_all.append(keep)
        boxes = jnp.concatenate(boxes_all, 0)
        scores = jnp.concatenate(scores_all, 0)
        valid = jnp.concatenate(valid_all, 0)
        n = min(cfg.post_nms_top_n, scores.shape[0])
        top_scores, idx = jax.lax.top_k(scores, n)
        return dict(
            boxes=boxes[idx], scores=jnp.maximum(top_scores, 0.0),
            valid=top_scores > 0,
        )

    obj_flat = [m.reshape(m.shape[0], -1, 1) for m in objectness]
    reg_flat = [m.reshape(m.shape[0], -1, 4) for m in box_regression]
    return jax.vmap(single)(obj_flat, reg_flat, image_sizes)
