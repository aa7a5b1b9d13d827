"""RoI box head (Faster R-CNN second stage), fixed-shape.

Parity target: reference ``fcos_core/modeling/roi_heads/box_head/*`` +
``modeling/poolers.py:11-124``: FPN pooler with the canonical LevelMapper
(k = floor(4 + log2(sqrt(area)/224))), FPN2MLP feature extractor (ROIAlign
7x7 -> 2 FC 1024), FastRCNNPredictor (cls + per-class box deltas), CE +
smooth-L1 training, per-class-NMS postprocessing.

TPU-native: proposals come in as a fixed (B, N, 4) masked array; level
assignment is a one-hot blend over per-level ROIAlign results (each RoI is
pooled from exactly one level, selected by mask — the other levels' pools
are computed but zeroed; with N fixed this stays static and batched).
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.nms import nms_keep_mask
from ..ops.roi_align import roi_align
from ..structures.boxes import box_iou, decode_boxes, encode_boxes
from .retinanet import matcher_assign, smooth_l1


@dataclasses.dataclass(frozen=True)
class RoIBoxConfig:
    num_classes: int = 81
    pooler_resolution: int = 7
    pooler_scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    mlp_dim: int = 1024
    fg_iou: float = 0.5
    bg_iou: float = 0.5
    batch_per_image: int = 512
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_img: int = 100
    bbox_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)

    @staticmethod
    def from_cfg(cfg):
        h = cfg.MODEL.ROI_HEADS
        b = cfg.MODEL.ROI_BOX_HEAD
        return RoIBoxConfig(
            num_classes=b.NUM_CLASSES,
            pooler_resolution=b.POOLER_RESOLUTION,
            pooler_scales=tuple(b.POOLER_SCALES),
            sampling_ratio=b.POOLER_SAMPLING_RATIO or 2,
            mlp_dim=b.MLP_HEAD_DIM,
            fg_iou=h.FG_IOU_THRESHOLD,
            bg_iou=h.BG_IOU_THRESHOLD,
            batch_per_image=h.BATCH_SIZE_PER_IMAGE,
            positive_fraction=h.POSITIVE_FRACTION,
            score_thresh=h.SCORE_THRESH,
            nms_thresh=h.NMS,
            detections_per_img=h.DETECTIONS_PER_IMG,
            bbox_reg_weights=tuple(h.BBOX_REG_WEIGHTS),
        )


def level_map(rois, num_levels, canonical_scale=224, canonical_level=4,
              min_level=2):
    """LevelMapper (reference poolers.py:11-43)."""
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, min_level, min_level + num_levels - 1)
    return (lvl - min_level).astype(jnp.int32)


def fpn_pooler(cfg: RoIBoxConfig, features, rois, batch_indices):
    """Pool each RoI from its assigned FPN level (poolers.py:45-124).

    features: list of NHWC maps; rois: (R, 4); batch_indices: (R,).
    Returns (R, res, res, C).
    """
    num_levels = len(cfg.pooler_scales)
    levels = level_map(rois, num_levels)
    out = None
    for l, (f, s) in enumerate(zip(features, cfg.pooler_scales)):
        pooled = roi_align(
            f, rois, batch_indices, cfg.pooler_resolution, s,
            cfg.sampling_ratio,
        )
        sel = (levels == l).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


class RoIBoxHead(nn.Module):
    """FPN2MLP extractor + FastRCNNPredictor."""

    cfg: RoIBoxConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pooled):
        c = self.cfg
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(c.mlp_dim, name="fc6")(x))
        x = nn.relu(nn.Dense(c.mlp_dim, name="fc7")(x))
        cls_logit = nn.Dense(
            c.num_classes, kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        bbox_pred = nn.Dense(
            c.num_classes * 4, kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return cls_logit, bbox_pred


def roi_box_losses(cfg: RoIBoxConfig, cls_logits, bbox_pred, proposals,
                   prop_valid, matched_labels, reg_targets):
    """CE + smooth-L1 over the (fixed) proposal set."""
    n = cls_logits.shape[0]
    valid = prop_valid & (matched_labels >= 0)
    pos = matched_labels > 0

    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(
        logp, jnp.maximum(matched_labels, 0)[:, None], axis=1
    )[:, 0]
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    cls_loss = jnp.sum(ce * valid) / denom

    # per-class box deltas: select the matched class's 4 columns
    bp = bbox_pred.reshape(n, cfg.num_classes, 4)
    sel = jnp.take_along_axis(
        bp, jnp.maximum(matched_labels, 0)[:, None, None].repeat(4, 2), axis=1
    )[:, 0, :]
    reg_loss = jnp.sum(
        jnp.sum(smooth_l1(sel - reg_targets, 1.0), axis=1) * pos
    ) / denom
    return {"loss_classifier": cls_loss, "loss_box_reg": reg_loss}


def match_proposals(cfg: RoIBoxConfig, proposals, prop_valid, gt_boxes,
                    gt_labels, gt_mask):
    """Second-stage target assignment (box_head/loss.py semantics).

    Returns (matched_labels, reg_targets, matched_idx) — matched_idx is the
    GT row each positive proposal matched (-1 for background/ignored), used
    by the mask/keypoint branches to gather their targets.
    """

    def one(props, pv, boxes, labels, mask):
        ious = box_iou(props, boxes, plus_one=True) * mask[None, :]
        matches = matcher_assign(
            ious, cfg.fg_iou, cfg.bg_iou, allow_low_quality=False
        )
        matches = jnp.where(jnp.any(mask) & pv, matches, -1)
        cls = jnp.where(matches >= 0, jnp.take(labels, jnp.maximum(matches, 0)), 0)
        cls = jnp.where(matches == -2, -1, cls)
        matched_boxes = jnp.take(boxes, jnp.maximum(matches, 0), axis=0)
        reg = encode_boxes(matched_boxes, props, cfg.bbox_reg_weights)
        idx = jnp.where(cls > 0, jnp.maximum(matches, 0), -1)
        return cls.astype(jnp.int32), reg, idx.astype(jnp.int32)

    return jax.vmap(one)(proposals, prop_valid, gt_boxes, gt_labels, gt_mask)


def roi_box_postprocess(cfg: RoIBoxConfig, cls_logits, bbox_pred, proposals,
                        prop_valid, image_sizes, use_pallas_nms=False):
    """Per-image: softmax scores, per-class decode, threshold, per-class
    NMS, top detections (roi_heads/box_head/inference.py)."""
    nc = cfg.num_classes

    def single(logits, preds, props, pv, image_size):
        n = logits.shape[0]
        probs = jax.nn.softmax(logits, axis=-1)  # (N, C)
        boxes_all = decode_boxes(
            preds.reshape(n * nc, 4),
            jnp.repeat(props, nc, axis=0),
            cfg.bbox_reg_weights,
        ).reshape(n, nc, 4)
        # skip background column 0
        fg_scores = probs[:, 1:].reshape(-1)
        fg_boxes = boxes_all[:, 1:, :].reshape(-1, 4)
        fg_labels = jnp.tile(jnp.arange(1, nc), n)
        fg_valid = jnp.repeat(pv, nc - 1) & (fg_scores > cfg.score_thresh)

        h = image_size[0].astype(jnp.float32)
        w = image_size[1].astype(jnp.float32)
        fg_boxes = jnp.stack(
            [
                jnp.clip(fg_boxes[:, 0], 0, w - 1),
                jnp.clip(fg_boxes[:, 1], 0, h - 1),
                jnp.clip(fg_boxes[:, 2], 0, w - 1),
                jnp.clip(fg_boxes[:, 3], 0, h - 1),
            ],
            axis=1,
        )
        cap = min(1024, fg_scores.shape[0])
        ranked = jnp.where(fg_valid, fg_scores, -1.0)
        top_scores, idx = jax.lax.top_k(ranked, cap)
        boxes = fg_boxes[idx]
        labels = fg_labels[idx]
        valid = top_scores > 0
        keep = nms_keep_mask(
            boxes, top_scores, valid, cfg.nms_thresh, labels=labels,
            use_pallas=use_pallas_nms,
        )
        final = jnp.where(keep, top_scores, -1.0)
        nd = min(cfg.detections_per_img, final.shape[0])
        out_scores, out_idx = jax.lax.top_k(final, nd)
        ov = out_scores > 0
        return dict(
            boxes=boxes[out_idx],
            scores=jnp.maximum(out_scores, 0.0),
            labels=jnp.where(ov, labels[out_idx], 0),
            valid=ov,
        )

    return jax.vmap(single)(cls_logits, bbox_pred, proposals, prop_valid,
                            image_sizes)


# ---------------------------------------------------------------------- #
# mask head (Mask R-CNN branch)
# ---------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class RoIMaskConfig:
    """Reference ``modeling/roi_heads/mask_head/*``: FPN pooler (14x14),
    MaskRCNNFPNFeatureExtractor (4x [conv3x3 256 + relu]), deconv 2x
    upsample + per-class 1x1 mask logits, BCE loss on positive proposals."""

    num_classes: int = 81
    pooler_resolution: int = 14
    pooler_scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    conv_layers: tuple = (256, 256, 256, 256)

    @staticmethod
    def from_cfg(cfg):
        m = cfg.MODEL.ROI_MASK_HEAD
        return RoIMaskConfig(
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            pooler_resolution=m.POOLER_RESOLUTION,
            pooler_scales=tuple(m.POOLER_SCALES),
            sampling_ratio=m.POOLER_SAMPLING_RATIO or 2,
            conv_layers=tuple(m.CONV_LAYERS),
        )


class RoIMaskHead(nn.Module):
    cfg: RoIMaskConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i, ch in enumerate(self.cfg.conv_layers):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=nn.initializers.variance_scaling(
                            2.0, "fan_out", "normal"),
                        name=f"mask_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.cfg.conv_layers[-1], (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="conv5_mask")(x)
        x = nn.relu(x)
        logits = nn.Conv(self.cfg.num_classes, (1, 1), dtype=self.dtype,
                         name="mask_fcn_logits")(x)
        return logits.astype(jnp.float32)


def roi_mask_loss(mask_logits, matched_labels, mask_targets, pos_mask):
    """Per-class BCE over positive proposals (mask_head/loss.py). mask
    targets are (N, S, S) bitmasks cropped+resized to the proposal."""
    n, s, _, nc = mask_logits.shape
    sel = jnp.take_along_axis(
        mask_logits.reshape(n, s * s, nc),
        jnp.maximum(matched_labels, 0)[:, None, None].repeat(s * s, 1),
        axis=2,
    )[:, :, 0].reshape(n, s, s)
    t = mask_targets.astype(jnp.float32)
    bce = jnp.maximum(sel, 0) - sel * t + jnp.log1p(jnp.exp(-jnp.abs(sel)))
    m = pos_mask.astype(jnp.float32)[:, None, None]
    return jnp.sum(bce * m) / jnp.maximum(jnp.sum(m) * s * s, 1.0)


# ---------------------------------------------------------------------- #
# keypoint head (Keypoint R-CNN branch)
# ---------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class RoIKeypointConfig:
    """Reference ``modeling/roi_heads/keypoint_head/*``:
    KeypointRCNNFeatureExtractor (8x [conv3x3 512 + relu]) + deconv and 2x
    bilinear upscale to per-keypoint heatmaps; CE over the heatmap argmax
    cell of each visible keypoint."""

    num_keypoints: int = 17
    pooler_resolution: int = 14
    pooler_scales: tuple = (0.25, 0.125, 0.0625, 0.03125)
    sampling_ratio: int = 2
    conv_layers: tuple = tuple(512 for _ in range(8))

    @staticmethod
    def from_cfg(cfg):
        k = cfg.MODEL.ROI_KEYPOINT_HEAD
        return RoIKeypointConfig(
            num_keypoints=k.NUM_CLASSES,
            pooler_resolution=k.POOLER_RESOLUTION,
            pooler_scales=tuple(k.POOLER_SCALES),
            sampling_ratio=k.POOLER_SAMPLING_RATIO or 2,
            conv_layers=tuple(k.CONV_LAYERS),
        )


class RoIKeypointHead(nn.Module):
    cfg: RoIKeypointConfig
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pooled):
        x = pooled
        for i, ch in enumerate(self.cfg.conv_layers):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_fcn{i + 1}")(x)
            x = nn.relu(x)
        # deconv 2x then bilinear 2x -> 4x heatmap resolution
        x = nn.ConvTranspose(self.cfg.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="kps_score_lowres")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        return x.astype(jnp.float32)


def keypoints_to_heatmap(keypoints, rois, heatmap_size):
    """Project (N, K, 3) [x, y, vis] keypoints into each ROI's heatmap grid.

    Returns (targets (N, K) int32 flat ``y*S+x`` cell index, valid (N, K)
    float) — reference ``structures/keypoint.py:154-184``
    (keypoints_to_heat_map): floor-discretised, boundary-clamped to S-1,
    valid = in-grid AND visibility > 0.
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    rois = jnp.asarray(rois, jnp.float32)
    offset = rois[:, None, :2]
    wh = rois[:, 2:] - rois[:, :2]
    scale = heatmap_size / jnp.maximum(wh, 1e-6)[:, None, :]
    xy = jnp.floor((keypoints[..., :2] - offset) * scale)
    # points exactly on the max boundary land in the last cell
    on_edge = keypoints[..., :2] == rois[:, None, 2:]
    xy = jnp.where(on_edge, heatmap_size - 1, xy)
    in_grid = jnp.all((xy >= 0) & (xy < heatmap_size), axis=-1)
    vis = keypoints[..., 2] > 0
    xy = jnp.clip(xy, 0, heatmap_size - 1).astype(jnp.int32)
    targets = xy[..., 1] * heatmap_size + xy[..., 0]
    return targets, (in_grid & vis).astype(jnp.float32)


def roi_keypoint_decode(heatmaps, rois):
    """Heatmaps -> continuous image-space keypoints.

    heatmaps (N, H, W, K) logits, rois (N, 4) xyxy. Returns
    (xy_preds (N, K, 3) [x, y, 1], scores (N, K) logit at the argmax).

    Reference ``roi_heads/keypoint_head/inference.py:40-94``
    (heatmaps_to_keypoints) resizes each ROI map to its pixel size with a
    host cv2 INTER_CUBIC before the argmax — data-dependent shapes that
    cannot compile. TPU-native: argmax on the fixed grid, quadratic
    (Taylor) sub-cell refinement from the argmax's neighbours, then the
    same Heckbert +0.5 center-of-cell mapping back to image coordinates.
    Agrees with the reference up to sub-cell interpolation (PARITY.md).
    """
    heatmaps = jnp.asarray(heatmaps, jnp.float32)
    rois = jnp.asarray(rois, jnp.float32)
    n, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(n, h * w, k)
    pos = jnp.argmax(flat, axis=1)  # (N, K)
    scores = jnp.take_along_axis(flat, pos[:, None, :], axis=1)[:, 0, :]
    x_int = pos % w
    y_int = pos // w

    # quadratic refinement: offset = 0.5 * (f(+1) - f(-1)) / (f(+1) - 2f(0) + f(-1))
    def _at(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        return jnp.take_along_axis(
            flat, (yy * w + xx)[:, None, :], axis=1
        )[:, 0, :]

    f0 = scores
    fxp, fxm = _at(y_int, x_int + 1), _at(y_int, x_int - 1)
    fyp, fym = _at(y_int + 1, x_int), _at(y_int - 1, x_int)
    dx = 0.5 * (fxp - fxm) / jnp.maximum(jnp.abs(fxp - 2 * f0 + fxm), 1e-6)
    dy = 0.5 * (fyp - fym) / jnp.maximum(jnp.abs(fyp - 2 * f0 + fym), 1e-6)
    # interior argmax guarantees |offset| <= 0.5; clamp for edge cells
    dx = jnp.clip(dx, -0.5, 0.5)
    dy = jnp.clip(dy, -0.5, 0.5)

    wh = jnp.maximum(rois[:, 2:] - rois[:, :2], 1.0)  # (N, 2)
    x = (x_int + 0.5 + dx) * (wh[:, None, 0] / w) + rois[:, None, 0]
    y = (y_int + 0.5 + dy) * (wh[:, None, 1] / h) + rois[:, None, 1]
    xy_preds = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return xy_preds, scores


def roi_keypoint_loss(heatmaps, kp_targets, kp_valid):
    """CE over heatmap cells: kp_targets (N, K) flat cell index of each
    keypoint, kp_valid (N, K) visibility (keypoint_head/loss.py)."""
    n, h, w, k = heatmaps.shape
    logits = heatmaps.reshape(n, h * w, k).transpose(0, 2, 1)  # (N, K, HW)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.maximum(kp_targets, 0)[..., None], axis=2
    )[..., 0]
    m = kp_valid.astype(jnp.float32)
    return -jnp.sum(picked * m) / jnp.maximum(jnp.sum(m), 1.0)
