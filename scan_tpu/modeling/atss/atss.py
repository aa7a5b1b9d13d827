"""ATSS detector (head + box coder + adaptive assignment + losses + postproc).

Parity targets:
  * head: reference ``fcos_core/modeling/rpn/atss/atss.py:100-192`` — shared
    cls/box towers [conv,GN,ReLU]*4, per-level Scale on bbox_pred (relu'd in
    POINT mode), centerness off the box tower, focal-prior cls bias;
  * box coder: ``atss.py:14-98`` — BOX mode: Faster-RCNN deltas with
    TO_REMOVE=1 and the (w-1)/2 decode; POINT mode: ltrb in stride units;
  * assignment: ``loss.py:163-250`` (POSITIVE_TYPE='ATSS') — per level
    topk=9 anchors by centre distance, IoU threshold = mean+std over the
    candidates, centre-inside-gt filter, max-IoU tiebreak;
  * losses: ``loss.py:292-339`` — focal / num_pos, centerness-weighted GIoU
    / sum(centerness) * REG_LOSS_WEIGHT, BCE centerness / num_pos;
  * postprocess: ``inference.py:11-127`` — per-level threshold + topk,
    decode, multi-label NMS, top-100.

TPU-native shape discipline: the per-image python loops over dynamic GT
counts become (L, G) masked broadcasts; topk-per-level is lax.top_k; std
uses the reference's Bessel (n-1) correction.
"""

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.focal_loss import sigmoid_focal_loss
from ...structures.boxes import box_iou
from ..layers import Conv, ConvTower, Scale

INF = 100000000.0


@dataclasses.dataclass(frozen=True)
class ATSSConfig:
    num_classes: int = 81
    num_convs: int = 4
    prior_prob: float = 0.01
    regression_type: str = "BOX"
    anchor_sizes: tuple = (64, 128, 256, 512, 1024)
    aspect_ratios: tuple = (1.0,)
    strides: tuple = (8, 16, 32, 64, 128)
    octave: float = 2.0
    scales_per_octave: int = 1
    topk: int = 9
    positive_type: str = "ATSS"
    adapt_topk: tuple = None  # per-fg-class candidate counts (ADAPT_ATSS)
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.4
    loss_gamma: float = 2.0
    loss_alpha: float = 0.25
    reg_loss_weight: float = 2.0

    @property
    def num_anchors(self):
        return len(self.aspect_ratios) * self.scales_per_octave

    @staticmethod
    def from_cfg(cfg):
        a = cfg.MODEL.ATSS
        adapt_topk = None
        if a.POSITIVE_TYPE == "ADAPT_ATSS":
            adapt_topk = adapt_topk_from_cfg(cfg)
        return ATSSConfig(
            num_classes=a.NUM_CLASSES,
            num_convs=a.NUM_CONVS,
            prior_prob=a.PRIOR_PROB,
            regression_type=a.REGRESSION_TYPE,
            anchor_sizes=tuple(a.ANCHOR_SIZES),
            aspect_ratios=tuple(a.ASPECT_RATIOS),
            strides=tuple(a.ANCHOR_STRIDES),
            octave=a.OCTAVE,
            scales_per_octave=a.SCALES_PER_OCTAVE,
            topk=a.TOPK,
            positive_type=a.POSITIVE_TYPE,
            adapt_topk=adapt_topk,
            fg_iou_thresh=a.FG_IOU_THRESHOLD,
            bg_iou_thresh=a.BG_IOU_THRESHOLD,
            loss_gamma=a.LOSS_GAMMA,
            loss_alpha=a.LOSS_ALPHA,
            reg_loss_weight=a.REG_LOSS_WEIGHT,
        )


class ATSSHead(nn.Module):
    cfg: ATSSConfig
    in_channels: int = 256
    num_levels: int = 5
    dtype: Optional[Any] = None
    quant: bool = False

    @nn.compact
    def __call__(self, features):
        c = self.cfg
        num_fg = c.num_classes - 1
        na = c.num_anchors
        cls_tower = ConvTower(c.num_convs, self.in_channels, dtype=self.dtype,
                              quant=self.quant, name="cls_tower")
        box_tower = ConvTower(c.num_convs, self.in_channels, dtype=self.dtype,
                              quant=self.quant, name="bbox_tower")
        bias_value = -math.log((1 - c.prior_prob) / c.prior_prob)
        cls_logits = Conv(na * num_fg, 3, dtype=self.dtype,
                          bias_init=nn.initializers.constant(bias_value),
                          name="cls_logits")
        reg_bias = 4.0 if c.regression_type == "POINT" else 0.0
        bbox_pred = Conv(na * 4, 3, dtype=self.dtype,
                         bias_init=nn.initializers.constant(reg_bias),
                         name="bbox_pred")
        centerness = Conv(na, 3, dtype=self.dtype, name="centerness")
        scales = [Scale(1.0, name=f"scale{l}") for l in range(self.num_levels)]

        logits, bbox_reg, ctrness = [], [], []
        for l, f in enumerate(features):
            ct = cls_tower(f)
            bt = box_tower(f)
            logits.append(cls_logits(ct).astype(jnp.float32))
            pred = scales[l](bbox_pred(bt).astype(jnp.float32))
            if c.regression_type == "POINT":
                pred = nn.relu(pred)
            bbox_reg.append(pred)
            ctrness.append(centerness(bt).astype(jnp.float32))
        return logits, bbox_reg, ctrness


# ---------------------------------------------------------------------- #
# box coder
# ---------------------------------------------------------------------- #
def atss_encode(cfg: ATSSConfig, gt_boxes, anchors):
    if cfg.regression_type == "POINT":
        aw = anchors[:, 2] - anchors[:, 0] + 1
        ah = anchors[:, 3] - anchors[:, 1] + 1
        cx = (anchors[:, 2] + anchors[:, 0]) / 2
        cy = (anchors[:, 3] + anchors[:, 1]) / 2
        w = cfg.anchor_sizes[0] / cfg.strides[0]
        return jnp.stack(
            [
                w * (cx - gt_boxes[:, 0]) / aw,
                w * (cy - gt_boxes[:, 1]) / ah,
                w * (gt_boxes[:, 2] - cx) / aw,
                w * (gt_boxes[:, 3] - cy) / ah,
            ],
            axis=1,
        )
    ew = anchors[:, 2] - anchors[:, 0] + 1
    eh = anchors[:, 3] - anchors[:, 1] + 1
    ecx = (anchors[:, 2] + anchors[:, 0]) / 2
    ecy = (anchors[:, 3] + anchors[:, 1]) / 2
    gw = gt_boxes[:, 2] - gt_boxes[:, 0] + 1
    gh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1
    gcx = (gt_boxes[:, 2] + gt_boxes[:, 0]) / 2
    gcy = (gt_boxes[:, 3] + gt_boxes[:, 1]) / 2
    return jnp.stack(
        [
            10.0 * (gcx - ecx) / ew,
            10.0 * (gcy - ecy) / eh,
            5.0 * jnp.log(jnp.maximum(gw / ew, 1e-8)),
            5.0 * jnp.log(jnp.maximum(gh / eh, 1e-8)),
        ],
        axis=1,
    )


def atss_decode(cfg: ATSSConfig, preds, anchors):
    if cfg.regression_type == "POINT":
        aw = anchors[:, 2] - anchors[:, 0] + 1
        ah = anchors[:, 3] - anchors[:, 1] + 1
        cx = (anchors[:, 2] + anchors[:, 0]) / 2
        cy = (anchors[:, 3] + anchors[:, 1]) / 2
        w = cfg.anchor_sizes[0] / cfg.strides[0]
        return jnp.stack(
            [
                cx - preds[:, 0] / w * aw,
                cy - preds[:, 1] / w * ah,
                cx + preds[:, 2] / w * aw,
                cy + preds[:, 3] / w * ah,
            ],
            axis=1,
        )
    widths = anchors[:, 2] - anchors[:, 0] + 1
    heights = anchors[:, 3] - anchors[:, 1] + 1
    ctr_x = (anchors[:, 2] + anchors[:, 0]) / 2
    ctr_y = (anchors[:, 3] + anchors[:, 1]) / 2
    dx = preds[:, 0] / 10.0
    dy = preds[:, 1] / 10.0
    dw = jnp.clip(preds[:, 2] / 5.0, None, math.log(1000.0 / 16))
    dh = jnp.clip(preds[:, 3] / 5.0, None, math.log(1000.0 / 16))
    pcx = dx * widths + ctr_x
    pcy = dy * heights + ctr_y
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack(
        [
            pcx - 0.5 * (pw - 1),
            pcy - 0.5 * (ph - 1),
            pcx + 0.5 * (pw - 1),
            pcy + 0.5 * (ph - 1),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------- #
# positive-sample selection variants (reference loss.py POSITIVE_TYPE)
# ---------------------------------------------------------------------- #
def ssc_assign_single(cfg: ATSSConfig, anchors_cat, level_counts,
                      gt_boxes, gt_labels, gt_mask):
    """'SSC' — the FCOS size-of-interest assignment on anchor centres
    (reference loss.py:120-162)."""
    from ..fcos.targets import compute_targets_single, expand_soi

    cx = (anchors_cat[:, 2] + anchors_cat[:, 0]) / 2
    cy = (anchors_cat[:, 3] + anchors_cat[:, 1]) / 2
    points = jnp.stack([cx, cy], axis=1)
    soi = expand_soi(level_counts)
    labels, _ = compute_targets_single(points, soi, gt_boxes, gt_labels, gt_mask)
    # matched gt for regression: re-derive min-area assignment
    ious = box_iou(anchors_cat, gt_boxes, plus_one=True)
    ious = jnp.where(gt_mask[None, :], ious, -1.0)
    best_gt = jnp.argmax(ious, axis=1)
    matched = jnp.take(gt_boxes, best_gt, axis=0)
    return labels, matched


def iou_assign_single(cfg: ATSSConfig, anchors_cat, level_counts,
                      gt_boxes, gt_labels, gt_mask):
    """'IoU' — RetinaNet-style matcher + centre-inside-gt filter
    (reference loss.py:321-351). Ignored anchors get label -1."""
    from ..retinanet import matcher_assign

    ious = box_iou(anchors_cat, gt_boxes, plus_one=True) * gt_mask[None, :]
    matches = matcher_assign(ious, cfg.fg_iou_thresh, cfg.bg_iou_thresh)
    matches = jnp.where(jnp.any(gt_mask), matches, -1)
    labels = jnp.where(
        matches >= 0, jnp.take(gt_labels, jnp.maximum(matches, 0)), 0
    )
    labels = jnp.where(matches == -2, -1, labels).astype(jnp.int32)
    matched = jnp.take(gt_boxes, jnp.maximum(matches, 0), axis=0)
    # centre-inside-gt filter on positives
    cx = (anchors_cat[:, 2] + anchors_cat[:, 0]) / 2
    cy = (anchors_cat[:, 3] + anchors_cat[:, 1]) / 2
    inside = (
        jnp.minimum(
            jnp.minimum(cx - matched[:, 0], cy - matched[:, 1]),
            jnp.minimum(matched[:, 2] - cx, matched[:, 3] - cy),
        )
        > 0.01
    )
    labels = jnp.where((labels > 0) & ~inside, -1, labels)
    return labels, matched


def topk_assign_single(cfg: ATSSConfig, anchors_cat, level_counts,
                       gt_boxes, gt_labels, gt_mask):
    """'TOPK' — per-gt top-k by (iou - normalised distance)
    (reference loss.py:292-320)."""
    ious = box_iou(anchors_cat, gt_boxes, plus_one=True)
    cx = (anchors_cat[:, 2] + anchors_cat[:, 0]) / 2
    cy = (anchors_cat[:, 3] + anchors_cat[:, 1]) / 2
    gcx = (gt_boxes[:, 2] + gt_boxes[:, 0]) / 2
    gcy = (gt_boxes[:, 3] + gt_boxes[:, 1]) / 2
    dist = jnp.sqrt(
        (cx[:, None] - gcx[None, :]) ** 2 + (cy[:, None] - gcy[None, :]) ** 2
    )
    dist = dist / jnp.maximum(jnp.max(dist), 1e-6) / 1000.0
    score = ious - dist
    k = min(cfg.topk, score.shape[0])
    _, idx = jax.lax.top_k(score.T, k)  # (G, k)
    is_pos = jnp.zeros(ious.shape, bool)
    is_pos = is_pos.at[idx, jnp.arange(gt_boxes.shape[0])[:, None]].set(True)
    inside = (
        jnp.minimum(
            jnp.minimum(
                cx[:, None] - gt_boxes[None, :, 0],
                cy[:, None] - gt_boxes[None, :, 1],
            ),
            jnp.minimum(
                gt_boxes[None, :, 2] - cx[:, None],
                gt_boxes[None, :, 3] - cy[:, None],
            ),
        )
        > 0.01
    )
    is_pos = is_pos & inside & gt_mask[None, :]
    ious_masked = jnp.where(is_pos, ious, -INF)
    best_iou = jnp.max(ious_masked, axis=1)
    best_gt = jnp.argmax(ious_masked, axis=1)
    labels = jnp.where(
        best_iou > -INF / 2, jnp.take(gt_labels, best_gt), 0
    ).astype(jnp.int32)
    matched = jnp.take(gt_boxes, best_gt, axis=0)
    return labels, matched


# ---------------------------------------------------------------------- #
# adaptive training sample selection
# ---------------------------------------------------------------------- #
def compute_adapt_topk(class_counts, base_topk: int = 9, cap: int = 17):
    """'ADAPT_ATSS' per-class topk from training-set class frequencies
    (reference loss.py:41-60): rarer classes get more candidates:
    clip(max(topk, ceil(mean/count * topk)), <= cap)."""
    import numpy as np

    counts = np.asarray(class_counts, np.float64)
    adapt = np.ceil(counts.mean() / np.maximum(counts, 1) * base_topk)
    return tuple(
        int(v) for v in np.minimum(np.maximum(base_topk, adapt), cap)
    )


def adapt_topk_from_cfg(cfg):
    """Derive the ADAPT_ATSS per-class topk table from the configured
    training dataset's class frequencies.

    Reference ``atss/loss.py:41-60`` (global_cat_distribution) does this at
    loss-evaluator init from a hardcoded Cityscapes annotation path; here the
    counts come from cfg.DATASETS.TRAIN_SOURCE (or TRAIN). Returns None (→
    plain ATSS behaviour) with a warning when the dataset files are not
    present, instead of crashing model construction on inference-only hosts.
    """
    import logging

    from ...data.build import build_datasets
    from ...data.stats import class_instance_counts

    names = cfg.DATASETS.TRAIN_SOURCE or cfg.DATASETS.TRAIN
    try:
        ds = build_datasets(names, is_train=True)
        counts = class_instance_counts(ds, cfg.MODEL.ATSS.NUM_CLASSES - 1)
    except Exception as e:  # dataset files absent on this host
        logging.getLogger("scan_tpu.atss").warning(
            "ADAPT_ATSS: could not derive class frequencies from %s (%s); "
            "falling back to uniform TOPK=%d",
            names, e, cfg.MODEL.ATSS.TOPK,
        )
        return None
    return compute_adapt_topk(
        counts, base_topk=cfg.MODEL.ATSS.TOPK, cap=17
    )


def atss_assign_single(cfg: ATSSConfig, anchors_cat, level_counts,
                       gt_boxes, gt_labels, gt_mask):
    """Per-image ATSS assignment. anchors_cat (L,4); level_counts static
    list; gts padded (G,...). Returns labels (L,), matched_gt (L,4).

    When cfg.positive_type == 'ADAPT_ATSS', cfg.adapt_topk gives per-class
    candidate counts (reference loss.py:222-290): the per-level top-k by
    distance is taken at the cap and candidates are rank-masked per gt."""
    ious = box_iou(anchors_cat, gt_boxes, plus_one=True)  # (L, G)

    gt_cx = (gt_boxes[:, 2] + gt_boxes[:, 0]) / 2
    gt_cy = (gt_boxes[:, 3] + gt_boxes[:, 1]) / 2
    a_cx = (anchors_cat[:, 2] + anchors_cat[:, 0]) / 2
    a_cy = (anchors_cat[:, 3] + anchors_cat[:, 1]) / 2
    dist = jnp.sqrt(
        (a_cx[:, None] - gt_cx[None, :]) ** 2
        + (a_cy[:, None] - gt_cy[None, :]) ** 2
    )

    # per-level topk candidates by distance; ADAPT_ATSS rank-masks per gt
    adaptive = cfg.positive_type == "ADAPT_ATSS" and cfg.adapt_topk is not None
    if adaptive:
        topk_tbl = jnp.asarray((cfg.topk,) + tuple(cfg.adapt_topk), jnp.int32)
        per_gt_topk = topk_tbl[jnp.clip(gt_labels, 0, len(cfg.adapt_topk))]
        topk = max(cfg.adapt_topk) * cfg.num_anchors
    else:
        per_gt_topk = None
        topk = cfg.topk * cfg.num_anchors

    cand = jnp.zeros(ious.shape, bool)
    start = 0
    for n in level_counts:
        d = dist[start : start + n]  # (n, G)
        k = min(topk, n)
        _, idx = jax.lax.top_k(-d.T, k)  # (G, k) smallest distances
        g_ids = jnp.arange(gt_boxes.shape[0])[:, None]
        lvl_mask = jnp.zeros((gt_boxes.shape[0], n), bool)
        if per_gt_topk is not None:
            rank = jnp.broadcast_to(jnp.arange(k)[None, :], idx.shape)
            sel = rank < per_gt_topk[:, None]
            lvl_mask = lvl_mask.at[g_ids, idx].max(sel)
        else:
            lvl_mask = lvl_mask.at[g_ids, idx].set(True)
        cand = cand.at[start : start + n].set(lvl_mask.T)
        start += n

    # iou threshold = mean + std over candidates (Bessel-corrected like torch)
    n_cand = jnp.sum(cand.astype(jnp.float32), axis=0)  # (G,)
    cand_ious = jnp.where(cand, ious, 0.0)
    mean = jnp.sum(cand_ious, axis=0) / jnp.maximum(n_cand, 1.0)
    var = jnp.sum(
        jnp.where(cand, (ious - mean[None, :]) ** 2, 0.0), axis=0
    ) / jnp.maximum(n_cand - 1.0, 1.0)
    thr = mean + jnp.sqrt(var)

    # centre inside gt (strict margin 0.01)
    l = a_cx[:, None] - gt_boxes[None, :, 0]
    t = a_cy[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - a_cx[:, None]
    b = gt_boxes[None, :, 3] - a_cy[:, None]
    in_gt = jnp.min(jnp.stack([l, t, r, b], axis=2), axis=2) > 0.01

    is_pos = cand & (ious >= thr[None, :]) & in_gt & gt_mask[None, :]

    ious_masked = jnp.where(is_pos, ious, -INF)
    best_iou = jnp.max(ious_masked, axis=1)
    best_gt = jnp.argmax(ious_masked, axis=1)
    labels = jnp.where(
        best_iou > -INF / 2, jnp.take(gt_labels, best_gt), 0
    ).astype(jnp.int32)
    matched = jnp.take(gt_boxes, best_gt, axis=0)
    return labels, matched


def atss_centerness(reg_targets, anchors, cfg: ATSSConfig):
    gts = atss_decode(cfg, reg_targets, anchors)
    cx = (anchors[:, 2] + anchors[:, 0]) / 2
    cy = (anchors[:, 3] + anchors[:, 1]) / 2
    l = cx - gts[:, 0]
    t = cy - gts[:, 1]
    r = gts[:, 2] - cx
    b = gts[:, 3] - cy
    lr_min = jnp.minimum(l, r)
    lr_max = jnp.maximum(jnp.maximum(l, r), 1e-8)
    tb_min = jnp.minimum(t, b)
    tb_max = jnp.maximum(jnp.maximum(t, b), 1e-8)
    return jnp.sqrt(jnp.maximum((lr_min / lr_max) * (tb_min / tb_max), 0.0))


def giou_loss(cfg: ATSSConfig, pred, target, anchors, weight, valid):
    # Sanitise masked rows BEFORE the decode/area arithmetic: the final
    # `* valid` zeroes the loss but not a NaN/inf born inside the untaken
    # branch (0 * inf = NaN in the backward pass) — same fixed-shape
    # masking rule as ops/iou_loss.py.
    vm = (valid > 0).reshape(-1, 1)
    pred = jnp.where(vm, pred, 0.0)
    target = jnp.where(vm, target, 0.0)
    pb = atss_decode(cfg, pred, anchors)
    px1, py1 = pb[:, 0], pb[:, 1]
    px2 = jnp.maximum(px1, pb[:, 2])
    py2 = jnp.maximum(py1, pb[:, 3])
    p_area = (px2 - px1) * (py2 - py1)

    gb = atss_decode(cfg, target, anchors)
    gx1, gy1, gx2, gy2 = gb[:, 0], gb[:, 1], gb[:, 2], gb[:, 3]
    g_area = (gx2 - gx1) * (gy2 - gy1)

    ix1 = jnp.maximum(px1, gx1)
    iy1 = jnp.maximum(py1, gy1)
    ix2 = jnp.minimum(px2, gx2)
    iy2 = jnp.minimum(py2, gy2)
    inter = jnp.where(
        (iy2 > iy1) & (ix2 > ix1), (ix2 - ix1) * (iy2 - iy1), 0.0
    )
    enc_area = (
        (jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1))
        * (jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1))
        + 1e-7
    )
    union = p_area + g_area - inter + 1e-7
    gious = inter / union - (enc_area - union) / enc_area
    losses = (1.0 - gious) * weight * valid
    return jnp.sum(losses)


def atss_losses(cfg: ATSSConfig, anchors_levels, box_cls, box_regression,
                centerness, gt_boxes, gt_labels, gt_mask):
    """Fixed-shape ATSS loss over a batch (reference loss.py:292-339)."""
    num_fg = cfg.num_classes - 1
    level_counts = [a.shape[0] for a in anchors_levels]
    anchors_cat = jnp.concatenate(anchors_levels, axis=0)

    assign_fn = {
        "ATSS": atss_assign_single,
        "ADAPT_ATSS": atss_assign_single,
        "SSC": ssc_assign_single,
        "IoU": iou_assign_single,
        "TOPK": topk_assign_single,
    }[cfg.positive_type]
    assign = jax.vmap(
        lambda b, l, m: assign_fn(cfg, anchors_cat, level_counts, b, l, m)
    )
    labels, matched = assign(gt_boxes, gt_labels, gt_mask)  # (B,L),(B,L,4)

    def enc(m):
        return atss_encode(cfg, m, anchors_cat)

    reg_targets = jax.vmap(enc)(matched)

    cls_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, num_fg) for m in box_cls], axis=1
    ).reshape(-1, num_fg)
    reg_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1, 4) for m in box_regression], axis=1
    ).reshape(-1, 4)
    ctr_flat = jnp.concatenate(
        [m.reshape(m.shape[0], -1) for m in centerness], axis=1
    ).reshape(-1)
    labels_flat = labels.reshape(-1)
    reg_t_flat = reg_targets.reshape(-1, 4)
    anchors_flat = jnp.tile(anchors_cat, (gt_boxes.shape[0], 1))

    pos = labels_flat > 0
    valid = labels_flat >= 0  # -1 = ignored (IoU positive type)
    num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

    cls_loss = sigmoid_focal_loss(
        cls_flat, labels_flat, cfg.loss_gamma, cfg.loss_alpha,
        valid_mask=valid,
    ) / num_pos

    ctr_targets = atss_centerness(reg_t_flat, anchors_flat, cfg)
    ctr_targets = jnp.where(pos, ctr_targets, 0.0)
    sum_ctr = jnp.maximum(jnp.sum(ctr_targets), 1e-6)

    reg_loss = giou_loss(
        cfg, reg_flat, reg_t_flat, anchors_flat, ctr_targets,
        pos.astype(jnp.float32),
    ) / sum_ctr

    bce = (
        jnp.maximum(ctr_flat, 0)
        - ctr_flat * ctr_targets
        + jnp.log1p(jnp.exp(-jnp.abs(ctr_flat)))
    )
    ctr_loss = jnp.sum(bce * pos) / num_pos

    return {
        "loss_cls": cls_loss,
        "loss_reg": reg_loss * cfg.reg_loss_weight,
        "loss_centerness": ctr_loss,
    }


# ---------------------------------------------------------------------- #
# inference
# ---------------------------------------------------------------------- #
def atss_postprocess(cfg: ATSSConfig, pp_cfg, anchors_levels, box_cls,
                     box_regression, centerness, image_sizes):
    """Fixed-shape ATSS postprocess (reference atss/inference.py:11-127):
    identical protocol to the FCOS one but anchors + coder decoding and
    multi-label NMS across levels."""
    import dataclasses as _dc

    from ..fcos.postprocess import NEG_INF, PostProcessConfig, _postprocess_single

    num_fg = cfg.num_classes - 1

    def single(cls_levels, reg_levels, ctr_levels, image_size):
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for anchors, bc, br, ct in zip(
            anchors_levels, cls_levels, reg_levels, ctr_levels
        ):
            scores = jax.nn.sigmoid(bc)
            candidate = scores > pp_cfg.pre_nms_thresh
            ranked = scores * jax.nn.sigmoid(ct)[:, None]
            flat = jnp.where(candidate, ranked, NEG_INF).reshape(-1)
            k = min(pp_cfg.pre_nms_top_n, flat.shape[0])
            top_scores, top_idx = jax.lax.top_k(flat, k)
            loc_idx = top_idx // num_fg
            cls_idx = top_idx % num_fg + 1
            boxes = atss_decode(cfg, br[loc_idx], anchors[loc_idx])
            h = image_size[0].astype(jnp.float32)
            w = image_size[1].astype(jnp.float32)
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[:, 0], 0, w - 1),
                    jnp.clip(boxes[:, 1], 0, h - 1),
                    jnp.clip(boxes[:, 2], 0, w - 1),
                    jnp.clip(boxes[:, 3], 0, h - 1),
                ],
                axis=1,
            )
            all_boxes.append(boxes)
            all_scores.append(jnp.maximum(top_scores, 0.0))
            all_labels.append(cls_idx)
            all_valid.append(top_scores > NEG_INF / 2)

        boxes = jnp.concatenate(all_boxes, 0)
        scores = jnp.concatenate(all_scores, 0)
        labels = jnp.concatenate(all_labels, 0)
        valid = jnp.concatenate(all_valid, 0)

        cap = min(pp_cfg.nms_cap, boxes.shape[0])
        _, keep_idx = jax.lax.top_k(jnp.where(valid, scores, NEG_INF), cap)
        boxes, scores, labels, valid = (
            boxes[keep_idx], scores[keep_idx], labels[keep_idx], valid[keep_idx]
        )
        from ...ops.nms import nms_keep_mask

        keep = nms_keep_mask(
            boxes, scores, valid, pp_cfg.nms_thresh, labels=labels,
            use_pallas=pp_cfg.use_pallas_nms,
        )
        final = jnp.where(keep, scores, NEG_INF)
        n_det = min(pp_cfg.fpn_post_nms_top_n, final.shape[0])
        top_scores, top_idx = jax.lax.top_k(final, n_det)
        out_valid = top_scores > NEG_INF / 2
        return dict(
            boxes=boxes[top_idx],
            scores=jnp.sqrt(jnp.maximum(top_scores, 0.0)),
            labels=jnp.where(out_valid, labels[top_idx], 0),
            valid=out_valid,
        )

    cls_flat = [m.reshape(m.shape[0], -1, num_fg) for m in box_cls]
    reg_flat = [m.reshape(m.shape[0], -1, 4) for m in box_regression]
    ctr_flat = [m.reshape(m.shape[0], -1) for m in centerness]
    return jax.vmap(single)(cls_flat, reg_flat, ctr_flat, image_sizes)
