"""Fixed-shape FCOS post-processing (decode + NMS + top-k).

Parity target: reference ``fcos_core/modeling/rpn/fcos/inference.py:20-213``:
  per level: threshold at INFERENCE_TH on the class score -> keep top
  PRE_NMS_TOP_N candidates ranked by cls*ctr -> decode l,t,r,b around the
  location -> clip to image; across levels: per-class hard-NMS at NMS_TH,
  then keep the top DETECTIONS_PER_IMG over all classes; final score is
  sqrt(cls * ctr).

TPU-native shape discipline: every image yields exactly
(DETECTIONS_PER_IMG,) slots with a validity mask; intermediate candidate
sets are fixed at PRE_NMS_TOP_N per level and NMS_CAP overall. In 'common'
mode scores pass through sigmoid; 'precision'/'light' feed pre-mixed
probabilities (reference inference.py:68).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ...ops.nms import nms_keep_mask

NEG_INF = -1e10


@dataclasses.dataclass(frozen=True)
class PostProcessConfig:
    pre_nms_thresh: float = 0.05
    pre_nms_top_n: int = 1000
    nms_thresh: float = 0.6
    fpn_post_nms_top_n: int = 100
    min_size: float = 0.0
    num_classes: int = 81  # includes background
    apply_sigmoid: bool = True  # TEST.MODE == 'common'
    nms_cap: int = 1000  # combined candidates entering NMS
    use_pallas_nms: bool = False


def _level_candidates(cfg, locations, box_cls, box_regression, centerness):
    """Per-image, per-level candidate extraction. All inputs single-image:
    box_cls (H*W, C), box_regression (H*W, 4), centerness (H*W,)."""
    scores = jax.nn.sigmoid(box_cls) if cfg.apply_sigmoid else box_cls
    candidate = scores > cfg.pre_nms_thresh
    ctr = jax.nn.sigmoid(centerness)
    ranked = scores * ctr[:, None]  # cls * ctr, the reference's ranking score

    masked = jnp.where(candidate, ranked, NEG_INF)
    num_loc, num_cls = scores.shape
    k = min(cfg.pre_nms_top_n, num_loc * num_cls)
    if num_loc > k and num_cls > 1:
        # Exact two-stage top-k: any (loc, cls) pair in the global top-k
        # has loc_max >= its score, so its location is in the top-k
        # locations by per-location class max — sorting num_loc + k*C
        # elements instead of num_loc*C (the P3 full sort was 3.1 ms of
        # a 158 ms batch-32 step; this is ~0.9 ms). Tie ORDER among
        # equal scores can differ from the single-sort path; box-parity
        # tests pass (real-valued scores make exact ties measure-zero).
        loc_max = jnp.max(masked, axis=1)
        _, top_loc = jax.lax.top_k(loc_max, k)
        sub = masked[top_loc].reshape(-1)  # (k*C,)
        top_scores, sub_idx = jax.lax.top_k(sub, k)
        loc_idx = top_loc[sub_idx // num_cls]
        cls_idx = sub_idx % num_cls + 1  # 1-based labels
    else:
        flat_rank = masked.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat_rank, k)
        loc_idx = top_idx // num_cls
        cls_idx = top_idx % num_cls + 1  # 1-based labels

    locs = locations[loc_idx]
    regs = box_regression[loc_idx]
    boxes = jnp.stack(
        [
            locs[:, 0] - regs[:, 0],
            locs[:, 1] - regs[:, 1],
            locs[:, 0] + regs[:, 2],
            locs[:, 1] + regs[:, 3],
        ],
        axis=1,
    )
    valid = top_scores > NEG_INF / 2
    return boxes, jnp.maximum(top_scores, 0.0), cls_idx, valid


def _postprocess_single(cfg: PostProcessConfig, locations, box_cls_levels,
                        box_reg_levels, ctr_levels, image_size):
    """Single-image postprocess. image_size: (2,) [h, w]."""
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for loc, bc, br, ct in zip(locations, box_cls_levels, box_reg_levels, ctr_levels):
        b, s, l, v = _level_candidates(cfg, loc, bc, br, ct)
        # clip to image (reference clip_to_image: clamp to [0, size-1])
        h = image_size[0].astype(jnp.float32)
        w = image_size[1].astype(jnp.float32)
        b = jnp.stack(
            [
                jnp.clip(b[:, 0], 0, w - 1),
                jnp.clip(b[:, 1], 0, h - 1),
                jnp.clip(b[:, 2], 0, w - 1),
                jnp.clip(b[:, 3], 0, h - 1),
            ],
            axis=1,
        )
        if cfg.min_size > 0:
            # '+1' width convention (reference boxlist_ops.py:59-71
            # remove_small_boxes goes through the xywh TO_REMOVE=1 convert)
            v = v & ((b[:, 2] - b[:, 0] + 1) >= cfg.min_size) & (
                (b[:, 3] - b[:, 1] + 1) >= cfg.min_size
            )
        all_boxes.append(b)
        all_scores.append(s)
        all_labels.append(l)
        all_valid.append(v)

    boxes = jnp.concatenate(all_boxes, 0)
    scores = jnp.concatenate(all_scores, 0)
    labels = jnp.concatenate(all_labels, 0)
    valid = jnp.concatenate(all_valid, 0)

    # Cap combined candidates before the O(K^2) NMS.
    cap = min(cfg.nms_cap, boxes.shape[0])
    ranked = jnp.where(valid, scores, NEG_INF)
    _, keep_idx = jax.lax.top_k(ranked, cap)
    boxes, scores, labels, valid = (
        boxes[keep_idx], scores[keep_idx], labels[keep_idx], valid[keep_idx]
    )

    keep = nms_keep_mask(
        boxes, scores, valid, cfg.nms_thresh, labels=labels,
        use_pallas=cfg.use_pallas_nms,
    )

    final_rank = jnp.where(keep, scores, NEG_INF)
    n_det = min(cfg.fpn_post_nms_top_n, final_rank.shape[0])
    top_scores, top_idx = jax.lax.top_k(final_rank, n_det)
    out_valid = top_scores > NEG_INF / 2
    return dict(
        boxes=boxes[top_idx],
        scores=jnp.sqrt(jnp.maximum(top_scores, 0.0)),
        labels=jnp.where(out_valid, labels[top_idx], 0),
        valid=out_valid,
    )


def fcos_postprocess(cfg: PostProcessConfig, locations, box_cls, box_regression,
                     centerness, image_sizes):
    """Batched postprocess.

    Args:
      locations: list of (HW_l, 2).
      box_cls: list of (B, H, W, C-1) logits or pre-mixed probabilities.
      box_regression: list of (B, H, W, 4).
      centerness: list of (B, H, W, 1).
      image_sizes: (B, 2) int [h, w].

    Returns dict of (B, DETECTIONS_PER_IMG) arrays: boxes/scores/labels/valid.
    """
    nc = cfg.num_classes - 1
    cls_flat = [m.reshape(m.shape[0], -1, nc) for m in box_cls]
    reg_flat = [m.reshape(m.shape[0], -1, 4) for m in box_regression]
    ctr_flat = [m.reshape(m.shape[0], -1) for m in centerness]

    fn = partial(_postprocess_single, cfg, locations)
    return jax.vmap(fn)(cls_flat, reg_flat, ctr_flat, image_sizes)
