"""Fixed-shape greedy NMS / multi-label NMS.

Replaces the reference CUDA kernels (reference ``fcos_core/csrc/cuda/nms.cu``
and ``ml_nms.cu`` exposed through ``layers/nms.py:5-6``). Semantics matched:

  * greedy suppression in descending score order;
  * IoU with the legacy '+1' pixel convention (``nms.cu:13-21``);
  * ml_nms: boxes only suppress boxes with the same label (``ml_nms.cu:23``).

TPU-native design: dynamic survivor counts become a fixed-capacity boolean
keep mask. The O(K^2) IoU matrix is computed once (MXU/VPU friendly); the
inherently sequential greedy scan runs as a `lax.fori_loop` over rows. A
Pallas VMEM-resident variant lives in ``ops/pallas/nms_kernel.py`` and is
used automatically for supported shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..structures.boxes import box_iou

NEG_INF = -1e10


def _suppression_matrix(boxes, labels, iou_threshold, plus_one):
    iou = box_iou(boxes, boxes, plus_one=plus_one)
    sup = iou > iou_threshold
    if labels is not None:
        sup = sup & (labels[:, None] == labels[None, :])
    return sup


@partial(jax.jit, static_argnames=("iou_threshold", "plus_one", "use_pallas"))
def nms_keep_mask(boxes, scores, valid, iou_threshold, labels=None,
                  plus_one: bool = True, use_pallas: bool = False):
    """Exact greedy (ML-)NMS.

    Args:
      boxes: (K, 4) xyxy.
      scores: (K,) scores.
      valid: (K,) bool — padding mask.
      iou_threshold: scalar.
      labels: optional (K,) int; if given, only same-label boxes suppress
        each other (multi-label NMS).

    Returns:
      keep: (K,) bool in the ORIGINAL box order.
    """
    k = boxes.shape[0]
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    b = boxes[order]
    v = valid[order]
    l = labels[order] if labels is not None else None

    if use_pallas:
        from .pallas.nms_kernel import nms_pallas_sorted

        keep_sorted = nms_pallas_sorted(b, v, l, iou_threshold, plus_one)
    else:
        sup = _suppression_matrix(b, l, iou_threshold, plus_one)
        row_ids = jnp.arange(k)

        def body(i, suppressed):
            keep_i = v[i] & jnp.logical_not(suppressed[i])
            newly = keep_i & sup[i] & (row_ids > i)
            return suppressed | newly

        suppressed = lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
        keep_sorted = v & jnp.logical_not(suppressed)

    return jnp.zeros((k,), bool).at[order].set(keep_sorted)


def nms(boxes, scores, valid, iou_threshold, **kw):
    """Hard NMS keep mask (original order)."""
    return nms_keep_mask(boxes, scores, valid, iou_threshold, labels=None, **kw)


def ml_nms(boxes, scores, labels, valid, iou_threshold, **kw):
    """Multi-label NMS keep mask (original order)."""
    return nms_keep_mask(boxes, scores, valid, iou_threshold, labels=labels, **kw)
