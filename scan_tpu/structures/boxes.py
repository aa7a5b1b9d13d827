"""Fixed-capacity box containers and pure-jnp box math.

The reference's ``BoxList`` (reference ``fcos_core/structures/bounding_box.py:9``)
carries a dynamic number of boxes plus arbitrary fields. Dynamic shapes defeat
XLA, so the TPU-native idiom is a *padded* ``Boxes`` pytree: an ``(N, 4)``
xyxy array with a boolean validity mask, plus optional label/score arrays.
All ops below are shape-preserving and mask-aware.

Box op parity targets: reference ``fcos_core/structures/boxlist_ops.py:10-153``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Boxes:
    """Padded boxes in xyxy pixel coordinates.

    Attributes:
      boxes:  (..., N, 4) float array, xyxy.
      mask:   (..., N) bool array; False entries are padding.
      labels: optional (..., N) int array (1-based class ids, 0 = background).
      scores: optional (..., N) float array.
      size:   (width, height) of the image the boxes live in. Static metadata.
    """

    boxes: jnp.ndarray
    mask: jnp.ndarray
    labels: Optional[jnp.ndarray] = None
    scores: Optional[jnp.ndarray] = None
    size: tuple = (0, 0)

    def tree_flatten(self):
        return (self.boxes, self.mask, self.labels, self.scores), (self.size,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        boxes, mask, labels, scores = children
        return cls(boxes, mask, labels, scores, aux[0])

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    def area(self) -> jnp.ndarray:
        return box_area(self.boxes)

    def clip_to_image(self) -> "Boxes":
        w, h = self.size
        b = self.boxes
        x1 = jnp.clip(b[..., 0], 0, w - 1)
        y1 = jnp.clip(b[..., 1], 0, h - 1)
        x2 = jnp.clip(b[..., 2], 0, w - 1)
        y2 = jnp.clip(b[..., 3], 0, h - 1)
        return dataclasses.replace(self, boxes=jnp.stack([x1, y1, x2, y2], -1))

    def remove_small(self, min_size: float) -> "Boxes":
        """Mask out boxes smaller than min_size (reference boxlist_ops.py:59)."""
        b = self.boxes
        keep = ((b[..., 2] - b[..., 0]) >= min_size) & (
            (b[..., 3] - b[..., 1]) >= min_size
        )
        return dataclasses.replace(self, mask=self.mask & keep)

    @staticmethod
    def from_numpy(boxes: np.ndarray, labels: np.ndarray, capacity: int, size):
        """Pad host-side (n,4)/(n,) arrays to a fixed capacity."""
        n = min(boxes.shape[0], capacity)
        out_b = np.zeros((capacity, 4), np.float32)
        out_l = np.zeros((capacity,), np.int32)
        out_m = np.zeros((capacity,), bool)
        out_b[:n] = boxes[:n]
        out_l[:n] = labels[:n]
        out_m[:n] = True
        return Boxes(jnp.asarray(out_b), jnp.asarray(out_m), jnp.asarray(out_l), None, tuple(size))


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the detectron '+1' pixel convention OFF.

    The reference BoxList.area() for xyxy uses (x2-x1+1)*(y2-y1+1)
    (reference ``structures/bounding_box.py:238-242`` TO_REMOVE=1); we keep
    that convention for target-assignment parity.
    """
    return (boxes[..., 2] - boxes[..., 0] + 1) * (boxes[..., 3] - boxes[..., 1] + 1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray, plus_one: bool = True) -> jnp.ndarray:
    """Pairwise IoU between (N,4) and (M,4) xyxy boxes.

    plus_one=True matches the reference's legacy '+1' convention used both by
    ``boxlist_iou`` (reference ``structures/boxlist_ops.py:78-118``) and the
    CUDA NMS kernel (reference ``csrc/cuda/nms.cu:13-21``).
    """
    off = 1.0 if plus_one else 0.0
    area_a = (a[:, 2] - a[:, 0] + off) * (a[:, 3] - a[:, 1] + off)
    area_b = (b[:, 2] - b[:, 0] + off) * (b[:, 3] - b[:, 1] + off)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt + off, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def encode_boxes(reference_boxes, proposals, weights=(10.0, 10.0, 5.0, 5.0)):
    """Faster-RCNN box encoding (reference ``modeling/box_coder.py:28-53``)."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + 1.0
    ex_h = proposals[..., 3] - proposals[..., 1] + 1.0
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + 1.0
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + 1.0
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(rel_codes, boxes, weights=(10.0, 10.0, 5.0, 5.0), bbox_xform_clip=np.log(1000.0 / 16)):
    """Inverse of encode_boxes (reference ``modeling/box_coder.py:55-87``)."""
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.clip(rel_codes[..., 2] / ww, None, bbox_xform_clip)
    dh = jnp.clip(rel_codes[..., 3] / wh, None, bbox_xform_clip)

    pred_cx = dx * widths + ctr_x
    pred_cy = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w - 1,
            pred_cy + 0.5 * pred_h - 1,
        ],
        axis=-1,
    )
