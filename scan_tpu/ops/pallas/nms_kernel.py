"""Pallas TPU kernel for greedy (ML-)NMS over score-sorted boxes.

Replaces the XLA fori_loop in ``ops/nms.py`` for the hot inference path.
The whole working set (boxes (K,4), suppression matrix (K,K) bool) lives in
VMEM, so the inherently-sequential greedy scan runs with no HBM round-trips
per step — the same reason the reference wrote a CUDA kernel
(reference ``fcos_core/csrc/cuda/nms.cu:13-123``) instead of composing
torch ops. IoU uses the legacy '+1' convention to match.

K is padded to a multiple of 128 (TPU lane width); K*K fp32 intermediates
must fit VMEM, so K <= ~1536.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, labels_ref, out_ref, sup_scr, *,
                iou_threshold, plus_one, use_labels):
    k = boxes_ref.shape[0]
    boxes = boxes_ref[:]
    valid = valid_ref[:, 0] > 0

    off = 1.0 if plus_one else 0.0
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + off) * (y2 - y1 + off)

    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(rb_x - lt_x + off, 0) * jnp.clip(rb_y - lt_y + off, 0)
    iou = inter / (area[:, None] + area[None, :] - inter)

    sup = iou > iou_threshold
    if use_labels:
        labels = labels_ref[:, 0]
        sup = sup & (labels[:, None] == labels[None, :])
    sup = sup & valid[None, :] & valid[:, None]
    # Mosaic cannot dynamic-slice VALUES; the greedy scan reads rows through
    # a VMEM scratch ref instead.
    sup_scr[:] = sup.astype(jnp.int32)
    out_ref[:] = jnp.logical_not(valid).astype(jnp.int32)[:, None]  # suppressed

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0]

    def body(i, _):
        suppressed_i = out_ref[i, 0]

        @pl.when(jnp.logical_and(valid_ref[i, 0] > 0, suppressed_i == 0))
        def _():
            row = sup_scr[i, :]
            newly = jnp.logical_and(row > 0, row_ids > i)
            cur = out_ref[:, 0]
            out_ref[:] = jnp.where(newly, 1, cur)[:, None]

        return 0

    jax.lax.fori_loop(0, k, body, 0)
    # out currently holds "suppressed or invalid"; flip to keep
    out_ref[:] = jnp.where(
        valid, 1 - jnp.minimum(out_ref[:, 0], 1), 0
    ).astype(jnp.int32)[:, None]


def nms_pallas_sorted(boxes, valid, labels, iou_threshold: float,
                      plus_one: bool = True, interpret: bool = False):
    """Greedy NMS over boxes ALREADY SORTED by descending score.

    Args: boxes (K, 4) f32; valid (K,) bool; labels optional (K,) int32.
    Returns keep (K,) bool in the sorted order.
    """
    k = boxes.shape[0]
    kp = ((k + 127) // 128) * 128
    use_labels = labels is not None
    if labels is None:
        labels = jnp.zeros((k,), jnp.int32)
    if kp != k:
        boxes = jnp.pad(boxes, ((0, kp - k), (0, 0)))
        valid = jnp.pad(valid, (0, kp - k))
        labels = jnp.pad(labels, (0, kp - k))

    kernel = functools.partial(
        _nms_kernel,
        iou_threshold=float(iou_threshold),
        plus_one=plus_one,
        use_labels=use_labels,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((kp, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.int32)],
        interpret=interpret,
    )(
        boxes,
        valid.astype(jnp.int32).reshape(kp, 1),
        labels.astype(jnp.int32).reshape(kp, 1),
    )
    return out[:k, 0] > 0
