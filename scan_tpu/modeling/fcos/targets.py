"""FCOS target assignment as fixed-shape, fully-vectorised jnp.

Parity target: reference ``fcos_core/modeling/rpn/fcos/loss.py:40-133``:
per-level size-of-interest binning [[-1,64],[64,128],[128,256],[256,512],
[512,INF]], "inside box" test (strict >0 on the min ltrb), min-area
assignment among surviving GTs, label 0 elsewhere. Instead of per-image
python loops over dynamic GT counts, everything is a (B, L, G) masked
broadcast — one fused XLA kernel.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

INF = 100000000.0

OBJECT_SIZES_OF_INTEREST = (
    (-1.0, 64.0),
    (64.0, 128.0),
    (128.0, 256.0),
    (256.0, 512.0),
    (512.0, INF),
)


def expand_soi(num_points_per_level: Sequence[int]) -> jnp.ndarray:
    """(L, 2) per-location size-of-interest bounds over concatenated levels."""
    parts = [
        jnp.broadcast_to(jnp.asarray(OBJECT_SIZES_OF_INTEREST[l]), (n, 2))
        for l, n in enumerate(num_points_per_level)
    ]
    return jnp.concatenate(parts, axis=0)


def compute_targets_single(
    locations: jnp.ndarray,  # (L, 2)
    soi: jnp.ndarray,  # (L, 2)
    gt_boxes: jnp.ndarray,  # (G, 4) xyxy
    gt_labels: jnp.ndarray,  # (G,)
    gt_mask: jnp.ndarray,  # (G,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns labels (L,) int32 and reg_targets (L, 4) float32."""
    xs, ys = locations[:, 0], locations[:, 1]
    l = xs[:, None] - gt_boxes[None, :, 0]
    t = ys[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - xs[:, None]
    b = gt_boxes[None, :, 3] - ys[:, None]
    reg = jnp.stack([l, t, r, b], axis=2)  # (L, G, 4)

    is_in_box = jnp.min(reg, axis=2) > 0
    max_reg = jnp.max(reg, axis=2)
    cared = (max_reg >= soi[:, 0:1]) & (max_reg <= soi[:, 1:2])

    # reference BoxList.area(): '+1' convention
    area = (gt_boxes[:, 2] - gt_boxes[:, 0] + 1) * (gt_boxes[:, 3] - gt_boxes[:, 1] + 1)
    loc_to_gt_area = jnp.broadcast_to(area[None, :], is_in_box.shape)
    invalid = ~(is_in_box & cared & gt_mask[None, :])
    loc_to_gt_area = jnp.where(invalid, INF, loc_to_gt_area)

    min_area = jnp.min(loc_to_gt_area, axis=1)
    gt_inds = jnp.argmin(loc_to_gt_area, axis=1)

    labels = jnp.take(gt_labels, gt_inds).astype(jnp.int32)
    labels = jnp.where(min_area == INF, 0, labels)
    reg_targets = jnp.take_along_axis(reg, gt_inds[:, None, None], axis=1)[:, 0, :]
    return labels, reg_targets


# batched over images
compute_targets = jax.vmap(compute_targets_single, in_axes=(None, None, 0, 0, 0))


def centerness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min_lr / max_lr) * (min_tb / max_tb));
    reference loss.py:128-133."""
    lr = reg_targets[..., (0, 2)]
    tb = reg_targets[..., (1, 3)]
    ratio = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-12)) * (
        jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-12)
    )
    return jnp.sqrt(jnp.maximum(ratio, 0.0))
