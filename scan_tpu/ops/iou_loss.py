"""IoU regression loss for FCOS ltrb offsets.

Parity target: reference ``fcos_core/layers/iou_loss.py:5-36`` — log-IoU loss
with the `+1.0` smoothing in numerator/denominator, optionally weighted by
centerness with weight-sum normalisation.
"""

import jax.numpy as jnp


def iou_loss(pred, target, weight=None, valid_mask=None):
    """pred/target: (N, 4) ltrb distances (all >= 0). Returns scalar.

    Unlike the reference, which gathers the positive rows before computing
    areas (loss.py:214-222, dynamic shapes), this stays fixed-shape and
    mask-weights the reduction — so masked rows MUST be sanitised at entry,
    not just at the output. A `where` after the arithmetic zeroes the
    cotangent but not the NaN: with an inf prediction at a masked row
    (e.g. the head's exp overflowing at an unsupervised location, the
    round-4 stability-run collapse at iter 1837) `0 * inf` in the backward
    pass poisons every upstream gradient. The double-where below keeps the
    untaken branch's arithmetic finite."""
    if valid_mask is not None:
        vm = valid_mask[:, None]
        pred = jnp.where(vm, pred, 0.0)
        target = jnp.where(vm, target, 0.0)
    pl, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)

    w_intersect = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_intersect = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)

    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ratio = (area_intersect + 1.0) / (area_union + 1.0)
    if valid_mask is not None:
        m = valid_mask.astype(ratio.dtype)
        # Padded rows can hold garbage (negative ltrb -> ratio <= 0); force
        # them to a safe value BEFORE the log so masked NaNs can't leak
        # through 0 * NaN.
        ratio = jnp.where(valid_mask, ratio, 1.0)
    else:
        m = jnp.ones_like(ratio)
    losses = -jnp.log(jnp.maximum(ratio, 1e-12))

    if weight is not None:
        w = weight * m
        return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1e-6)
    return jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)
