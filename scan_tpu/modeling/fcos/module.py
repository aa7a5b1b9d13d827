"""FCOS module glue: head outputs -> losses (train) or boxes (eval).

Parity target: reference ``fcos_core/modeling/rpn/fcos/fcos.py:117-258``,
including the three TEST.MODEs (fcos.py:162-169):
  common    — raw logits, sigmoid applied inside the postprocessor;
  precision — 0.5*sigmoid(logits) + 0.5*act_maps[:, 1:] (probabilities);
  light     — act_maps[:, 1:] replace the classification maps entirely and
              the cls tower is skipped.
Act maps are NHWC here: channel 0 is background when PROTO_WITH_BG.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...ops.locations import compute_locations
from .loss import fcos_losses
from .postprocess import PostProcessConfig, fcos_postprocess


def mix_cls_maps(mode: str, box_cls: Sequence[jnp.ndarray],
                 act_maps: Optional[Sequence[jnp.ndarray]]):
    """Apply the TEST.MODE ensembling. Returns (cls_maps, apply_sigmoid)."""
    if mode == "light":
        return [a[..., 1:] for a in act_maps], False
    if mode == "precision":
        return (
            [0.5 * jax.nn.sigmoid(c) + 0.5 * a[..., 1:] for c, a in zip(box_cls, act_maps)],
            False,
        )
    return list(box_cls), True


def fcos_train_outputs(locations, box_cls, box_regression, centerness,
                       targets=None, gamma=2.0, alpha=0.25):
    """Training branch (reference fcos.py:198-224). targets is a dict with
    boxes (B,G,4), labels (B,G), mask (B,G) or None for the target-domain
    pass (returns the reference's 'zero' dummy loss)."""
    score_maps = {
        "box_cls": box_cls,
        "box_regression": box_regression,
        "centerness": centerness,
    }
    if targets is not None:
        losses = fcos_losses(
            locations, box_cls, box_regression, centerness,
            targets["boxes"], targets["labels"], targets["mask"],
            gamma=gamma, alpha=alpha,
        )
    else:
        zero = sum(0.0 * jnp.sum(x) for x in box_cls)
        zero = zero + sum(0.0 * jnp.sum(x) for x in box_regression)
        zero = zero + sum(0.0 * jnp.sum(x) for x in centerness)
        losses = {"zero": zero}
    return losses, score_maps


def fcos_eval_outputs(cfg: PostProcessConfig, mode: str, feature_shapes,
                      strides, box_cls, box_regression, centerness,
                      act_maps, image_sizes):
    """Inference branch: mode mixing + fixed-shape postprocess."""
    locations = compute_locations(feature_shapes, strides)
    cls_maps, apply_sigmoid = mix_cls_maps(mode, box_cls, act_maps)
    import dataclasses

    cfg = dataclasses.replace(cfg, apply_sigmoid=apply_sigmoid)
    return fcos_postprocess(
        cfg, locations, cls_maps, box_regression, centerness, image_sizes
    )
