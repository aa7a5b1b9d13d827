"""Public layer/op surface mirroring ``fcos_core.layers``.

Parity target: reference ``fcos_core/layers/__init__.py:1-31`` — a user of
the reference should find every exported symbol here, mapped onto the
TPU-native implementation:

  nms / ml_nms            -> ops.nms (XLA / Pallas kernels)
  ROIAlign / ROIPool      -> ops.roi_align (gather+bilinear)
  SigmoidFocalLoss        -> ops.focal_loss.sigmoid_focal_loss
  FocalLoss (softmax wbg) -> ops.focal_loss.softmax_focal_loss
  BCEFocalLoss            -> ops.focal_loss.bce_focal_loss
  IOULoss                 -> ops.iou_loss.iou_loss
  Scale / FrozenBatchNorm2d / MultiHeadAttention -> modeling.layers
  DFConv2d                -> ops.deform_conv.deform_conv2d
  KLLoss / CosineLoss / SupConLossWithPrototypeDA -> functions below
  MeanShift_GPU           -> condgraph.sampling.meanshift_high_mode
"""

import jax
import jax.numpy as jnp

from .modeling.condgraph.sampling import meanshift_high_mode
from .modeling.layers import (
    Conv,
    ConvTower,
    FrozenBatchNorm,
    GroupNorm32,
    MultiHeadSelfAttention,
    Scale,
)
from .ops.deform_conv import deform_conv2d
from .ops.focal_loss import (
    bce_focal_loss,
    binary_adversarial_focal_loss,
    sigmoid_focal_loss,
    softmax_focal_loss,
)
from .ops.iou_loss import iou_loss
from .ops.nms import ml_nms, nms, nms_keep_mask
from .ops.roi_align import roi_align, roi_pool


def safe_l2_norm(x, axis=None, keepdims=False, eps: float = 1e-8):
    """L2 norm with a finite gradient at 0.

    ``jnp.linalg.norm`` backpropagates x/||x|| — NaN on exactly-zero rows,
    which are routine here (empty prototype slots, masked-out nodes). The
    forward value differs from the true norm by <= eps.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps * eps)


def smooth_l1_loss(input, target, beta: float = 1.0 / 9, size_average=True):
    """Reference ``layers/smooth_l1_loss.py`` semantics."""
    d = jnp.abs(input - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def kl_loss(batch, target):
    """Reference ``layers/KL_loss.py`` KLLoss.forward: F.kl_div over
    softmaxed rows, elementwise-mean reduction, detached target."""
    target = jax.lax.stop_gradient(jax.nn.softmax(target, axis=-1))
    logq = jax.nn.log_softmax(batch, axis=-1)
    kl = target * (jnp.log(jnp.maximum(target, 1e-12)) - logq)
    return jnp.mean(kl)


def cosine_loss(batch, glb, label_indx):
    """Reference ``layers/cosine_loss.py`` CosineLoss.forward:
    (1 - cos) on selected rows + KLDiv; returns (sim_loss, kl_loss)."""
    mask = label_indx.astype(bool)
    b = batch * mask[:, None]
    g = jax.lax.stop_gradient(glb) * mask[:, None]
    dot = jnp.sum(b * g, axis=1)
    denom = jnp.maximum(
        safe_l2_norm(b, axis=1) * safe_l2_norm(g, axis=1), 1e-8
    )
    per_row = 1.0 - dot / denom
    n = jnp.maximum(jnp.sum(mask), 1.0)
    sim_loss = jnp.sum(per_row * mask) / n
    kl = kl_loss(glb, batch)
    return sim_loss, kl


def supcon_loss_with_prototype(features, labels, prototypes, proto_labels,
                               temperature: float = 0.07, valid_mask=None):
    """Supervised-contrastive loss against class prototypes (reference
    ``layers/contrastive_loss.py`` SupConLossWithPrototypeDA, simplified to
    its used core: anchor-vs-prototype InfoNCE with same-class positives)."""
    f = features / safe_l2_norm(features, axis=1, keepdims=True)
    p = prototypes / safe_l2_norm(prototypes, axis=1, keepdims=True)
    logits = (f @ p.T) / temperature  # (N, P)
    pos = (labels[:, None] == proto_labels[None, :]).astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=1)
    per_anchor = -jnp.sum(logp * pos, axis=1) / jnp.maximum(
        jnp.sum(pos, axis=1), 1.0
    )
    has_pos = jnp.sum(pos, axis=1) > 0
    m = has_pos if valid_mask is None else (has_pos & valid_mask)
    return jnp.sum(per_anchor * m) / jnp.maximum(jnp.sum(m), 1.0)


def interpolate_nearest_2x(x):
    """Reference ``layers/misc.py`` interpolate (the FPN use case)."""
    from .modeling.backbone.fpn import upsample_nearest_2x

    return upsample_nearest_2x(x)


__all__ = [
    "nms", "ml_nms", "nms_keep_mask", "roi_align", "roi_pool",
    "sigmoid_focal_loss", "softmax_focal_loss", "bce_focal_loss",
    "binary_adversarial_focal_loss", "iou_loss", "smooth_l1_loss",
    "kl_loss", "cosine_loss", "supcon_loss_with_prototype",
    "deform_conv2d", "meanshift_high_mode", "interpolate_nearest_2x",
    "Conv", "ConvTower", "FrozenBatchNorm", "GroupNorm32",
    "MultiHeadSelfAttention", "Scale",
]
