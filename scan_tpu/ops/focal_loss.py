"""Focal losses as pure jnp functions.

These replace three different reference implementations:
  * CUDA multi-class sigmoid focal loss (reference
    ``fcos_core/csrc/cuda/SigmoidFocalLoss_cuda.cu`` via
    ``layers/sigmoid_focal_loss.py:9-77``) — used by the FCOS cls loss.
  * softmax ``FocalLoss`` (reference ``layers/sigmoid_focal_loss_wbg.py:7-64``)
    — used by the condgraph activation-map loss.
  * ``BCEFocalLoss`` (reference ``layers/sigmoid_focal_loss_wbg.py:155-190``).

On TPU these are bandwidth-bound elementwise chains; XLA fuses them into the
surrounding computation, so a handwritten Pallas kernel buys nothing — the
custom-CUDA-op pattern from the reference is intentionally *not* replicated.
All functions are mask-aware so padded locations contribute exactly zero.
"""

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25, valid_mask=None):
    """Multi-class sigmoid focal loss, summed.

    Args:
      logits: (N, C) class logits for C foreground classes.
      targets: (N,) int labels in [0, C]; 0 = background, c>0 selects column c-1.
      valid_mask: optional (N,) bool; padded rows contribute 0.

    Returns the scalar sum over all (location, class) pairs, matching the
    reference semantics (per-element loss then ``.sum()``,
    reference ``layers/sigmoid_focal_loss.py:40-53,68-75``).
    """
    num_classes = logits.shape[1]
    class_range = jnp.arange(1, num_classes + 1, dtype=targets.dtype)[None, :]
    t = targets[:, None]
    p = jax.nn.sigmoid(logits)
    # log(p) / log(1-p) computed stably from logits.
    log_p = jax.nn.log_sigmoid(logits)
    log_1mp = jax.nn.log_sigmoid(-logits)
    term_pos = ((1 - p) ** gamma) * log_p
    term_neg = (p**gamma) * log_1mp
    pos_mask = (t == class_range).astype(logits.dtype)
    neg_mask = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    loss = -pos_mask * term_pos * alpha - neg_mask * term_neg * (1 - alpha)
    if valid_mask is not None:
        loss = loss * valid_mask[:, None].astype(logits.dtype)
    return jnp.sum(loss)


def softmax_focal_loss(logits, targets, gamma=2.0, valid_mask=None,
                       size_average=True, eps=1e-15):
    """Softmax focal loss with background class included.

    Matches reference ``layers/sigmoid_focal_loss_wbg.py:38-64`` (alpha == 1):
    ``-(1-p_t)^gamma * log(p_t)`` with ``p_t`` clamped at 1e-15, averaged.
    """
    p = jax.nn.softmax(logits, axis=1)
    pt = jnp.take_along_axis(p, targets[:, None].astype(jnp.int32), axis=1)[:, 0]
    pt = jnp.clip(pt, eps, None)
    loss = -((1 - pt) ** gamma) * jnp.log(pt)
    if valid_mask is not None:
        m = valid_mask.astype(logits.dtype)
        loss = loss * m
        denom = jnp.maximum(jnp.sum(m), 1.0)
    else:
        denom = loss.shape[0]
    return jnp.sum(loss) / denom if size_average else jnp.sum(loss)


def bce_focal_loss(logits, targets, gamma=2.0, alpha=0.25, valid_mask=None,
                   reduction="mean"):
    """Binary focal loss over explicit one/zero targets.

    Matches reference ``BCEFocalLoss`` (``sigmoid_focal_loss_wbg.py:155-190``):
    sigmoid probability clamped to [1e-5, 1-1e-5], elementwise-mean reduction.
    """
    pt = jnp.clip(jax.nn.sigmoid(logits), 1e-5, 1 - 1e-5)
    loss = -alpha * ((1 - pt) ** gamma) * targets * jnp.log(pt) - (
        1 - alpha
    ) * (pt**gamma) * (1 - targets) * jnp.log(1 - pt)
    if valid_mask is not None:
        m = jnp.broadcast_to(valid_mask[..., None], loss.shape).astype(loss.dtype)
        loss = loss * m
        denom = jnp.maximum(jnp.sum(m), 1.0)
    else:
        denom = loss.size
    if reduction == "mean":
        return jnp.sum(loss) / denom
    return jnp.sum(loss)


def binary_adversarial_focal_loss(logits, targets, gamma=5.0):
    """Discriminator focal loss (reference ``discriminator/layer.py:35-39``)."""
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    pt = jnp.exp(-bce)
    return jnp.mean(((1 - pt) ** gamma) * bce)
