"""Padded image batches with per-image true sizes.

Replaces the reference's ``ImageList`` (reference
``fcos_core/structures/image_list.py:7-72``). Where the reference pads each
batch to the max size in the batch rounded to SIZE_DIVISIBILITY (dynamic), we
pad to a *bucket* shape chosen on the host so XLA sees a small, fixed set of
shapes. Layout is NHWC (TPU-native) instead of NCHW.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ImageBatch:
    """tensors: (B, H, W, 3) padded images; sizes: (B, 2) [h, w] true sizes."""

    tensors: jnp.ndarray
    sizes: jnp.ndarray

    def tree_flatten(self):
        return (self.tensors, self.sizes), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def padded_hw(self) -> Tuple[int, int]:
        return self.tensors.shape[1], self.tensors.shape[2]


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def batch_images(images: Sequence[np.ndarray], size_divisibility: int = 32,
                 bucket_hw: Tuple[int, int] | None = None) -> ImageBatch:
    """Stack HWC numpy images into a padded NHWC batch.

    If bucket_hw is given, pad to that exact shape (static bucket). Otherwise
    pad to the per-batch max rounded up to size_divisibility (matches the
    reference's to_image_list semantics, reference image_list.py:29-70).
    """
    hs = [im.shape[0] for im in images]
    ws = [im.shape[1] for im in images]
    if bucket_hw is None:
        H = round_up(max(hs), size_divisibility)
        W = round_up(max(ws), size_divisibility)
    else:
        H, W = bucket_hw
    out = np.zeros((len(images), H, W, 3), np.float32)
    for i, im in enumerate(images):
        out[i, : im.shape[0], : im.shape[1]] = im
    sizes = np.stack([np.array(hs), np.array(ws)], axis=1).astype(np.int32)
    return ImageBatch(jnp.asarray(out), jnp.asarray(sizes))
