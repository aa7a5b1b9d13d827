"""FCOS location grids.

Parity target: reference ``fcos_core/modeling/rpn/fcos/fcos.py:234-258`` —
per-level (H*W, 2) grids of (x, y) pixel centres: stride*i + stride//2.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def compute_locations_level(h: int, w: int, stride: int) -> jnp.ndarray:
    """(h*w, 2) array of (x, y) centres for one FPN level. Row-major over y."""
    shift_x = np.arange(0, w * stride, stride, dtype=np.float32)
    shift_y = np.arange(0, h * stride, stride, dtype=np.float32)
    sx, sy = np.meshgrid(shift_x, shift_y)  # (h, w)
    locs = np.stack([sx.reshape(-1), sy.reshape(-1)], axis=1) + stride // 2
    return jnp.asarray(locs)


def compute_locations(feature_shapes, strides) -> list:
    """feature_shapes: list of (h, w); strides: list of int."""
    return [
        compute_locations_level(h, w, s)
        for (h, w), s in zip(feature_shapes, strides)
    ]


def level_sizes_from_image(padded_h: int, padded_w: int, strides) -> list:
    """Static per-level (h, w) given a padded image shape.

    Feature sizes follow from the conv/pool stack: each level halves with
    ceil division in the reference VGG/ResNet (padding SAME-like behaviour);
    with shapes padded to a multiple of the largest stride the sizes are
    exactly padded / stride.
    """
    return [(padded_h // s, padded_w // s) for s in strides]
