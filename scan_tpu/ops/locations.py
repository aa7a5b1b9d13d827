"""FCOS location grids.

Parity target: reference ``fcos_core/modeling/rpn/fcos/fcos.py:234-258`` —
per-level (H*W, 2) grids of (x, y) pixel centres: stride*i + stride//2.
"""

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _locations_np(h: int, w: int, stride: int) -> np.ndarray:
    shift_x = np.arange(0, w * stride, stride, dtype=np.float32)
    shift_y = np.arange(0, h * stride, stride, dtype=np.float32)
    sx, sy = np.meshgrid(shift_x, shift_y)  # (h, w)
    return np.stack([sx.reshape(-1), sy.reshape(-1)], axis=1) + stride // 2


def compute_locations_level(h: int, w: int, stride: int) -> jnp.ndarray:
    """(h*w, 2) array of (x, y) centres for one FPN level. Row-major over y.

    Only the numpy grid is cached — converting inside a trace must yield a
    fresh constant, never a cached tracer.
    """
    return jnp.asarray(_locations_np(h, w, stride))


def compute_locations(feature_shapes, strides) -> list:
    """feature_shapes: list of (h, w); strides: list of int."""
    return [
        compute_locations_level(h, w, s)
        for (h, w), s in zip(feature_shapes, strides)
    ]


def level_sizes_from_image(padded_h: int, padded_w: int, strides) -> list:
    """Static per-level (h, w) given a padded image shape.

    Strides up to 32 come from exact 2x pools on /32-padded inputs; the
    P6/P7 levels come from stride-2 3x3 convs (padding 1) which ceil-divide:
    out = floor((n - 1) / 2) + 1 == ceil(n / 2).
    """
    sizes = []
    h, w = padded_h, padded_w
    cur = 1
    for s in strides:
        while cur < s:
            if cur < 32:
                h, w = h // 2, w // 2  # exact pools (input padded to /32)
            else:
                h, w = (h + 1) // 2, (w + 1) // 2  # stride-2 conv, ceil
            cur *= 2
        sizes.append((h, w))
    return sizes
