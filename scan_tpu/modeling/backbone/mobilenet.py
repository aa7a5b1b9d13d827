"""MobileNetV2 backbone, NHWC.

Parity target: reference ``fcos_core/modeling/backbone/mobilenet.py`` +
the MNV2-FPN-RETINANET builder (backbone.py:120-140). Inverted residual
blocks; returns the standard C2..C5 endpoints (24, 32, 96, 320 channels at
strides 4, 8, 16, 32).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# (expansion, out_channels, num_blocks, stride)
MNV2_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
# stage indices whose LAST block output is an FPN endpoint (C2..C5)
ENDPOINT_STAGES = (1, 2, 4, 6)


class InvertedResidual(nn.Module):
    expansion: int
    out_channels: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        identity = x
        y = x
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             name="expand_bn")(y)
            y = jnp.clip(y, 0, 6)  # relu6
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype,
            name="depthwise",
        )(y)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="dw_bn")(y)
        y = jnp.clip(y, 0, 6)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project")(y)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="project_bn")(y)
        if self.stride == 1 and in_ch == self.out_channels:
            y = y + identity
        return y


class MobileNetV2(nn.Module):
    dtype: Optional[Any] = None
    freeze_at: int = 0

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="stem_bn")(y)
        y = jnp.clip(y, 0, 6)
        outs = []
        for si, (t, c, n, s) in enumerate(MNV2_SETTINGS):
            for bi in range(n):
                y = InvertedResidual(
                    t, c, s if bi == 0 else 1, dtype=self.dtype,
                    name=f"stage{si}_block{bi}",
                )(y)
            if si in ENDPOINT_STAGES:
                outs.append(y)
            if self.freeze_at > si:
                y = jax.lax.stop_gradient(y)
        return tuple(outs)
