"""VGG-16 backbone, NHWC.

Parity target: reference ``fcos_core/modeling/backbone/mmdetection/vgg.py``
(mmcv-style VGG): stages of (2, 2, 3, 3, 3) 3x3 convs with ReLU, 2x2
max-pool after every stage, ``frozen_stages=2`` (first two stages receive no
gradient), no BN in the SCAN configs. Outputs the post-pool feature of every
stage: C1..C5 with strides 2, 4, 8, 16, 32 and channels 64, 128, 256, 512,
512. The FPN consumes C3, C4, C5.

The caffe-pretrained torch weights (vgg16_caffe-292e1171.pth) are converted
by ``scan_tpu/utils/torch_weights.py``; input convention stays BGR*255.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..layers import Conv

VGG16_STAGE_BLOCKS = (2, 2, 3, 3, 3)
VGG16_STAGE_CHANNELS = (64, 128, 256, 512, 512)


def _s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (py*2+px)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _s2d_tap_index(r: int):
    """Full-res offset r in [-1, 2] -> (s2d cell offset, phase)."""
    return (r + 2) // 2 - 1, r % 2


def _s2d_conv_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a full-res 3x3 stride-1 kernel (3,3,Cin,Cout) to the
    space-to-depth domain: a 3x3 kernel over s2d cells mapping
    (4*Cin) -> (4*Cout), computing all four output phases at once.

    Index math: output phase (p, q); tap (du, dv); full-res input offset
    ry = p + du - 1 lands in s2d cell (ry+2)//2 - 1 with row-phase ry % 2.
    """
    kh, kw, cin, cout = w.shape
    ws = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for q in range(2):
            for du in range(kh):
                for dv in range(kw):
                    di, py = _s2d_tap_index(p + du - 1)
                    dj, px = _s2d_tap_index(q + dv - 1)
                    ws = ws.at[
                        di + 1, dj + 1,
                        (py * 2 + px) * cin : (py * 2 + px + 1) * cin,
                        (p * 2 + q) * cout : (p * 2 + q + 1) * cout,
                    ].add(w[du, dv])
    return ws


class _InnerConvParams(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        from ..layers import normal_init

        k = self.param("kernel", normal_init(0.01), self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return k, b


class _ConvParamProxy(nn.Module):
    """Declares conv params at <name>/Conv_0/{kernel,bias} without running
    the conv — keeps the s2d stem checkpoint-compatible with the naive one."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _InnerConvParams(self.shape, name="Conv_0")()


class VGG16(nn.Module):
    frozen_stages: int = 2
    with_bn: bool = False
    # Space-to-depth stage 1 (exact numerics, same params). Measured on
    # v5e: the lifted 3x3-over-s2d kernel spans a 6x6 full-res window (44%
    # structural zeros), which cancels the channel-padding win — 90 vs 96
    # img/s — so the naive stem stays the default. Kept as an option and a
    # building block for a future s2d+pruned variant.
    s2d_stage1: bool = False
    dtype: Optional[object] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        for stage, (blocks, ch) in enumerate(
            zip(VGG16_STAGE_BLOCKS, VGG16_STAGE_CHANNELS)
        ):
            if stage == 0 and self.s2d_stage1 and not self.with_bn:
                x = self._stage1_s2d(x)
                idx += VGG16_STAGE_BLOCKS[0]
            else:
                for b in range(blocks):
                    x = Conv(ch, 3, dtype=self.dtype, quant=self.quant,
                             name=f"conv{idx}")(x)
                    if self.with_bn:
                        x = nn.GroupNorm(
                            num_groups=None, group_size=1, epsilon=1e-5,
                            dtype=self.dtype, name=f"bn{idx}",
                        )(x)
                    x = nn.relu(x)
                    idx += 1
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if stage < self.frozen_stages:
                # Freeze params of early stages: no gradient flows back
                # through (they are the lowest layers, so cutting here is
                # exactly "requires_grad=False" in the reference vgg.py:131).
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)

    def _stage1_s2d(self, x):
        """conv0 -> relu -> conv1 -> relu -> pool2x2, computed on the
        space-to-depth grid. Parameters are declared at the SAME tree paths
        as the naive stem (conv0/Conv_0/..., conv1/Conv_0/...) so torch
        checkpoints and the naive path are interchangeable."""
        ch = VGG16_STAGE_CHANNELS[0]
        k0, b0_raw = _ConvParamProxy(
            (3, 3, x.shape[-1], ch), name="conv0"
        )()
        k1, b1_raw = _ConvParamProxy((3, 3, ch, ch), name="conv1")()

        dt = self.dtype or x.dtype
        xs = _s2d(x).astype(dt)
        ws0 = _s2d_conv_weight(k0).astype(dt)
        b0 = jnp.tile(b0_raw, 4).astype(dt)
        y = jax.lax.conv_general_dilated(
            xs, ws0, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b0
        y = nn.relu(y)
        ws1 = _s2d_conv_weight(k1).astype(dt)
        b1 = jnp.tile(b1_raw, 4).astype(dt)
        y = jax.lax.conv_general_dilated(
            y, ws1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b1
        y = nn.relu(y)
        # 2x2 max-pool == max over the four phases per s2d cell
        b_, h_, w_, _ = y.shape
        y = y.reshape(b_, h_, w_, 4, VGG16_STAGE_CHANNELS[0])
        return jnp.max(y, axis=3)
