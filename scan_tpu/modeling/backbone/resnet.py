"""ResNet backbone (R-50/101), NHWC, frozen-BN.

Parity target: reference ``fcos_core/modeling/backbone/resnet.py:80-418``:
caffe-style stem (7x7/2 conv + FrozenBN + ReLU + 3x3/2 maxpool), bottleneck
blocks with FrozenBN, ``STRIDE_IN_1X1`` (stride on the 1x1 conv, caffe
convention), stage freezing at FREEZE_CONV_BODY_AT.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, FrozenBatchNorm

RESNET_STAGES = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        identity = x
        if in_channels != self.out_channels or self.stride != 1:
            identity = Conv(
                self.out_channels, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.out_channels, name="downsample_bn")(identity)

        out = Conv(self.bottleneck_channels, 1, stride=stride_1x1,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)
        out = Conv(self.bottleneck_channels, 3, stride=stride_3x3,
                   use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)
        out = Conv(self.out_channels, 1, use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, name="bn3")(out)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 50
    freeze_at: int = 2
    num_stages: int = 4  # C2..C5
    stride_in_1x1: bool = True
    res2_out_channels: int = 256
    stem_out_channels: int = 64
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        blocks = RESNET_STAGES[self.depth][: self.num_stages]
        # Stem
        x = Conv(self.stem_out_channels, 7, stride=2, use_bias=False,
                 dtype=self.dtype, name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_out_channels, name="stem_bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)

        outs = []
        out_ch = self.res2_out_channels
        bott_ch = self.res2_out_channels // 4
        for stage_idx, n_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    bottleneck_channels=bott_ch,
                    out_channels=out_ch,
                    stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{b}",
                )(x)
            if self.freeze_at >= stage_idx + 2:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
            out_ch *= 2
            bott_ch *= 2
        return tuple(outs)
