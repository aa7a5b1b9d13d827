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

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv

VGG16_STAGE_BLOCKS = (2, 2, 3, 3, 3)
VGG16_STAGE_CHANNELS = (64, 128, 256, 512, 512)


class VGG16(nn.Module):
    frozen_stages: int = 2
    with_bn: bool = False
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        for stage, (blocks, ch) in enumerate(
            zip(VGG16_STAGE_BLOCKS, VGG16_STAGE_CHANNELS)
        ):
            for b in range(blocks):
                x = Conv(ch, 3, dtype=self.dtype, name=f"conv{idx}")(x)
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
