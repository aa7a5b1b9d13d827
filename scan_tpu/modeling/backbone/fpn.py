"""Feature Pyramid Network, NHWC.

Parity target: reference ``fcos_core/modeling/backbone/fpn.py:7-130`` —
1x1 lateral + 3x3 output convs (kaiming_uniform a=1 init), nearest x2
top-down upsample, and ``LastLevelP6P7`` (3x3 stride-2 convs, P7 from
relu(P6)). SCAN configs use USE_C5=False so P6 comes from P5.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, GroupNorm32, kaiming_uniform_a1


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """Builds P_l from backbone features C_l.

    in_features: indices of the backbone outputs to consume (e.g. (2, 3, 4)
    for C3..C5). top_block: 'p6p7' (RetinaNet-style extra levels) or
    'maxpool' or None.
    """

    in_features: Sequence[int]
    out_channels: int = 256
    top_block: Optional[str] = "p6p7"
    use_gn: bool = False
    use_relu: bool = False
    use_c5_for_p6: bool = False
    dtype: Optional[object] = None
    quant: bool = False

    @nn.compact
    def __call__(self, inputs):
        feats = [inputs[i] for i in self.in_features]
        n = len(feats)
        kinit = kaiming_uniform_a1()

        def block(x, features, ksize, name):
            y = Conv(
                features, ksize, kernel_init=kinit, quant=self.quant,
                use_bias=not self.use_gn, dtype=self.dtype, name=name,
            )(x)
            if self.use_gn:
                y = GroupNorm32(dtype=self.dtype, name=name + "_gn")(y)
            if self.use_relu:
                y = nn.relu(y)
            return y

        laterals = [
            block(f, self.out_channels, 1, f"fpn_inner{i + 1}")
            for i, f in enumerate(feats)
        ]
        results = [None] * n
        last_inner = laterals[-1]
        results[-1] = block(last_inner, self.out_channels, 3, f"fpn_layer{n}")
        for i in range(n - 2, -1, -1):
            last_inner = laterals[i] + upsample_nearest_2x(last_inner)
            results[i] = block(last_inner, self.out_channels, 3, f"fpn_layer{i + 1}")

        if self.top_block == "p6p7":
            src = feats[-1] if self.use_c5_for_p6 else results[-1]
            p6 = Conv(
                self.out_channels, 3, stride=2, kernel_init=kinit,
                quant=self.quant, dtype=self.dtype, name="p6",
            )(src)
            p7 = Conv(
                self.out_channels, 3, stride=2, kernel_init=kinit,
                quant=self.quant, dtype=self.dtype, name="p7",
            )(nn.relu(p6))
            results.extend([p6, p7])
        elif self.top_block == "maxpool":
            results.append(nn.max_pool(results[-1], (1, 1), strides=(2, 2)))

        return tuple(results)
