"""FBNet backbone family, NHWC.

Parity target: reference ``fcos_core/modeling/backbone/fbnet.py`` +
``fbnet_builder.py`` + ``fbnet_modeldef.py``: arch definitions are
[t, c, n, s] inverted-residual (IRF) stage tables with per-block op types
(kernel size / expansion variants), a [c, s] stem, and stage-index lists
selecting which stages serve the trunk vs the detection heads. The trunk
("backbone" stages) feeds the detection head directly in the reference's
FBNet configs.

This implementation covers the IRF-block primitive family (ir_k3 / ir_k5 /
ir_k7 with explicit expansions, skip) and the full reference arch set used
by its configs: 'default', 'mnv2', 'xirb16d_dsmask', 'cham_v1a', 'cham_v2'
(see FBNET_ARCHS below); further archs are plain data to add.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn


# arch tables: stem [c, s], stages: list of list of (op, t, c, n, s)
FBNET_ARCHS = {
    # reference fbnet_modeldef.py "default" trunk (stages marked 'backbone')
    "default": {
        "first": (32, 2),
        "stages": [
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 24, 2, 2)],
            [("ir_k3", 6, 32, 3, 2)],
            [("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)],
            [("ir_k3", 4, 160, 1, 2), ("ir_k3", 6, 160, 2, 1),
             ("ir_k3", 6, 240, 1, 1)],
        ],
        # endpoints: last block of each spatial scale (C2..C5)
        "endpoints": (1, 2, 3, 4),
    },
    "mnv2": {
        "first": (32, 2),
        "stages": [
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 24, 2, 2)],
            [("ir_k3", 6, 32, 3, 2)],
            [("ir_k3", 6, 64, 4, 2), ("ir_k3", 6, 96, 3, 1)],
            [("ir_k3", 6, 160, 3, 2), ("ir_k3", 6, 320, 1, 1)],
        ],
        "endpoints": (1, 2, 3, 4),
    },
    # reference "xirb16d_dsmask": backbone stages 0-3 + the bbox stage as
    # the C5 provider (same convention as 'default' above)
    "xirb16d_dsmask": {
        "first": (16, 2),
        "stages": [
            [("ir_k3", 1, 16, 1, 1)],
            [("ir_k3", 6, 32, 2, 2)],
            [("ir_k3", 6, 48, 3, 2)],
            [("ir_k3", 6, 96, 4, 2), ("ir_k3", 6, 128, 3, 1)],
            [("ir_k3", 4, 128, 1, 2), ("ir_k3", 6, 128, 2, 1),
             ("ir_k3", 6, 160, 1, 1)],
        ],
        "endpoints": (1, 2, 3, 4),
    },
    # reference "cham_v1a" (Chameleon; mixed ir_k7/ir_k5/ir_k3 ops)
    "cham_v1a": {
        "first": (32, 2),
        "stages": [
            [("ir_k3", 1, 24, 1, 1)],
            [("ir_k7", 4, 48, 2, 2)],
            [("ir_k3", 7, 64, 5, 2)],
            [("ir_k5", 12, 56, 7, 2), ("ir_k3", 8, 88, 5, 1)],
            [("ir_k3", 7, 152, 4, 2), ("ir_k3", 10, 104, 1, 1)],
        ],
        "endpoints": (1, 2, 3, 4),
    },
    # reference "cham_v2"
    "cham_v2": {
        "first": (32, 2),
        "stages": [
            [("ir_k3", 1, 24, 1, 1)],
            [("ir_k5", 8, 32, 4, 2)],
            [("ir_k7", 5, 48, 6, 2)],
            [("ir_k5", 9, 56, 3, 2), ("ir_k3", 6, 56, 6, 1)],
            [("ir_k3", 2, 160, 6, 2), ("ir_k3", 6, 112, 1, 1)],
        ],
        "endpoints": (1, 2, 3, 4),
    },
}


class IRFBlock(nn.Module):
    """Inverted-residual block with selectable kernel size (the FBNet
    primitive family; reference fbnet_builder.py:37-170)."""

    expansion: int
    out_channels: int
    stride: int = 1
    kernel: int = 3
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="pw")(y)
            y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             name="pw_bn")(y)
            y = jnp.clip(y, 0, 6)
        k = self.kernel
        y = nn.Conv(hidden, (k, k), strides=(self.stride, self.stride),
                    padding=k // 2, feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name="dw")(y)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="dw_bn")(y)
        y = jnp.clip(y, 0, 6)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pwl")(y)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="pwl_bn")(y)
        if self.stride == 1 and in_ch == self.out_channels:
            y = y + x
        return y


def _op_kernel(op: str) -> int:
    if op.startswith("ir_k7"):
        return 7
    return 5 if op.startswith("ir_k5") else 3


class FBNetTrunk(nn.Module):
    arch: str = "default"
    scale_factor: float = 1.0
    width_divisor: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        spec = FBNET_ARCHS[self.arch]

        def scaled(c):
            c = int(c * self.scale_factor)
            d = self.width_divisor
            return max(d, (c + d // 2) // d * d)

        c0, s0 = spec["first"]
        y = nn.Conv(scaled(c0), (3, 3), strides=(s0, s0), padding=1,
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="stem_bn")(y)
        y = jnp.clip(y, 0, 6)

        outs = []
        for si, stage in enumerate(spec["stages"]):
            for gi, (op, t, c, n, s) in enumerate(stage):
                for bi in range(n):
                    y = IRFBlock(
                        expansion=t, out_channels=scaled(c),
                        stride=s if bi == 0 else 1, kernel=_op_kernel(op),
                        dtype=self.dtype,
                        name=f"stage{si}_g{gi}_b{bi}",
                    )(y)
            if si in spec["endpoints"]:
                outs.append(y)
        return tuple(outs)
