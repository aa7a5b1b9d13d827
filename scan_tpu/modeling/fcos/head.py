"""FCOS detection head, NHWC.

Parity target: reference ``fcos_core/modeling/rpn/fcos/fcos.py:13-114`` —
separate cls/bbox towers of NUM_CONVS_{CLS,REG} x [3x3 conv, GN(32), ReLU]
shared across pyramid levels, 3x3 prediction convs (Normal(0.01) init, zero
bias), focal-prior bias on cls_logits, per-level learnable Scale on the box
regression followed by exp, centerness branched off the regression tower
when REG_CTR_ON.
"""

import math
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, ConvTower, Scale


class FCOSHead(nn.Module):
    num_classes: int  # includes background; logits have num_classes - 1
    num_convs_cls: int = 4
    num_convs_reg: int = 4
    in_channels: int = 256
    prior_prob: float = 0.01
    with_reg_ctr: bool = True
    num_levels: int = 5
    dtype: Optional[object] = None
    quant: bool = False

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], compute_cls: bool = True):
        """features: list of NHWC maps. Returns (logits, bbox_reg, centerness)
        lists; logits is an empty list when compute_cls=False (TEST.MODE
        'light' skips the cls tower, reference fcos.py:97-99)."""
        cls_tower = ConvTower(
            self.num_convs_cls, self.in_channels, dtype=self.dtype,
            quant=self.quant, name="cls_tower"
        )
        bbox_tower = ConvTower(
            self.num_convs_reg, self.in_channels, dtype=self.dtype,
            quant=self.quant, name="bbox_tower"
        )
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = Conv(
            self.num_classes - 1, 3, dtype=self.dtype,
            bias_init=nn.initializers.constant(bias_value), name="cls_logits",
        )
        bbox_pred = Conv(4, 3, dtype=self.dtype, name="bbox_pred")
        centerness = Conv(1, 3, dtype=self.dtype, name="centerness")
        scales = [Scale(1.0, name=f"scale{l}") for l in range(self.num_levels)]

        logits, bbox_reg, ctrness = [], [], []
        for l, feature in enumerate(features):
            if compute_cls:
                c = cls_tower(feature)
                logits.append(cls_logits(c).astype(jnp.float32))
            r = bbox_tower(feature)
            if self.with_reg_ctr:
                ctrness.append(centerness(r).astype(jnp.float32))
            else:
                ctrness.append(centerness(c).astype(jnp.float32))
            # exp overflow guard: the reference applies a bare torch.exp
            # (fcos.py:112) but only ever differentiates gathered positive
            # rows; our fixed-shape losses see every location, and an
            # unsupervised location's prediction can drift until exp
            # overflows fp32 (observed at iter 1837 of the round-4
            # stability run: P3's scale*pred crossed ~44, inf'ing
            # pred_area and NaN-poisoning the whole model in one step).
            # Legitimate ltrb distances are <= ~1400 px (log ~ 7.3), so
            # clamping at 25 (exp = 7.2e10) is numerics-neutral for any
            # real box while keeping all downstream area products finite.
            bbox_reg.append(
                jnp.exp(jnp.minimum(
                    scales[l](bbox_pred(r).astype(jnp.float32)), 25.0
                ))
            )
        return logits, bbox_reg, ctrness
