"""Adversarial domain discriminators (GA / CA / OUT / CON a.k.a. CKA).

Parity targets:
  * ``FCOSDiscriminator`` (global alignment, GA):
    reference ``discriminator/fcos_head_discriminator.py:11-74`` — conv+GN
    tower -> 1-channel logits -> BCE against the domain label, GRL on input.
  * ``FCOSDiscriminator_CA`` (center-aware):
    reference ``discriminator/fcos_head_discriminator_CA.py:7-124`` —
    attention map sigmoid(w * maxpool_cls * ctr) from detached score maps;
    modes ca_loss / ca_feature / focal.
  * ``FCOSDiscriminator_out`` (output-space alignment):
    reference ``discriminator/fcos_head_discriminator_out.py:14-186`` —
    aligns concatenated (reg, cls, ctr) output maps.
  * ``FCOSDiscriminator_con`` (Conditional-Kernel-guided Alignment, CKA —
    the SCAN-specific one): reference
    ``discriminator/fcos_head_discriminator_con.py:12-127`` — shared GN conv
    tower + one tiny conv classifier per class; feature fused with that
    class's activation map (concat / mul / mul_detached); act-map-weighted
    BCE; GRL applied to BOTH the features and the act maps.

All are flax modules returning scalar losses; the GRL lambda is a static
attribute (per-level GRL_WEIGHT_P*). Train-step usage: the loss is simply
added to the total — the reversal happens in backward, exactly like the
reference's separate backward() calls folded into one (see engine/trainer).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, ConvTower, _ConvParams, normal_init
from .grl import gradient_reversal


class _HeadParams(nn.Module):
    """Per-class CKA head parameters at the same tree paths ``Conv`` would
    create (<name>/Conv_0/{kernel,bias}) without running the conv — the
    class heads execute batched (see FCOSDiscriminatorCon) but stay
    checkpoint-compatible with the per-class reference layout."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, True, normal_init(0.01),
                           nn.initializers.zeros, name="Conv_0")()


def _bce_with_logits(logits, target_value):
    t = target_value
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class FCOSDiscriminator(nn.Module):
    """Global alignment discriminator (GA)."""

    num_convs: int = 2
    in_channels: int = 256
    grl_lambda: float = 0.1
    grl_applied_domain: str = "both"
    patch_stride: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feature, target: float, domain: str = "source"):
        if self.grl_applied_domain == "both" or domain == "target":
            feature = gradient_reversal(feature, self.grl_lambda)
        if self.patch_stride:
            feature = nn.avg_pool(
                feature, (3, 3), strides=(self.patch_stride, self.patch_stride),
                padding=((1, 1), (1, 1)),
            )
        x = ConvTower(self.num_convs, self.in_channels, dtype=self.dtype,
                      name="dis_tower")(feature)
        x = Conv(1, 3, dtype=self.dtype, name="cls_logits")(x).astype(jnp.float32)
        return _bce_with_logits(x, target)


class FCOSDiscriminatorCA(nn.Module):
    """Center-aware discriminator."""

    num_convs: int = 2
    in_channels: int = 256
    grl_lambda: float = 0.1
    center_aware_weight: float = 20.0
    center_aware_type: str = "ca_feature"
    grl_applied_domain: str = "both"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feature, target: float, score_map=None, domain: str = "source"):
        # attention map from detached score maps (reference CA.py:61-70)
        box_cls = jax.lax.stop_gradient(score_map["box_cls"])
        ctr = jax.lax.stop_gradient(score_map["centerness"])
        cls_prob = jax.nn.sigmoid(box_cls)
        ctr_prob = jax.nn.sigmoid(ctr)
        maxpooled = jnp.max(cls_prob, axis=-1, keepdims=True)  # AdaptiveMaxPool3d over C
        atten = jax.nn.sigmoid(self.center_aware_weight * maxpooled * ctr_prob)

        tower = ConvTower(self.num_convs, self.in_channels, dtype=self.dtype,
                          name="dis_tower")
        head = Conv(1, 3, dtype=self.dtype, name="cls_logits")

        apply_grl = self.grl_applied_domain == "both" or domain == "target"

        if self.center_aware_type == "ca_loss":
            f = gradient_reversal(feature, self.grl_lambda) if apply_grl else feature
            x = head(tower(f)).astype(jnp.float32)
            t = target
            loss_map = (
                jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
            )
            return jnp.mean(atten * loss_map)

        f = atten * feature
        if apply_grl:
            f = gradient_reversal(f, self.grl_lambda)
        x = head(tower(f)).astype(jnp.float32)
        if self.center_aware_type == "focal":
            bce = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
            pt = jnp.exp(-bce)
            return jnp.mean(((1 - pt) ** 5.0) * bce)
        return _bce_with_logits(x, target)


class FCOSDiscriminatorOut(nn.Module):
    """Output-space discriminator (aligns reg/cls/ctr prediction maps)."""

    num_convs: int = 2
    grl_lambda: float = 0.1
    out_weight: float = 0.5
    out_loss: str = "ce"
    outmap_op: str = "sigmoid"
    use_reg: bool = True
    use_cls: bool = True
    use_ctr: bool = True
    num_classes: int = 9
    base_dis_tower: bool = False
    patch_stride: Optional[int] = None
    grl_applied_domain: str = "both"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, score_map, target: float, domain: str = "source"):
        reg = score_map["box_regression"]
        cls = score_map["box_cls"]
        ctr = score_map["centerness"]
        maps = []
        if self.use_reg:
            maps.append(reg)
        if self.use_cls:
            maps.append(cls)
        if self.use_ctr:
            maps.append(ctr)
        x = jnp.concatenate(maps, axis=-1)
        # outmap ops (reference fcos_head_discriminator_out.py:150-165)
        if self.outmap_op == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif self.outmap_op == "maxpool":
            # AdaptiveMaxPool3d((1,h,w)) over the CLS channels only, then
            # concat (reg, pooled_cls, ctr) and sigmoid
            pooled = jnp.max(cls, axis=-1, keepdims=True)
            x = jax.nn.sigmoid(jnp.concatenate([reg, pooled, ctr], axis=-1))
        elif self.outmap_op == "attreg":
            # attention from pooled sigmoid cls x sigmoid ctr multiplied
            # into the (sigmoid) reg map (reference :157-162)
            assert len(maps) == 3, "attreg must align cls, reg, ctr"
            pooled = jnp.max(jax.nn.sigmoid(cls), axis=-1, keepdims=True)
            attmap = jax.nn.sigmoid(
                self.out_weight * pooled * jax.nn.sigmoid(ctr)
            )
            x = jnp.concatenate([attmap, jax.nn.sigmoid(reg)], axis=-1)
        elif self.outmap_op == "none":
            pass
        else:
            raise NotImplementedError(self.outmap_op)

        if self.grl_applied_domain == "both" or domain == "target":
            x = gradient_reversal(x, self.grl_lambda)

        ch = x.shape[-1]
        if self.base_dis_tower:
            x = ConvTower(self.num_convs, ch, dtype=self.dtype, name="dis_tower")(x)
        else:
            for i in range(self.num_convs):
                x = Conv(ch, 3, stride=2, dtype=self.dtype, name=f"dis_conv{i}")(x)
                x = nn.relu(x)
        x = Conv(1, 3, dtype=self.dtype, name="cls_logits")(x).astype(jnp.float32)

        # loss is NOT scaled by out_weight — in the reference out_weight
        # only weights the attreg attention map (out.py:161); the loss
        # weighting comes from the GRL lambda alone
        if self.out_loss == "focal":
            bce = jnp.maximum(x, 0) - x * target + jnp.log1p(jnp.exp(-jnp.abs(x)))
            pt = jnp.exp(-bce)
            return jnp.mean(((1 - pt) ** 5.0) * bce)
        return _bce_with_logits(x, target)


class FCOSDiscriminatorCon(nn.Module):
    """Conditional-Kernel-guided Alignment (CKA) — SCAN's discriminator."""

    num_convs: int = 4
    in_channels: int = 256
    num_classes: int = 9  # includes background; per-class heads use C-1
    fusion_cfg: str = "concat"
    grl_lambda: float = 0.02
    grl_applied_domain: str = "both"
    with_ga: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, feature, target: float, act_maps=None, domain: str = "source"):
        num_fg = self.num_classes - 1
        if self.grl_applied_domain == "both":
            feature = gradient_reversal(feature, self.grl_lambda)
            act_maps = gradient_reversal(act_maps, self.grl_lambda)
        elif domain == "target":
            feature = gradient_reversal(feature, self.grl_lambda)

        x = ConvTower(self.num_convs, self.in_channels, dtype=self.dtype,
                      name="dis_tower")(feature)

        # Per-class parameters keep the reference layout/names
        # (classifier_cls_{c}_{0,1}: (3,3,Cin(+1),128) then (3,3,128,1))
        # so torch checkpoints convert unchanged — but the N per-class
        # heads EXECUTE as one wide conv + grouped convs: a Python loop of
        # 2*N small convs per call compiles to 2*N separate kernels that
        # underfill the MXU; concatenating the kernels runs the same math
        # as N*128 output channels of a single conv (plus one grouped conv
        # for the per-class act-map tap and one for the 128->1 logits).
        cin = x.shape[-1]
        extra = 1 if self.fusion_cfg == "concat" else 0
        k0, b0, k1, b1 = [], [], [], []
        for c in range(num_fg):
            p0 = _HeadParams((3, 3, cin + extra, 128),
                             name=f"classifier_cls_{c}_0")()
            p1 = _HeadParams((3, 3, 128, 1), name=f"classifier_cls_{c}_1")()
            k0.append(p0[0]); b0.append(p0[1])
            k1.append(p1[0]); b1.append(p1[1])
        dt = x.dtype
        amaps = act_maps[..., 1:num_fg + 1]  # (B,H,W,N) skip bg channel

        if self.fusion_cfg == "concat":
            # h_c = relu(x (*) W_c[:,:, :cin] + amap_c (*) W_c[:,:,cin:] + b_c)
            wx = jnp.concatenate([k[:, :, :cin, :] for k in k0], -1)
            wa = jnp.concatenate([k[:, :, cin:, :] for k in k0], -1)
            h = jax.lax.conv_general_dilated(
                x, wx.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = h + jax.lax.conv_general_dilated(
                amaps.astype(dt), wa.astype(dt), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=num_fg,
            )
        else:
            if self.fusion_cfg == "mul_detached":
                amaps_f = jax.lax.stop_gradient(amaps)
            elif self.fusion_cfg == "mul":
                amaps_f = amaps
            else:
                raise KeyError(f"Unknown fusion config: {self.fusion_cfg}")
            # x_cls_c = x * amap_c differs per class -> grouped conv over
            # the class-stacked input (B,H,W,N*cin)
            xs = (x[..., None, :] * amaps_f[..., :, None].astype(dt))
            xs = xs.reshape(x.shape[:3] + (num_fg * cin,))
            h = jax.lax.conv_general_dilated(
                xs, jnp.concatenate(k0, -1).astype(dt), (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=num_fg,
            )
        h = nn.relu(h + jnp.concatenate(b0, -1).astype(dt))
        logits = jax.lax.conv_general_dilated(
            h, jnp.concatenate(k1, -1).astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=num_fg,
        ) + jnp.concatenate(b1, -1).astype(dt)
        logits = logits.astype(jnp.float32)  # (B,H,W,N)

        w = jax.lax.stop_gradient(amaps).astype(jnp.float32)
        bce = (
            jnp.maximum(logits, 0)
            - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        if num_fg > 1:
            # act-map-weighted BCE, normalised by the act-map mass
            # (reference con.py:119-121), per class
            per_cls = (jnp.sum(bce * w, axis=(0, 1, 2))
                       / jnp.maximum(jnp.sum(w, axis=(0, 1, 2)), 1e-6))
        else:
            per_cls = jnp.mean(bce, axis=(0, 1, 2))
        return jnp.sum(per_cls) / num_fg
