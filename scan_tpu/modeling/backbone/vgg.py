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


def _phase_packed_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a full-res 3x3 stride-1 kernel (3,3,Cin,Cout) to a stride-2
    (4,4,Cin,4*Cout) kernel whose output channel (qy*2+qx)*Cout+co is the
    full-res output pixel (2i+qy, 2j+qx) — i.e. the conv output arrives
    already space-to-depth packed.

    Output phase (qy, qx) reads full-res taps (2i+qy+du-1, 2j+qx+dv-1),
    du,dv in 0..2; the stride-2 conv window covers rows 2i-1..2i+2, so tap
    index = phase + du. 7/16 of the lifted taps are structural zeros
    (9 useful of 16 per phase -> 1.78x the naive FLOPs), but the 4*Cout
    output channels fill the 128 MXU lanes the 64-channel naive conv
    leaves half-empty (~190 vs ~70 TF/s measured on v5e), and the
    trailing 2x2 max-pool collapses into a channel-slice max that fuses
    into the conv epilogue instead of a full extra HBM pass.
    """
    kh, kw, cin, cout = w.shape
    ws = jnp.zeros((kh + 1, kw + 1, cin, 4 * cout), w.dtype)
    for qy in range(2):
        for qx in range(2):
            c0 = (qy * 2 + qx) * cout
            ws = ws.at[
                qy:qy + kh, qx:qx + kw, :, c0:c0 + cout
            ].add(w)
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
    # Space-to-depth stage 1 (exact numerics, same params), config knob
    # TPU.S2D_STEM. v2 lifts the two 3x3 convs into per-row-phase (2,3)-cell
    # kernels (4/3 the FLOPs instead of v1's 4x 3x3-cell lift) with
    # 128-channel outputs that fill the MXU lanes, and folds the 2x2
    # max-pool into a phase-max.
    s2d_stage1: bool = False
    dtype: Optional[object] = None
    quant: bool = False
    # Integer divisor on every stage width (floor 8). 1 == the real VGG-16
    # (checkpoint-compatible). >1 is for compile/correctness dryruns on
    # hosts where the full-width backbone is too slow (TPU.VGG_WIDTH_DIV);
    # every code path (stage layout, s2d stem, freezing, FPN taps) is
    # identical — only channel counts shrink.
    width_div: int = 1

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        channels = tuple(
            max(8, c // self.width_div) for c in VGG16_STAGE_CHANNELS
        )
        for stage, (blocks, ch) in enumerate(
            zip(VGG16_STAGE_BLOCKS, channels)
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
        """conv0 -> relu -> conv1 -> relu -> pool2x2 with conv1 as a
        phase-packed stride-2 conv (exact numerics; see
        _phase_packed_weight). conv0 stays naive — it is HBM-bound on its
        full-res 64-channel output either way. Parameters are declared at
        the SAME tree paths as the naive stem (conv0/Conv_0/...,
        conv1/Conv_0/...) so torch checkpoints and the naive path are
        interchangeable."""
        ch = max(8, VGG16_STAGE_CHANNELS[0] // self.width_div)
        k0, b0_raw = _ConvParamProxy(
            (3, 3, x.shape[-1], ch), name="conv0"
        )()
        k1, b1_raw = _ConvParamProxy((3, 3, ch, ch), name="conv1")()

        dt = self.dtype or x.dtype
        x = x.astype(dt)
        y = self._stem_conv("conv0_act", x, k0.astype(dt),
                            b0_raw.astype(dt), stride=1)
        y = nn.relu(y)
        w1 = _phase_packed_weight(k1).astype(dt)
        z = self._stem_conv("conv1_act", y, w1,
                            jnp.tile(b1_raw.astype(dt), 4), stride=2)
        # 2x2 max-pool == max over the four phase slices of the packed
        # output; relu commutes with max so it is applied once, after.
        # (A standalone Pallas kernel for this was measured SLOWER than
        # XLA's fused slice-max — XLA fuses the requant for the next conv
        # into the same pass; see docs/perf/PERF.md.)
        m = jnp.maximum(
            jnp.maximum(z[..., :ch], z[..., ch:2 * ch]),
            jnp.maximum(z[..., 2 * ch:3 * ch], z[..., 3 * ch:]),
        )
        return nn.relu(m)

    def _stem_conv(self, scale_name, x, w, b, stride):
        """fp conv, or w8a8 int8 conv when ``quant`` — with the same
        static-activation-scale calibration protocol as layers.Conv."""
        if not self.quant:
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        from ...ops.quant import int8_conv

        act_scale = None
        calibrating = (
            self.is_mutable_collection("act_scales")
            and not self.is_initializing()
        )
        if calibrating or self.has_variable("act_scales", scale_name):
            sv = self.variable(
                "act_scales", scale_name,
                lambda: jnp.zeros((), jnp.float32),
            )
            if calibrating:
                sv.value = jnp.maximum(
                    sv.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            else:
                act_scale = sv.value / 127.0
        return int8_conv(
            x, w, b, stride=stride, padding=((1, 1), (1, 1)),
            out_dtype=x.dtype, act_scale=act_scale,
        )
