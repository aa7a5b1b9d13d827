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


def _phase_pair_weights(w: jnp.ndarray):
    """Lift a 3x3 stride-1 kernel (3,3,Cin,Cout) into TWO stride-2
    row-phase-pair kernels of shape (3,4,Cin,2*Cout) — one per output row
    parity qy. Output channel qx*Cout+co of pair qy is the full-res output
    pixel (2i+qy, 2j+qx).

    vs the single packed (4,4,Cin,4*Cout) kernel (_phase_packed_weight):
    each pair kernel is 3 rows instead of 4, dropping the all-zero row the
    other parity needs — 2*(3*4)/(4*4) = 25% fewer MACs for the same
    exact arithmetic (the removed taps are structural zeros, so s32
    accumulation is unchanged). Pair qy=0 convolves with row padding
    (1,0); qy=1 with (0,1); both with column padding (1,1).
    """
    kh, kw, cin, cout = w.shape
    pairs = []
    for qy in range(2):
        ws = jnp.zeros((kh, kw + 1, cin, 2 * cout), w.dtype)
        for qx in range(2):
            ws = ws.at[:, qx:qx + kw, :, qx * cout:(qx + 1) * cout].add(w)
        pairs.append(ws)
    return pairs


def _phase_pair_weights_colsplit(w: jnp.ndarray) -> jnp.ndarray:
    """Lift a 3x3 stride-1 kernel (3,3,Cin,Cout) to consume the
    column-deinterleaved planar layout the Pallas conv0 kernel emits
    (ops/pallas/conv0_kernel.py): input (B, H, W/2, 2*Cin) where
    column-pair jj holds [planar col 2jj | 2jj+1].

    Returns ONE (3,3,2*Cin,2*Cout) kernel used by BOTH row-phase-pair
    convs (stride (2,1); pair qy differs only in row padding (1-qy, qy)).
    Output channel qx*Cout+co is the full-res conv output at planar
    column 2j+qx. Column tap dx reads pair jj+dx-1 (pad (1,1)):
      qx=0: col 2j-1 = (dx0, odd), 2j = (dx1, even), 2j+1 = (dx1, odd)
      qx=1: col 2j   = (dx1, even), 2j+1 = (dx1, odd), 2j+2 = (dx2, even)
    12 of 18 (dx, half) cells carry weight -> 294912 MACs per packed
    output position (vs 262144 packed, 196608 planar-pair) — the 12%
    overhead is bought back thirty-fold by conv0 leaving the XLA path.
    """
    kh, kw, cin, cout = w.shape
    ws = jnp.zeros((kh, kw, 2 * cin, 2 * cout), w.dtype)
    ws = ws.at[:, 0, cin:, :cout].add(w[:, 0])
    ws = ws.at[:, 1, :cin, :cout].add(w[:, 1])
    ws = ws.at[:, 1, cin:, :cout].add(w[:, 2])
    ws = ws.at[:, 1, :cin, cout:].add(w[:, 0])
    ws = ws.at[:, 1, cin:, cout:].add(w[:, 1])
    ws = ws.at[:, 2, :cin, cout:].add(w[:, 2])
    return ws


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


# Reference VGG init (mmcv weight_init.py kaiming_init: fan_out, relu):
# matters when training WITHOUT pretrained weights — normal(0.01) stem
# convs collapse the activation scale ~20x per layer, and with the first
# two stages frozen (vgg.py:131) the trainable tail then sees ~1e-5-scale
# features and never learns (observed on the synthetic DA-efficacy runs).
_VGG_CONV_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _InnerConvParams(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _VGG_CONV_INIT, self.shape)
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
    # >0: run the s2d stem over sub-batches of this size (lax.map) so the
    # full-res stage-1 intermediates bound HBM use (TPU.STEM_CHUNK).
    stem_chunk: int = 0
    # Fused Pallas stage-1 kernel (TPU.PALLAS_STEM); TPU backend only.
    pallas_stem: bool = False
    # int8 static path: fold ReLU+requant into the stem conv epilogues
    # (TPU.STEM_S8_EPILOGUE); False = fp-intermediate fallback.
    stem_s8_epilogue: bool = True
    # int8 static path: split the packed stride-2 conv into two row-phase
    # pair convs — 25% fewer MACs, bit-exact (TPU.STEM_PAIR_CONV).
    stem_pair_conv: bool = True
    # int8 static path: fused Pallas conv0+quantize kernel feeding
    # col-split pair convs (TPU.PALLAS_CONV0); TPU backend only.
    pallas_conv0: bool = False
    # int8 static path: one Pallas pass for phase-max + ReLU + the
    # successor requant (TPU.PALLAS_PHASE_MAX); TPU backend only.
    pallas_phase_max: bool = False
    # int8 static path: fully-fused Pallas stage-1 (XLA s8 im2col prep +
    # shuffle-free two-matmul kernel, ops/pallas/stem_int8_kernel.py);
    # TPU backend + static scales only (TPU.PALLAS_STEM_INT8).
    pallas_stem_int8: bool = False
    # XLA formulation of the phase-max ("slice" | "reshape" | "pair2") —
    # all bit-exact (max over the same four values, associativity only);
    # see TPU.PHASE_MAX_FORM in config/defaults.py for the measurements.
    phase_max_form: str = "slice"
    # int8 path: run the Cin=3 first conv as an explicit im2col matmul
    # (TPU.STEM_IM2COL_CONV0) — XLA's conv pads the 27-deep contraction
    # to the full 128-lane tile (~2.8% MXU util, 12.5 ms/batch32); the
    # 9-tap patch matmul trades one ~1 GB HBM pass for a 9x deeper
    # contraction. Bit-exact (ops/quant.int8_conv_im2col).
    stem_im2col: bool = False
    # Convs per stage (TPU.VGG_STAGE_BLOCKS). The real VGG-16 is
    # (2, 2, 3, 3, 3); dryruns shrink it through the identical stage
    # layout/freeze/tap code paths. The s2d stem requires the real
    # 2-conv stage 1 (it is TPU-only; dryruns run on the CPU backend).
    stage_blocks: tuple = VGG16_STAGE_BLOCKS

    @nn.compact
    def __call__(self, x):
        outs = []
        idx = 0
        channels = tuple(
            max(8, c // self.width_div) for c in VGG16_STAGE_CHANNELS
        )
        for stage, (blocks, ch) in enumerate(
            zip(self.stage_blocks, channels)
        ):
            if stage == 0 and self.s2d_stage1 and not self.with_bn:
                x = self._stage1_s2d(x)
                idx += self.stage_blocks[0]
            else:
                for b in range(blocks):
                    x = Conv(ch, 3, dtype=self.dtype, quant=self.quant,
                             kernel_init=_VGG_CONV_INIT,
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
            from ...ops.quant import QuantizedActivation

            if isinstance(x, QuantizedActivation):
                # int8-static stem output: the next Conv consumes the s8
                # tensor directly; the C1 tap gets the fp view (XLA
                # dead-code-eliminates it — the FPN only reads C3..C5).
                outs.append(x.dequantize(self.dtype or jnp.float32))
            else:
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

        calibrating_now = (
            self.is_mutable_collection("act_scales")
            and not self.is_initializing()
        )
        if (self.pallas_stem and not calibrating_now
                and not self.is_initializing()
                and jax.default_backend() == "tpu"
                and x.shape[1] % 8 == 0 and x.shape[2] % 16 == 0):
            # Fused Pallas stem: both convs + phase-max in VMEM, no
            # full-res HBM intermediates (ops/pallas/stem_kernel.py).
            # Runs bf16 (f32 accum) even under int8 inference. OFF by
            # default: measured 66 ms/batch32 on v5e vs ~44 ms for the
            # XLA int8 three-pass stem — the VMEM-relayout taxes Mosaic
            # imposes on the stride-2 access pattern outweigh the HBM
            # savings (measurements + lowering notes in
            # docs/perf/PERF.md round 3).
            from ...ops.pallas.stem_kernel import fused_s2d_stem

            return fused_s2d_stem(
                x, k0, b0_raw, k1, b1_raw, th=2,
                out_dtype=dt if dt != jnp.float32 else jnp.float32,
            )

        w0 = k0.astype(dt)
        b0 = b0_raw.astype(dt)
        w1 = _phase_packed_weight(k1).astype(dt)
        b1 = jnp.tile(b1_raw.astype(dt), 4)

        def _phase_max(z):
            # 2x2 max-pool == max over the four phase slices of the packed
            # output; relu commutes with max so it is applied once, after.
            # (A standalone Pallas kernel for this was measured SLOWER
            # than XLA's fused slice-max; see docs/perf/PERF.md.)
            # Three bit-exact XLA formulations (TPU.PHASE_MAX_FORM): the
            # 64-lane-offset slices of "slice" defeat the vectorizer;
            # "pair2" does the first max at a vreg-aligned 2C=128-lane
            # offset so 3/4 of the traffic moves at full vector width.
            if self.phase_max_form == "reshape":
                b_, h_, w_, c4 = z.shape
                return jnp.max(z.reshape(b_, h_, w_, 4, ch), axis=-2)
            if self.phase_max_form == "pair2":
                b_, h_, w_, c4 = z.shape
                m2 = jnp.max(z.reshape(b_, h_, w_, 2, 2 * ch), axis=-2)
                return jnp.max(m2.reshape(b_, h_, w_, 2, ch), axis=-2)
            return jnp.maximum(
                jnp.maximum(z[..., :ch], z[..., ch:2 * ch]),
                jnp.maximum(z[..., 2 * ch:3 * ch], z[..., 3 * ch:]),
            )

        calibrating = (
            self.is_mutable_collection("act_scales")
            and not self.is_initializing()
        )
        s0 = self._stem_scale("conv0_act", x if calibrating else None)
        if calibrating:
            y = nn.relu(self._apply_stem_conv(x, w0, b0, 1, s0))
            s1 = self._stem_scale("conv1_act", y)
            z = self._apply_stem_conv(y, w1, b1, 2, s1)
            out = nn.relu(_phase_max(z))
            self._stem_scale("stem_out_act", out)
            return out

        s1 = self._stem_scale("conv1_act", None)
        s_out = self._stem_scale("stem_out_act", None)

        # Fused int8 Pallas stem (TPU.PALLAS_STEM_INT8): XLA-side s8
        # im2col prep + a shuffle-free two-matmul kernel; the full-res
        # intermediates never reach HBM (ops/pallas/stem_int8_kernel.py,
        # VERDICT r4 #3). Exact int8_conv-chain numerics (same s8
        # operands, s32 accumulation, same epilogue order) — parity:
        # tests/test_stem_int8_kernel.py. Requires the static scales.
        if (self.quant and self.pallas_stem_int8 and not calibrating_now
                and not self.is_initializing()
                and s0 is not None and s1 is not None and s_out is not None
                and jax.default_backend() == "tpu" and ch == 64
                and x.shape[1] % 4 == 0 and x.shape[2] % 2 == 0):
            from ...ops.pallas.stem_int8_kernel import fused_stem_int8
            from ...ops.quant import QuantizedActivation, quantize_activation

            # tile height: th=8 blows the 16M scoped-VMEM stack at W=1344
            # (acc0/acc1 s32 + x12 concat scale linearly with th; measured
            # 16.76M on v5e) — th=4 is the largest that fits with headroom.
            th = next(t for t in (4, 2, 1) if (x.shape[1] // 2) % t == 0)
            x_q, _ = quantize_activation(x, s0)
            out = fused_stem_int8(
                x_q, k0.astype(jnp.float32), b0_raw.astype(jnp.float32),
                k1.astype(jnp.float32), b1_raw.astype(jnp.float32),
                s0, s1, s_out, th=th,
            )
            return QuantizedActivation(out, s_out)
        # Static int8 path: fold ReLU + the requant into each conv's
        # epilogue BEFORE the phase-max. Requant (round/clip at a scale
        # shared by all four phase slices — w_scale tiles identically) and
        # ReLU are monotonic non-decreasing, so they commute with max and
        # the result is bit-exact with quantize(relu(max(dequant))). The
        # payoff: the epilogue is now purely elementwise, XLA fuses it
        # into the conv, and only int8 ever reaches HBM — measured 59 ms
        # -> ~23 ms for the stem block at batch 32 800x1344 (the f32
        # (B,400,672,256) dequant intermediate disappears). The output is
        # a QuantizedActivation consumed directly by the next Conv.
        use_s8 = (
            self.quant and self.stem_s8_epilogue and s0 is not None
            and s1 is not None and s_out is not None
        )

        # Row-phase-pair split of the packed conv: 25% fewer MACs, exact
        # in s32 accumulation (see _phase_pair_weights). Only used when a
        # static scale is present so y is quantized once, not per-conv.
        use_pair = (
            self.quant and self.stem_pair_conv and s1 is not None
        )
        if use_pair:
            wp = [p.astype(dt) for p in _phase_pair_weights(k1)]
            b1p = jnp.tile(b1_raw.astype(dt), 2)

        def _pair_phase_max(y, requant_scale=None, relu=False):
            from ...ops.quant import int8_conv

            zs = [
                int8_conv(
                    y, wp[qy], b1p, stride=2,
                    padding=((1 - qy, qy), (1, 1)), act_scale=s1,
                    out_quant_scale=requant_scale, fold_relu=relu,
                )
                for qy in range(2)
            ]
            # Optional Pallas kernel (TPU.PALLAS_PHASE_MAX, off by
            # default like the pair-conv stem itself): XLA emits this
            # 4-slice s8 max as a standalone loop fusion at ~45% of HBM
            # BW (13.5 ms/batch32) because the 64-lane-offset slices
            # defeat its vectorizer; the kernel does the half-lane maxes
            # in-register and streams at the HBM floor. Bit-exact (same
            # max over the same s8 values).
            if (requant_scale is not None and relu
                    and self.pallas_phase_max
                    and not self.is_initializing()
                    and jax.default_backend() == "tpu"
                    and 2 * ch == 128):
                from ...ops.pallas.phase_max_kernel import pair_phase_max_s8

                return pair_phase_max_s8(zs[0], zs[1])
            return jnp.maximum(
                jnp.maximum(zs[0][..., :ch], zs[0][..., ch:]),
                jnp.maximum(zs[1][..., :ch], zs[1][..., ch:]),
            )

        # Pallas conv0+quantize kernel (ops/pallas/conv0_kernel.py): one
        # fused pass replaces XLA's MXU-starved Cin=3 conv AND the
        # unfusable full-res quantize pass; bit-exact. The successor
        # pair convs consume its column-deinterleaved layout via
        # _phase_pair_weights_colsplit. TPU backend + static scales only.
        use_pallas_conv0 = (
            self.quant and self.pallas_conv0 and s0 is not None
            and s1 is not None and not self.is_initializing()
            and jax.default_backend() == "tpu"
            and x.shape[2] % 16 == 0 and x.shape[1] % 16 == 0
        )
        if use_pallas_conv0:
            wcs = _phase_pair_weights_colsplit(k1).astype(dt)
            b1p2 = jnp.tile(b1_raw.astype(dt), 2)

        # Optional Pallas pass for phase-max + ReLU + the successor's
        # requant (phase_max_requant): reachable only when BOTH
        # STEM_S8_EPILOGUE and STEM_PAIR_CONV are off (when they are on,
        # the pair-conv branch above owns the tail via pair_phase_max_s8).
        # The round-4 default leaves ALL of these off — the plain XLA
        # slice-max below measured fastest end-to-end (202.2 img/s; the
        # kernel's layout demands cost more than its single pass saves,
        # PERF.md round 4). Bit-exact when enabled.
        use_pmax_kernel = (
            self.quant and self.pallas_phase_max and s1 is not None
            and s_out is not None and not use_s8 and not use_pair
            and not use_pallas_conv0 and not self.is_initializing()
            and jax.default_backend() == "tpu"
            and 4 * ch % 128 == 0  # lane guard: shrunken widths fall back
        )
        s_out_q = jnp.maximum(s_out, 1e-8) if use_pmax_kernel else None

        def _pallas_body(xc):
            from ...ops.pallas.conv0_kernel import conv0_s8
            from ...ops.quant import int8_conv, quantize_activation

            x_q, _ = quantize_activation(xc, s0)
            y_cd = conv0_s8(x_q, k0.astype(jnp.float32),
                            b0_raw.astype(jnp.float32), s0, s1, tr=8)
            zs = [
                int8_conv(
                    y_cd, wcs, b1p2, stride=(2, 1),
                    padding=((1 - qy, qy), (1, 1)), act_scale=s1,
                )
                for qy in range(2)
            ]
            m = jnp.maximum(
                jnp.maximum(zs[0][..., :ch], zs[0][..., ch:]),
                jnp.maximum(zs[1][..., :ch], zs[1][..., ch:]),
            )
            return nn.relu(m)

        def body(xc):
            if use_pallas_conv0:
                return _pallas_body(xc)
            if use_s8:
                from ...ops.quant import int8_conv, int8_conv_im2col

                if self.stem_im2col:
                    y_q = int8_conv_im2col(
                        xc, w0, b0, act_scale=s0, out_quant_scale=s1,
                        fold_relu=True,
                    )
                else:
                    y_q = int8_conv(
                        xc, w0, b0, stride=1, padding=((1, 1), (1, 1)),
                        act_scale=s0, out_quant_scale=s1, fold_relu=True,
                    )
                if use_pair:
                    return _pair_phase_max(y_q, requant_scale=s_out,
                                           relu=True)
                z_q = int8_conv(
                    y_q, w1, b1, stride=2, padding=((1, 1), (1, 1)),
                    act_scale=s1, out_quant_scale=s_out, fold_relu=True,
                )
                return _phase_max(z_q)
            y = nn.relu(self._apply_stem_conv(xc, w0, b0, 1, s0))
            if use_pair:
                return nn.relu(_pair_phase_max(y))
            z = self._apply_stem_conv(y, w1, b1, 2, s1)
            if use_pmax_kernel:
                from ...ops.pallas.phase_max_kernel import phase_max_requant

                return phase_max_requant(z, s_out_q)
            return nn.relu(_phase_max(z))

        chunk = int(self.stem_chunk)
        b = x.shape[0]
        if chunk <= 0 or b <= chunk or b % chunk != 0:
            out = body(x)
        else:
            # TPU.STEM_CHUNK: run stage 1 over sub-batches via lax.map so
            # the full-resolution intermediates (the HBM-capacity limiter
            # — 138 MB/img bf16 at 800x1344) exist for only `chunk` images
            # at a time; batch 48+ fits where the unchunked stem OOMs.
            # Exact same numerics per image (static scales are fetched
            # once, outside the loop).
            xs = x.reshape((b // chunk, chunk) + x.shape[1:])
            out = jax.lax.map(body, xs)
            out = out.reshape((b,) + out.shape[2:])
        if use_s8 and not use_pallas_conv0:
            from ...ops.quant import QuantizedActivation

            return QuantizedActivation(out, s_out)
        if use_pmax_kernel:
            from ...ops.quant import QuantizedActivation

            return QuantizedActivation(out, s_out_q)
        return out

    def _stem_scale(self, scale_name, calib_input):
        """Static-activation-scale protocol shared with layers.Conv: during
        calibration accumulate |x|max into the variable; otherwise return
        the stored scale (or None for the dynamic-quant / fp paths)."""
        if not self.quant:
            return None
        calibrating = calib_input is not None
        if calibrating or self.has_variable("act_scales", scale_name):
            sv = self.variable(
                "act_scales", scale_name,
                lambda: jnp.zeros((), jnp.float32),
            )
            if calibrating:
                sv.value = jnp.maximum(
                    sv.value,
                    jnp.max(jnp.abs(calib_input.astype(jnp.float32))),
                )
                return None
            return sv.value / 127.0
        return None

    def _apply_stem_conv(self, x, w, b, stride, act_scale):
        """fp conv, or w8a8 int8 conv when ``quant`` (pure — safe under
        lax.map; variables are handled by _stem_scale outside)."""
        if not self.quant:
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
        if (self.stem_im2col and stride == 1 and w.shape[:2] == (3, 3)
                and act_scale is not None):
            from ...ops.quant import int8_conv_im2col

            return int8_conv_im2col(
                x, w, b, out_dtype=x.dtype, act_scale=act_scale,
            )
        from ...ops.quant import int8_conv

        return int8_conv(
            x, w, b, stride=stride, padding=((1, 1), (1, 1)),
            out_dtype=x.dtype, act_scale=act_scale,
        )
