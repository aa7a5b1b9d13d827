"""Fused int8 conv0+quantize Pallas kernel for the VGG stem.

The stem's first conv (3x3, Cin=3 -> 64) is the worst op XLA emits for
this model on v5e: the 3-deep reduction fills 3/128 of the MXU's
contraction dimension (~9.5 TF/s measured, 14.5 ms/batch32), and because
XLA cannot fuse round/clip-to-int8 into a convolution fusion, the
successor's quantize costs a second full-res HBM pass (19.3 ms reading
the bf16 y and writing s8). This kernel computes BOTH in one pass:

    y   = relu(conv3x3(x, w0) + b0)          # stride 1, pad 1
    y_q = clip(round(y / s1), -127, 127)     # successor's static scale

as an im2col matmul with K=72 (56% MXU fill) and a fused epilogue,
writing only the int8 result to HBM: ~2.3 GB of traffic instead of
~15 GB. The dot runs bf16 x bf16 -> f32: quantized values are integers
<= 127, whose bf16 products accumulate exactly in f32, so the result is
BIT-EXACT vs the XLA int8 path (and the epilogue round-trips through
bf16 exactly where vgg.py does). s8 im2col was rejected by layout: tap
stores land at 8-sublane offsets, misaligned for the (32,128) s8 tile
(f32 tiles are (8,128) — aligned).

Layouts (Mosaic rejects strided vector slices and minor-dim reshapes —
see ops/pallas/stem_kernel.py for the probe notes):

* input: the s8-quantized image is column-deinterleaved OUTSIDE the
  kernel into a sublane-folded (B, (H+2)*8, WDp) array — sublane
  v*8 + c of padded row v holds channel c: c in 0:3 = even planar
  column 2T-2, 3:6 = odd column 2T-1, 6:8 = zero. The row-band DMA
  then slices only the sublane dim at multiples of 8.
* im2col: nine static (dy, tap) slices of the band are STORED into a
  (2*tr, 72, wd) VMEM scratch (stores canonicalize layouts); each
  y-row runs one transposed-lhs (72, wd)^T @ (72, 128) int8 matmul —
  output lanes are [y at even cols | y at odd cols].
* output: (B, H, W/2, 128) with channels [even-column y | odd-column
  y] — exactly the kernel's natural register layout, so no in-kernel
  interleave. The successor conv consumes this "column-deinterleaved
  planar" form via lifted (3, 3, 128, 2*Cout) weights
  (vgg._phase_pair_weights_colsplit).

Parity target: reference fcos_core/modeling/backbone/mmdetection/vgg.py
stage-1 first conv (features.0) + the w8a8 quantization protocol of
ops/quant.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stem_kernel import _conv0_tap_weights


def _kernel(x_hbm, w_ref, scale_ref, bias_ref, s1_ref, out_ref,
            x_vmem, x72, sem, *, tr, wd, nb):
    """One (image, row-tile) program: tr packed output rows = 2*tr planar
    y rows; input bands double-buffered across sequential grid steps.

    x_hbm: (B, (H+2)*8, WDp) folded s8 input (HBM).
    w_ref: (72, 128) s8 im2col weights.
    scale_ref/bias_ref: (1, 128) f32 dequant scale (s0*w_scale, tiled
        [even|odd]) and bias. s1_ref: (1, 128) f32 successor scale.
    out_ref: (1, 2*tr, wd, 128) block of the (B, H, wd, 128) output.
    x_vmem: (2, (2*tr+2)*8, WDp) double-buffered band scratch (s8).
    x72: (2*tr, 72, wd) f32 im2col scratch.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    rows = 2 * tr           # planar y rows this tile
    band8 = (rows + 2) * 8
    total = pl.num_programs(0) * nb
    step = bi * nb + i
    slot = jax.lax.rem(step, 2)

    def start_dma(s, sl):
        b_s = jax.lax.div(s, nb)
        i_s = jax.lax.rem(s, nb)
        pltpu.make_async_copy(
            x_hbm.at[b_s, pl.ds(i_s * rows * 8, band8)],
            x_vmem.at[sl], sem.at[sl],
        ).start()

    @pl.when(step == 0)
    def _warmup():
        start_dma(step, slot)

    @pl.when(step + 1 < total)
    def _prefetch():
        start_dma(step + 1, 1 - slot)

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * rows * 8, band8)],
        x_vmem.at[slot], sem.at[slot],
    ).wait()

    # im2col: tap k = dy*3 + t at sublanes 8k..8k+8 (see
    # _conv0_tap_weights; the fold gives channel c = parity*3 + rgb)
    x3 = x_vmem[slot].reshape(rows + 2, 8, x_vmem.shape[-1])
    for dy in range(3):
        for t in range(3):
            k = dy * 3 + t
            x72[:, 8 * k:8 * (k + 1), :] = jax.lax.slice(
                x3, (dy, 0, t), (dy + rows, 8, t + wd)
            ).astype(jnp.float32)

    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    s1 = s1_ref[0].astype(jnp.float32)

    for j in range(rows):
        acc = jax.lax.dot_general(
            x72[j].astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (wd, 128); exact: integer-valued bf16 operands
        # exact vgg.py epilogue: dequant+bias -> bf16 -> relu ->
        # quantize at the successor's static scale
        y = jnp.maximum(
            (acc * scale + bias).astype(jnp.bfloat16).astype(jnp.float32),
            0.0,
        )
        q = jnp.clip(jnp.round(y / s1), -127.0, 127.0)
        out_ref[0, j] = q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("tr",))
def conv0_s8(x_q, w0, b0, s0, s1, tr: int = 8):
    """x_q: (B, H, W, 3) int8 (pre-quantized at scale s0); w0: (3,3,3,64)
    fp32 params; s0/s1: f32 scalars (this conv's and the successor's
    static activation scales, already /127).

    Returns (B, H, W/2, 128) int8: channels 0:64 = quantize(relu(conv0)
    + b0, s1) at even planar columns, 64:128 at odd columns.
    """
    b, h, w_img, _ = x_q.shape
    ch = w0.shape[-1]
    assert ch == 64 and x_q.dtype == jnp.int8
    assert h % (2 * tr) == 0 and w_img % 16 == 0, (h, w_img, tr)
    w2 = w_img // 2
    wd = -(-w2 // 8) * 8          # lane-dim of im2col scratch
    wdp = -(-(wd + 2) // 128) * 128

    # quantize weights per-channel exactly as ops/quant.quantize_weight
    w0f = w0.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w0f), axis=(0, 1, 2))
    w_scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w0f / w_scale), -127, 127).astype(jnp.int8)

    # fold: pad rows (1,1), cols (2, to 2*wdp); deinterleave columns into
    # sublanes (see module docstring). All s8 — ~0.1 GB of traffic.
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (2, 2 * wdp - w_img - 2), (0, 0)))
    xv = xp.reshape(b, h + 2, wdp, 2, 3).transpose(0, 1, 3, 4, 2)
    xv = jnp.pad(
        xv.reshape(b, h + 2, 6, wdp), ((0, 0), (0, 0), (0, 2), (0, 0))
    ).reshape(b, (h + 2) * 8, wdp)

    w72 = _conv0_tap_weights(w_q.astype(jnp.float32), ch)
    w72 = w72.astype(jnp.bfloat16)  # exact: integer values <= 127
    scale = jnp.tile(w_scale, 2).reshape(1, 2 * ch) * s0
    bias = jnp.tile(b0.astype(jnp.float32), 2).reshape(1, 2 * ch)
    s1v = jnp.full((1, 2 * ch), s1, jnp.float32)

    grid = (b, h // (2 * tr))
    out = pl.pallas_call(
        functools.partial(_kernel, tr=tr, wd=wd, nb=grid[1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((72, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * tr, wd, 2 * ch), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, 2 * ch), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, (2 * tr + 2) * 8, wdp), jnp.int8),
            pltpu.VMEM((2 * tr, 72, wd), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xv, w72, scale, bias, s1v)
    return out[:, :, :w2]


def reference_conv0_s8(x_q, w0, b0, s0, s1):
    """Plain-XLA oracle with identical arithmetic: int8 conv + the vgg.py
    bf16 epilogue + quantize, then column-deinterleaved to the kernel's
    output layout."""
    w0f = w0.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w0f), axis=(0, 1, 2))
    w_scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w0f / w_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * (w_scale * s0)
         + b0.astype(jnp.float32)).astype(jnp.bfloat16)
    y = jnp.maximum(y.astype(jnp.float32), 0.0)
    q = jnp.clip(jnp.round(y / s1), -127, 127).astype(jnp.int8)
    b, h, w_img, ch = q.shape
    # column-deinterleave: channels [even-col block | odd-col block]
    return q.reshape(b, h, w_img // 2, 2 * ch)
