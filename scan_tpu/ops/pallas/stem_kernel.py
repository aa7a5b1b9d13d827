"""Fused VGG stage-1 stem as a Pallas TPU kernel.

Replaces the XLA three-pass stem (conv1_1 -> HBM -> packed conv1_2 -> HBM
-> phase-max/requant pass) with ONE kernel per (image, row-tile): the
full-resolution intermediates never leave VMEM. At 800x1344 the XLA int8
stem block costs ~33 ms per 24-image batch (conv1_1 10.4 + packed conv1_2
12.8 + phase-max/requant 10.1; docs/perf/PERF.md trace tables); the fused
kernel's HBM traffic is the input read + pooled output write only.

Math (identical to vgg.py::_stage1_s2d, which is itself exact vs the naive
stem — tests/test_s2d_stem.py):

    y = relu(conv3x3(x, w0) + b0)              # stride 1, pad 1
    z = conv3x3(y, w1) + b1                    # stride 1, pad 1
    out = relu(maxpool2x2(z))                  # relu commutes with max

Mosaic (the Pallas TPU backend) rejects strided vector slices, minor-dim
reshapes/pads, lane-unaligned DMA block shapes, and concats of
mixed-offset pieces (all probed on hardware) — so every stride-2 access
pattern is re-expressed with the primitives it does support:

* The padded input is column-deinterleaved OUTSIDE the kernel into a
  sublane-folded layout ``(B, Hp*8, WDp)``: sublane ``v*8 + c`` holds
  padded row v, channel c, where c in 0:3 = even column (real col
  2T-4), 3:6 = odd column (2T-3), 6:8 = zero; WDp is 128-aligned so
  the halo-band DMA slices only the sublane dim at multiples of 8.
* conv0: nine (row-offset dy x column-tap t) slices of the band are
  stored into a VMEM scratch at sublane offsets (stores canonicalize
  the sliced pieces' layouts), building a (r_rows, 72, wd_out) im2col
  operand; each row then runs one transposed-lhs matmul
  ``(72, wd_out)^T @ (72, 2ch)`` on the MXU — output channels are
  ``[even-col y | odd-col y]`` (128 lanes).
* The row-parity split of y is a leading-dim reshape ``(R, wd, 2ch) ->
  (R/2, 2, wd, 2ch)`` — free on TPU (leading dims are untiled).
* conv1 + 2x2 pool: pooled-output row r needs y rows {2r-1..2r+2} =
  two consecutive entries of each parity array (stride-1 leading
  slices); columns {2c-1..2c+2} live in channel halves of column taps
  {c, c+1, c+2} (stride-1 sublane slices). The 12 (row source x column
  tap) pieces lane-concatenate (128-aligned pieces lower fine) into ONE
  (th*W/2, 24ch) @ (24ch, 4ch) matmul computing all four pool phases at
  once (4ch = 4 phases x ch); unused (tap, half) combos carry zero
  weight. K=1536/N=256 fills the MXU; the redundancy is 1.5x the FLOPs
  of the ideal packed form. Max over the 4 phase lane-slices = the
  2x2 maxpool.

Grid: (B, H/2 // th). Rows/cols of y outside the real conv0 output range
are zeroed so conv1 sees the same zero padding XLA's conv would.

Parity target: reference ``fcos_core/modeling/backbone/mmdetection/vgg.py``
stage 1 (features.0 conv, features.2 conv, features.4 maxpool).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv0_tap_weights(w0, ch):
    """(3,3,3,ch) -> (72, 2*ch) im2col weight, tap k = dy*3 + t at rows
    8k..8k+8.

    Input channels c: 0:3 = even column (real col 2T-4 after pad-4),
    3:6 = odd (2T-3), 6:8 = zero padding. Output half 0:ch = y at even
    cols (2Cs-2), ch:2ch = odd (2Cs-1); see module docstring.
    """
    w = jnp.zeros((3, 3, 8, 2 * ch), w0.dtype)
    for dy in range(3):
        # even output half: taps (t=0, odd), (t=1, even), (t=1, odd)
        w = w.at[dy, 0, 3:6, :ch].set(w0[dy, 0])
        w = w.at[dy, 1, 0:3, :ch].set(w0[dy, 1])
        w = w.at[dy, 1, 3:6, :ch].set(w0[dy, 2])
        # odd output half: taps (t=1, even), (t=1, odd), (t=2, even)
        w = w.at[dy, 1, 0:3, ch:].set(w0[dy, 0])
        w = w.at[dy, 1, 3:6, ch:].set(w0[dy, 1])
        w = w.at[dy, 2, 0:3, ch:].set(w0[dy, 2])
    return w.reshape(72, 2 * ch)


def _conv1_tap_weights(w1, ch):
    """(3,3,ch,ch) -> (12, 2*ch, 4*ch) per-tap weights, k = s_r*3 + t_c.

    Row source s_r = py+dy; e = px+dx selects (t_c, half):
    0->(0,odd) 1->(1,even) 2->(1,odd) 3->(2,even). Output: 4 pool phases
    (py,px) x ch.
    """
    e2tap = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}
    w = jnp.zeros((4, 3, 2, ch, 4 * ch), w1.dtype)
    for py in range(2):
        for px in range(2):
            o0 = (py * 2 + px) * ch
            for dy in range(3):
                for dx in range(3):
                    t_c, half = e2tap[px + dx]
                    w = w.at[py + dy, t_c, half, :, o0:o0 + ch].set(
                        w1[dy, dx]
                    )
    return w.reshape(12, 2 * ch, 4 * ch)


def _stem_kernel(x_hbm, w0_ref, b0_ref, w1_ref, b1_ref, out_ref,
                 x_vmem, x72, sem, *, th, h_img, w_img, wd_out, ch, nb):
    """One (image, row-tile) program; input bands are double-buffered
    across the sequential grid steps.

    x_hbm: (B, Hp*8, WDp) sublane-folded deinterleaved input, HBM.
    w0_ref: (72, 2*ch) conv0 im2col weight.
    w1_ref: (24*ch, 4*ch) fused conv1+pool im2col weight.
    out_ref: (1, th, W/2, ch) output block.
    x_vmem: (2, (2*th+4)*8, WDp) double-buffered input-band scratch.
    x72: (2*th+2, 72, wd_out) conv0 im2col scratch.
    nb: grid size along the row-tile dim (static) — for the global step
        index that drives the double-buffer schedule.
    """
    bi = pl.program_id(0)
    i = pl.program_id(1)
    r_rows = 2 * th + 2        # conv0 output rows needed by this tile
    w2 = w_img // 2
    band8 = (2 * th + 4) * 8
    total = pl.num_programs(0) * nb
    step = bi * nb + i
    slot = jax.lax.rem(step, 2)

    def start_dma(s, sl):
        b_s = jax.lax.div(s, nb)
        i_s = jax.lax.rem(s, nb)
        pltpu.make_async_copy(
            x_hbm.at[b_s, pl.ds(i_s * (2 * th) * 8, band8)],
            x_vmem.at[sl], sem.at[sl],
        ).start()

    @pl.when(step == 0)
    def _warmup():
        start_dma(step, slot)

    @pl.when(step + 1 < total)
    def _prefetch():
        start_dma(step + 1, 1 - slot)

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * (2 * th) * 8, band8)],
        x_vmem.at[slot], sem.at[slot],
    ).wait()

    dt = out_ref.dtype

    # ---- conv0 im2col via scratch stores (canonicalize layouts) ----
    x3 = x_vmem[slot].reshape(2 * th + 4, 8, x_vmem.shape[-1])
    for dy in range(3):
        for t in range(3):
            k = dy * 3 + t
            x72[:, 8 * k:8 * (k + 1), :] = jax.lax.slice(
                x3, (dy, 0, t), (dy + r_rows, 8, t + wd_out)
            )
    # one (r_rows*wd_out, 72) @ (72, 2ch) matmul (XLU transpose + merge)
    xi = jnp.transpose(x72[:], (0, 2, 1)).reshape(r_rows * wd_out, 72)
    y = jax.lax.dot_general(
        xi.astype(dt), w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(r_rows, wd_out, 2 * ch)
    y = jnp.maximum(y + b0_ref[0].astype(jnp.float32), 0.0)
    # conv1 must see ZERO outside conv0's real output range (XLA pads y
    # with zeros). Local row r' is y row v = 2*i*th - 1 + r'; both column
    # halves of index Cs are valid iff 1 <= Cs <= W/2. Full-rank iotas:
    # a [..., None] reshape of a 2D bool mask is a minor-dim insertion
    # on an i1 vector, which Mosaic cannot lower.
    shp3 = (r_rows, wd_out, 2 * ch)
    row_g = jax.lax.broadcasted_iota(jnp.int32, shp3, 0) \
        + (i * 2 * th - 1)
    col_g = jax.lax.broadcasted_iota(jnp.int32, shp3, 1)
    valid = ((row_g >= 0) & (row_g < h_img)
             & (col_g >= 1) & (col_g <= w2))
    y = jnp.where(valid, y, 0.0)

    # ---- conv1+pool: one (th*w2, 24ch) @ (24ch, 4ch) matmul ----
    # row parity split: free leading-dim reshape; parity 0 = y rows
    # v0, v0+2, ... (odd global rows since v0 = 2*i*th - 1)
    yr = y.reshape(r_rows // 2, 2, wd_out, 2 * ch)
    row_srcs = [
        jax.lax.slice(yr, (0, 0, 0, 0), (th, 1, wd_out, 2 * ch)),
        jax.lax.slice(yr, (0, 1, 0, 0), (th, 2, wd_out, 2 * ch)),
        jax.lax.slice(yr, (1, 0, 0, 0), (th + 1, 1, wd_out, 2 * ch)),
        jax.lax.slice(yr, (1, 1, 0, 0), (th + 1, 2, wd_out, 2 * ch)),
    ]
    # lane-concat the 12 taps (128-aligned pieces lower fine) into one
    # (th*w2, 24ch) operand -> ONE MXU matmul instead of 12 accumulated
    # ones (per-dot fixed costs dominated the first version)
    taps = []
    for rs in row_srcs:
        for t_c in range(3):
            taps.append(jax.lax.slice(
                rs, (0, 0, t_c, 0), (th, 1, t_c + w2, 2 * ch)
            ).reshape(th * w2, 2 * ch).astype(dt))
    x12 = jnp.concatenate(taps, axis=-1)
    z = jax.lax.dot_general(
        x12, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = z + b1_ref[0].astype(jnp.float32)
    # 2x2 maxpool == max over the 4 phase slices of the 4ch-lane output
    # (static lane slices — splitting the minor dim via reshape is not
    # lowerable by Mosaic)
    m = jnp.maximum(
        jnp.maximum(z[:, :ch], z[:, ch:2 * ch]),
        jnp.maximum(z[:, 2 * ch:3 * ch], z[:, 3 * ch:]),
    )
    out_ref[0] = jnp.maximum(m, 0.0).astype(dt).reshape(th, w2, ch)


@functools.partial(jax.jit, static_argnames=("th", "out_dtype"))
def fused_s2d_stem(x, w0, b0, w1, b1, th: int = 2, out_dtype=jnp.bfloat16):
    """x: (B, H, W, 3) float; w0: (3,3,3,ch); w1: (3,3,ch,ch).

    Returns (B, H/2, W/2, ch) == relu(maxpool2x2(relu(conv(relu(conv(x,
    w0)+b0), w1)+b1))) — the exact semantics of vgg._stage1_s2d.
    """
    b, h, w_img, _ = x.shape
    ch = w0.shape[-1]
    assert h % (2 * th) == 0, (h, th)
    assert w_img % 16 == 0, w_img   # W/2 must be sublane-aligned (x8)
    dt = out_dtype
    w2 = w_img // 2
    # conv0 output cols, rounded up to a multiple of 8 so in-kernel
    # (M, 2ch) <-> (rows, wd_out, 2ch) reshapes are layout no-ops
    wd_out = -(-(w2 + 2) // 8) * 8
    # deinterleaved input cols (taps 0..2), lane dim of the DMA-sliced
    # array -> must be 128-aligned
    wdp = -(-(wd_out + 2) // 128) * 128

    # pad rows by 2; cols by 4 on the left (halo for the deinterleaved
    # taps) and enough on the right to reach 2*wdp; f32 (16-bit packed
    # tiles cannot be memref-sliced for the halo DMA)
    xp = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (2, 2), (4, 2 * wdp - w_img - 4), (0, 0)),
    )
    # sublane-folded deinterleave: (B, Hp, WDp, 2, 3) -> channels-major
    # (B, Hp, 8, WDp) -> (B, Hp*8, WDp); c = parity*3 + rgb, 6:8 zero
    xv = xp.reshape(b, h + 4, wdp, 2, 3).transpose(0, 1, 3, 4, 2)
    xv = jnp.pad(
        xv.reshape(b, h + 4, 6, wdp), ((0, 0), (0, 0), (0, 2), (0, 0))
    ).reshape(b, (h + 4) * 8, wdp)

    w0r = _conv0_tap_weights(w0.astype(jnp.float32), ch).astype(dt)
    w1r = _conv1_tap_weights(w1.astype(jnp.float32), ch) \
        .reshape(24 * ch, 4 * ch).astype(dt)
    b0d = jnp.tile(b0.astype(jnp.float32), 2).reshape(1, 2 * ch)
    b1d = jnp.tile(b1.astype(jnp.float32), 4).reshape(1, 4 * ch)

    grid = (b, (h // 2) // th)
    out = pl.pallas_call(
        functools.partial(
            _stem_kernel, th=th, h_img=h, w_img=w_img, wd_out=wd_out,
            ch=ch, nb=grid[1],
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((72, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24 * ch, 4 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * ch), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_img // 2, ch), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w_img // 2, ch), dt),
        scratch_shapes=[
            pltpu.VMEM((2, (2 * th + 4) * 8, wdp), jnp.float32),
            pltpu.VMEM((2 * th + 2, 72, wd_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xv, w0r, b0d, w1r, b1d)
    return out


def reference_stem(x, w0, b0, w1, b1, dtype=jnp.bfloat16):
    """Plain-XLA oracle: conv-relu-conv-relu-maxpool (naive stem)."""
    dt = dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w0.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b0.astype(dt)
    y = jax.nn.relu(y)
    z = jax.lax.conv_general_dilated(
        y, w1.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(dt)
    z = jax.nn.relu(z)
    return jax.lax.reduce_window(
        z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ).astype(dt)
