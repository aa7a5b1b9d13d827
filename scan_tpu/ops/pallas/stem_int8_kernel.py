"""Fused int8 VGG stage-1 stem: s8 input -> pooled stage-1 s8, one kernel.

VERDICT r4 #3: attack the stem's measured floor (conv1_1 12.5 ms +
packed conv1_2 14.6 ms + phase-max 13.5 ms per 24-image batch at
800x1344) with a fused kernel that never materialises the full-res
f32/bf16 intermediates in HBM.

Design — informed by the two measured Pallas-stem negatives
(docs/perf/PERF.md rounds 3-4):

* The bf16 ``stem_kernel.fused_s2d_stem`` lost (66 vs 44 ms) because the
  IN-KERNEL im2col shuffling (9 scratch stores + a sublane<->lane
  transpose per tile) cost more than the HBM round-trips it saved. Here
  the im2col runs in XLA as a strided-slice/concat fusion writing a
  compact s8 operand (~1.7 GB/batch32, ~2 ms at HBM BW), and the kernel
  body is shuffle-free: two MXU matmuls plus element-wise epilogues.
* The 2D phase-max kernel lost to a 13 ms XLA relayout copy because it
  demanded a row-major layout from a conv. Here no XLA conv feeds the
  kernel — the prep layout IS the matmul operand layout.

Pipeline (exact int8 semantics of the ``STEM_S8_EPILOGUE`` XLA chain,
ops/quant.int8_conv with fold_relu + out_quant_scale):

  XLA prep:  x_q (B,H,W,3) s8 @ s0
             -> pair-column im2col bands (B, nb, r_rows*(W/2+2), K) s8
                K = (dy*4 + e)*3 + c  (36 used taps, lane-padded)
  kernel  :  conv0 = bands @ W0 (K,128)          [int8 MXU, s32 acc]
             y = relu(acc*(s0*w0_s) + b0); y_q = clip(round(y/s1))
             mask rows/cols outside the real conv0 range (zero padding)
             x12 = lane-concat of 12 (row-source x col-tap) slices
             conv1 = x12 @ W1 (1536,256)         [int8 MXU, s32 acc]
             z = acc*(s1*w1_s) + b1; z_q = clip(round(z/s_out), 0, 127)
             out = max over the four 64-lane phase slices  (2x2 pool)

Output: (B, H/2, W/2, 64) s8 at scale s_out — a QuantizedActivation for
stage 2, same contract as the s8-epilogue path.

Parity target: reference ``fcos_core/modeling/backbone/mmdetection/vgg.py``
stage 1 (conv1_1, conv1_2, 2x2 maxpool); numerics: bit-exact vs the
``int8_conv`` chain (same s8 operands, s32 accumulation — integer
reassociation is exact — same f32 epilogue order; requant/ReLU commute
with the pool max as both are monotone and the four phases share their
per-channel scale).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import quantize_weight


def _conv0_pair_matrix(w0_q, kpad: int):
    """(3,3,3,64) s8 -> (kpad, 128) s8 im2col weight.

    K index k = (dy*4 + e)*3 + c over the prep's pair-column layout
    (e = padded column offset within the 4-column union a pair needs).
    Output lanes: [:64] = even full-res column of the pair, [64:] = odd.
    """
    W = jnp.zeros((kpad, 128), jnp.int8)
    for dy in range(3):
        for dx in range(3):
            for half, e in ((0, dx), (1, dx + 1)):
                k0 = (dy * 4 + e) * 3
                W = W.at[k0:k0 + 3, half * 64:(half + 1) * 64].set(
                    w0_q[dy, dx]
                )
    return W


# pooled-output column offset e = px + dx -> (col-pair tap, parity half)
_E2TAP = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0)}


def _conv1_pair_matrix(w1_q):
    """(3,3,64,64) s8 -> (12*128, 256) s8 fused conv1+pool weight.

    K blocks: (row source s_r = py+dy) x (col-pair tap t_c), each 128 =
    [even y | odd y]. Output: 4 pool phases (py,px) x 64 channels. The
    structurally-zero blocks cost MXU MACs (~2.7x the ideal packed
    FLOPs) but keep every concat piece 128-lane aligned, which is what
    Mosaic lowers without relayout.
    """
    W = jnp.zeros((12 * 128, 256), jnp.int8)
    for py in range(2):
        for px in range(2):
            ocol = (py * 2 + px) * 64
            for dy in range(3):
                for dx in range(3):
                    t_c, half = _E2TAP[px + dx]
                    s_r = py + dy
                    krow = (s_r * 3 + t_c) * 128 + half * 64
                    W = W.at[krow:krow + 64, ocol:ocol + 64].set(
                        w1_q[dy, dx]
                    )
    return W


def _kernel(im_ref, w0_ref, w1_ref, a0_ref, b0_ref, a1_ref, b1_ref,
            s1_ref, so_ref, out_ref, *, th, w2, h_img):
    i = pl.program_id(1)
    r_rows = 2 * th + 2
    w2p = w2 + 2
    m0 = r_rows * w2p

    # ---- conv0: one (m0, K) @ (K, 128) int8 matmul ----
    acc0 = jax.lax.dot_general(
        im_ref[0, 0], w0_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc0.astype(jnp.float32) * a0_ref[0] + b0_ref[0]
    y = jnp.maximum(y, 0.0)
    yq = jnp.clip(jnp.round(y / s1_ref[0, 0]), 0.0, 127.0)
    # conv1 must see ZERO at rows/cols outside conv0's real output range
    # (the prep zero-pads the input, but bias+relu make those rows
    # nonzero) — mask with the global row/col index.
    row_g = jax.lax.broadcasted_iota(jnp.int32, (m0, 128), 0)
    v = row_g // w2p + (i * 2 * th - 1)
    cs = row_g % w2p
    valid = (v >= 0) & (v < h_img) & (cs >= 1) & (cs <= w2)
    yq = jnp.where(valid, yq, 0.0).astype(jnp.int8)

    # ---- conv1 + 2x2 pool ----
    # row-parity split: free leading-dim reshape; piece (s_r, t_c) =
    # rows 2r+s_r, col pairs Cs-1+t_c (the +1 col pad is in w2p)
    y5 = yq.reshape(r_rows // 2, 2, w2p, 128)
    row_srcs = [
        jax.lax.slice(y5, (0, 0, 0, 0), (th, 1, w2p, 128)),
        jax.lax.slice(y5, (0, 1, 0, 0), (th, 2, w2p, 128)),
        jax.lax.slice(y5, (1, 0, 0, 0), (th + 1, 1, w2p, 128)),
        jax.lax.slice(y5, (1, 1, 0, 0), (th + 1, 2, w2p, 128)),
    ]
    taps = []
    for rs in row_srcs:
        for t_c in range(3):
            taps.append(
                jax.lax.slice(
                    rs, (0, 0, t_c, 0), (th, 1, t_c + w2, 128)
                ).reshape(th * w2, 128)
            )
    x12 = jnp.concatenate(taps, axis=-1)  # (th*w2, 1536) s8
    acc1 = jax.lax.dot_general(
        x12, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    z = acc1.astype(jnp.float32) * a1_ref[0] + b1_ref[0]
    zq = jnp.clip(jnp.round(z / so_ref[0, 0]), 0.0, 127.0)  # ReLU = 0 clip
    m = jnp.maximum(
        jnp.maximum(zq[:, :64], zq[:, 64:128]),
        jnp.maximum(zq[:, 128:192], zq[:, 192:]),
    )
    out_ref[0] = m.astype(jnp.int8).reshape(th, w2, 64)


@functools.partial(
    jax.jit, static_argnames=("th", "kpad", "interpret")
)
def fused_stem_int8(x_q, w0, b0, w1, b1, s0, s1, s_out, th: int = 2,
                    kpad: int = 64, interpret: bool = False):
    """x_q: (B, H, W, 3) int8 at scale s0 (symmetric, zero-point 0).
    w0: (3,3,3,64) fp conv1_1 kernel; w1: (3,3,64,64) fp conv1_2.
    Returns (B, H/2, W/2, 64) int8 at scale s_out.
    """
    b, h, w, _ = x_q.shape
    w2 = w // 2
    assert (h // 2) % th == 0 and h % 2 == 0 and w % 2 == 0, (h, w, th)
    nb = (h // 2) // th
    r_rows = 2 * th + 2
    w2p = w2 + 2

    # ---- XLA prep: pair-column im2col (strided slices, one fusion) ----
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 3), (0, 0)))
    pieces = [
        xp[:, dy:dy + h, e:e + 2 * w2:2, :]
        for dy in range(3) for e in range(4)
    ]
    im = jnp.concatenate(pieces, -1)  # (B, H, W2, 36)
    im = jnp.pad(im, ((0, 0), (1, 1), (1, 1), (0, kpad - 36)))
    # per-tile row bands (2-row overlap) -> contiguous blocks the Pallas
    # pipeline can fetch with plain BlockSpecs (no hand-rolled halo DMA)
    idx = (
        jnp.arange(nb)[:, None] * (2 * th) + jnp.arange(r_rows)[None, :]
    ).reshape(-1)
    bands = im[:, idx].reshape(b, nb, r_rows * w2p, kpad)

    # ---- weights / epilogue constants ----
    w0_q, w0_s = quantize_weight(w0)
    w1_q, w1_s = quantize_weight(w1)
    W0 = _conv0_pair_matrix(w0_q, kpad)
    W1 = _conv1_pair_matrix(w1_q)
    s0f = jnp.maximum(jnp.asarray(s0, jnp.float32), 1e-8)
    s1f = jnp.maximum(jnp.asarray(s1, jnp.float32), 1e-8)
    sof = jnp.maximum(jnp.asarray(s_out, jnp.float32), 1e-8)
    a0 = jnp.tile(s0f * w0_s, 2).reshape(1, 128)
    b0v = jnp.tile(b0.astype(jnp.float32), 2).reshape(1, 128)
    a1 = jnp.tile(s1f * w1_s, 4).reshape(1, 256)
    b1v = jnp.tile(b1.astype(jnp.float32), 4).reshape(1, 256)
    s1s = s1f.reshape(1, 1)
    sos = sof.reshape(1, 1)

    fixed = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bi, i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, th=th, w2=w2, h_img=h),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, r_rows * w2p, kpad),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            fixed(kpad, 128),
            fixed(12 * 128, 256),
            fixed(1, 128),
            fixed(1, 128),
            fixed(1, 256),
            fixed(1, 256),
            pl.BlockSpec(
                (1, 1), lambda bi, i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1), lambda bi, i: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w2, 64), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2, 64), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(bands, W0, W1, a0, b0v, a1, b1v, s1s, sos)
