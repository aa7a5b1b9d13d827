"""Pallas phase-max kernels for the VGG s2d stem.

Two kernels for two stem configurations. NEITHER is on the shipping
path as of round 4: the measured default is the plain XLA slice-max
(STEM_S8_EPILOGUE=False, STEM_PAIR_CONV=False, PALLAS_PHASE_MAX=False,
202.2 img/s — docs/perf/PERF.md round 4 A/B table). Both kernels are
kept as measured, documented, off-by-default knobs.

1. ``pair_phase_max_s8`` — for the pair-conv stem (STEM_S8_EPILOGUE=True
   + STEM_PAIR_CONV=True + PALLAS_PHASE_MAX=True). The two row-phase pair
   convs each emit a (B, H/2, W/2, 2C) int8 tensor whose lane halves are
   the two column phases, already ReLU'd and requantized inside the conv
   epilogues; the 2x2 max-pool is then a max over those four s8 slices.
   XLA emits this max as a standalone loop fusion whose 64-lane-offset
   slices defeat the vectorizer — measured 13.5 ms/batch32 at ~45% of
   achievable HBM bandwidth (docs/perf/PERF.md round 3). The kernel does
   the two half-lane maxes in-register (one 64-lane rotate each) and
   streams at the HBM floor: read 2x(m,128) s8 + write (m,64) s8
   = 2.75 GB/batch32, floor ~6 ms. The pair-conv stem itself measures
   slower end-to-end than the packed conv (185.0 vs 202.2), which is why
   this path is off by default.

2. ``phase_max_requant`` — for the packed stem (STEM_S8_EPILOGUE=False
   and STEM_PAIR_CONV=False, PALLAS_PHASE_MAX=True). The packed stride-2
   conv emits bf16 (B, H/2, W/2, 4C) phase-major and the kernel fuses
   phase-max + ReLU + the successor's requant into one pass:
   q = clip(round(relu(max4(z)) / s_out)) -> int8. Bit-exact vs the XLA
   path: max/ReLU in bf16 exactly as vgg._phase_max, then the
   quantize_activation round/clip chain in f32 (ops/quant.py:57-73).
   Measured round 4: the kernel itself runs at the HBM floor (7.9 ms) but
   its layout demands cost more elsewhere (2D form: +13 ms relayout copy;
   4D form: slower conv epilogue) — net slower than XLA's slice-max.

Both kernels handle row counts that are not a multiple of the block size
via Pallas' boundary-block clamping (reads of the padded tail are
unobserved garbage, writes outside the array are masked) — elementwise
ops need no explicit masking and no jnp.pad copy of the input.

Parity target: reference fcos_core/modeling/backbone/mmdetection/vgg.py
stage-1 pool (features.4, MaxPool2d(2,2)) composed with the w8a8
quantization protocol of ops/quant.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_kernel(z0_ref, z1_ref, o_ref, *, c):
    z0 = z0_ref[...]                                 # (BR, 2c) s8
    z1 = z1_ref[...]
    m0 = jnp.maximum(z0[:, :c], z0[:, c:])           # one 64-lane rotate
    m1 = jnp.maximum(z1[:, :c], z1[:, c:])
    o_ref[...] = jnp.maximum(m0, m1)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def pair_phase_max_s8(z0: jnp.ndarray, z1: jnp.ndarray,
                      block_rows: int = 8192,
                      interpret: bool = False) -> jnp.ndarray:
    """max over the four phase slices of the two pair-conv outputs.

    z0, z1: (B, H, W, 2C) int8 (each lane half = one column phase, values
    already ReLU'd + requantized to a shared scale inside the pair convs'
    epilogues — max commutes with both). Returns (B, H, W, C) int8.
    """
    assert z0.shape == z1.shape and z0.dtype == z1.dtype == jnp.int8
    b, h, w, c2 = z0.shape
    assert c2 % 2 == 0
    c = c2 // 2
    # Lane-width guard (mirrors use_pallas_conv0's spatial guards): the
    # in-register half-lane rotate assumes the slice point is the 64-lane
    # boundary of a 128-lane vreg; shrunken dryrun widths fall back.
    assert c2 == 128, f"pair_phase_max_s8 requires 2C=128 lanes, got {c2}"
    m = b * h * w
    z0 = z0.reshape(m, c2)
    z1 = z1.reshape(m, c2)
    grid = (m + block_rows - 1) // block_rows
    out = pl.pallas_call(
        functools.partial(_pair_kernel, c=c),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, c2), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, c2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), jnp.int8),
        interpret=interpret,
    )(z0, z1)
    return out.reshape(b, h, w, c)


def _kernel(s_ref, z_ref, o_ref, *, c):
    z = z_ref[0]                                     # (bh, W, 4c) bf16
    m2 = jnp.maximum(z[..., : 2 * c], z[..., 2 * c:])  # vreg-aligned
    m = jnp.maximum(m2[..., :c], m2[..., c:])        # one lane rotate
    m = jnp.maximum(m, jnp.zeros((), m.dtype))       # ReLU
    scale = s_ref[0]
    q = jnp.clip(jnp.round(m.astype(jnp.float32) / scale), -127.0, 127.0)
    o_ref[0] = q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def phase_max_requant(z: jnp.ndarray, scale: jnp.ndarray,
                      block_h: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, 4C) phase-major bf16/f32 -> (B, H, W, C) int8.

    Computes clip(round(relu(max over the 4 phase slices) / scale)) in
    one HBM pass. ``scale`` is the f32 scalar requant scale (already
    /127, >= 1e-8 — the caller clamps, matching quantize_activation).

    The kernel consumes the 4D conv output DIRECTLY (no reshape): a
    (m, 4C) reshape forces row-major {3,2,1,0} while XLA's conv prefers
    a batch-minor {3,0,2,1} output layout, so the reshape materialised a
    full 13 ms/batch32 relayout copy of the 5.5 GB bf16 tensor — more
    than the kernel saved (measured round 4; that copy is why round 3's
    kernel-on default REGRESSED the bench 202->192). Feeding the 4D
    array lets layout assignment propagate the custom call's default
    layout into the conv epilogue instead.
    """
    b, h, w, c4 = z.shape
    assert c4 % 4 == 0
    c = c4 // 4
    # Lane-width guard: with shrunken widths (TPU.VGG_WIDTH_DIV) 4C drops
    # below the 128-lane tile and Mosaic lowering degrades or fails;
    # callers must fall back to the XLA path (vgg.py gates on this too).
    assert c4 % 128 == 0, f"phase_max_requant requires 4C%128==0, got {c4}"
    grid = (b, (h + block_h - 1) // block_h)
    scale = jnp.reshape(scale.astype(jnp.float32), (1,))
    return pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_h, w, c4), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_h, w, c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        interpret=interpret,
    )(scale, z)
