"""Fused phase-max + ReLU + requantize Pallas kernel for the VGG stem.

The s2d stem's packed stride-2 conv emits z = (B, H/2, W/2, 4*C) in
bf16 with phase-major channels (phase p = qy*2+qx occupies lanes
p*C..(p+1)*C); the 2x2 max-pool is a max over the four phase slices.
XLA will not fuse round/clip-to-int8 into a convolution fusion, so the
shipping int8-static path pays TWO loop passes after the conv:

  1. phase-max + ReLU (reads bf16 z, writes bf16 out) — measured
     13.5 ms/batch32 at ~45% of HBM bandwidth (the 64-lane-offset
     slices defeat XLA's vectorizer), and
  2. the successor conv's quantize (reads bf16 out, writes s8) —
     ~2 ms more.

This kernel does both in ONE pass at the HBM floor:

    q = clip(round(relu(max4(z)) / s_out), -127, 127) -> int8

reading bf16 z once and writing only the s8 result (~5 GB of traffic
instead of ~7.7 GB, and at full bandwidth). The max tree is laid out
for the (8,128)-lane vregs: max(z[:, :2C], z[:, 2C:]) first (vreg-
aligned, no lane shuffle), then one 64-lane-offset max. Bit-exact vs
the XLA path: max/ReLU in bf16 exactly as vgg._phase_max, then the
quantize_activation round/clip chain in f32 (ops/quant.py:57-73); the
output QuantizedActivation carries the same calibrated scale the
successor Conv would have derived from its own |x|max variable (both
are calibrated on the identical stem-output tensor).

Parity target: reference fcos_core/modeling/backbone/mmdetection/vgg.py
stage-1 pool (features.4, MaxPool2d(2,2)) composed with the w8a8
quantization protocol of ops/quant.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(s_ref, z_ref, o_ref, *, c):
    z = z_ref[...]                                   # (BR, 4c) bf16
    m2 = jnp.maximum(z[:, : 2 * c], z[:, 2 * c:])    # vreg-aligned
    m = jnp.maximum(m2[:, :c], m2[:, c:])            # one lane rotate
    m = jnp.maximum(m, jnp.zeros((), m.dtype))       # ReLU
    scale = s_ref[0]
    q = jnp.clip(jnp.round(m.astype(jnp.float32) / scale), -127.0, 127.0)
    o_ref[...] = q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def phase_max_requant(z: jnp.ndarray, scale: jnp.ndarray,
                      block_rows: int = 2048,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, 4C) phase-major bf16/f32 -> (B, H, W, C) int8.

    Computes clip(round(relu(max over the 4 phase slices) / scale)) in
    one HBM pass. ``scale`` is the f32 scalar requant scale (already
    /127, >= 1e-8 — the caller clamps, matching quantize_activation).
    """
    b, h, w, c4 = z.shape
    assert c4 % 4 == 0
    c = c4 // 4
    m = b * h * w
    z2 = z.reshape(m, c4)
    pad = (-m) % block_rows
    if pad:
        z2 = jnp.pad(z2, ((0, pad), (0, 0)))
    rows = z2.shape[0]
    scale = jnp.reshape(scale.astype(jnp.float32), (1,))
    out = pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, c4), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.int8),
        interpret=interpret,
    )(scale, z2)
    if pad:
        out = out[:m]
    return out.reshape(b, h, w, c)
