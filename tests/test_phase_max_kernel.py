"""Fused phase-max+ReLU+requant Pallas kernel vs its plain-XLA oracle.

The kernel's contract is BIT-exact equality with the shipping int8-static
stem tail: relu(max over the 4 phase slices of the packed conv output in
bf16), then quantize_activation's round/clip chain in f32 (the successor
conv's quantize). On CPU the kernel runs in interpreter mode; the
driver's bench exercises the compiled TPU path via TPU.PALLAS_PHASE_MAX
(default on).

Parity target: reference fcos_core/modeling/backbone/mmdetection/vgg.py
stage-1 MaxPool2d(2,2) composed with the w8a8 protocol of ops/quant.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _oracle(z, scale):
    c = z.shape[-1] // 4
    m = jnp.maximum(
        jnp.maximum(z[..., :c], z[..., c:2 * c]),
        jnp.maximum(z[..., 2 * c:3 * c], z[..., 3 * c:]),
    )
    m = jnp.maximum(m, jnp.zeros((), m.dtype))
    return jnp.clip(
        jnp.round(m.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)


@pytest.mark.parametrize(
    "b,h,w,c,block_rows",
    [(1, 8, 16, 64, 64), (2, 10, 12, 64, 128), (1, 4, 4, 8, 32)],
)
def test_phase_max_requant_bit_exact(b, h, w, c, block_rows):
    # block_rows chosen to exercise both the exact-tiling and the padded
    # remainder path (2*10*12=240 rows vs 128-row blocks).
    from scan_tpu.ops.pallas.phase_max_kernel import phase_max_requant

    rng = np.random.RandomState(0)
    z = jnp.asarray(
        (rng.randn(b, h, w, 4 * c) * 40).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.float32(0.37)
    want = _oracle(z, scale)
    got = phase_max_requant(z, scale, block_rows=block_rows,
                            interpret=True)
    assert got.shape == (b, h, w, c) and got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_phase_max_requant_relu_floor():
    # All-negative input: ReLU floors every output at exactly 0.
    from scan_tpu.ops.pallas.phase_max_kernel import phase_max_requant

    z = -jnp.ones((1, 4, 8, 256), jnp.bfloat16)
    got = phase_max_requant(z, jnp.float32(0.5), block_rows=32,
                            interpret=True)
    assert int(np.abs(np.asarray(got)).max()) == 0
