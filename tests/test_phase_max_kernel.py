"""Phase-max Pallas kernels vs their plain-XLA oracles.

Two kernels (scan_tpu/ops/pallas/phase_max_kernel.py). Neither is on
the round-4 shipping path (the measured default is the plain XLA
slice-max — PERF.md round-4 A/B); both are kept as off-by-default knobs:

* pair_phase_max_s8 — pair-conv stem tail (bench knobs: BENCH_STEM_S8=1
  BENCH_STEM_PAIR=1 BENCH_PALLAS_PHASEMAX=1): max over the four s8 phase
  slices of the two pair-conv outputs.
* phase_max_requant — packed-stem tail (BENCH_STEM_S8=0 BENCH_STEM_PAIR=0
  BENCH_PALLAS_PHASEMAX=1); fuses phase-max + ReLU + the successor
  requant.

These CI tests run the kernels in INTERPRET mode (CPU host); the
compiled Mosaic lowering is exercised only when the bench knobs above
are set on a real TPU (done for the PERF.md round-4 table). The contract
checked here is BIT-exact equality with the XLA slice-max formulation.

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


def _pair_oracle(z0, z1):
    c = z0.shape[-1] // 2
    return jnp.maximum(
        jnp.maximum(z0[..., :c], z0[..., c:]),
        jnp.maximum(z1[..., :c], z1[..., c:]),
    )


@pytest.mark.parametrize(
    "b,h,w,block_rows",
    [(1, 8, 16, 64), (2, 10, 12, 128), (1, 7, 9, 32)],
)
def test_pair_phase_max_s8_bit_exact(b, h, w, block_rows):
    # block_rows chosen to exercise both exact tiling and the clamped
    # boundary block (2*10*12=240 and 1*7*9=63 rows vs the block size).
    from scan_tpu.ops.pallas.phase_max_kernel import pair_phase_max_s8

    rng = np.random.RandomState(0)
    z0 = jnp.asarray(rng.randint(-127, 128, (b, h, w, 128), np.int8))
    z1 = jnp.asarray(rng.randint(-127, 128, (b, h, w, 128), np.int8))
    want = _pair_oracle(z0, z1)
    got = pair_phase_max_s8(z0, z1, block_rows=block_rows, interpret=True)
    assert got.shape == (b, h, w, 64) and got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pair_phase_max_s8_lane_guard():
    from scan_tpu.ops.pallas.phase_max_kernel import pair_phase_max_s8

    z = jnp.zeros((1, 4, 4, 32), jnp.int8)  # 2C=32 < 128 lanes
    with pytest.raises(AssertionError):
        pair_phase_max_s8(z, z, interpret=True)


@pytest.mark.parametrize(
    "b,h,w,c,block_h",
    [(1, 8, 16, 64, 4), (2, 10, 12, 64, 4), (1, 5, 5, 32, 2)],
)
def test_phase_max_requant_bit_exact(b, h, w, c, block_h):
    # block_h chosen to exercise both exact tiling and the clamped
    # boundary block (h=5 vs block_h=2).
    from scan_tpu.ops.pallas.phase_max_kernel import phase_max_requant

    rng = np.random.RandomState(0)
    z = jnp.asarray(
        (rng.randn(b, h, w, 4 * c) * 40).astype(np.float32)
    ).astype(jnp.bfloat16)
    scale = jnp.float32(0.37)
    want = _oracle(z, scale)
    got = phase_max_requant(z, scale, block_h=block_h, interpret=True)
    assert got.shape == (b, h, w, c) and got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_phase_max_requant_lane_guard():
    from scan_tpu.ops.pallas.phase_max_kernel import phase_max_requant

    z = jnp.zeros((1, 4, 4, 32), jnp.bfloat16)  # 4C=32 < 128 lanes
    with pytest.raises(AssertionError):
        phase_max_requant(z, jnp.float32(0.5), interpret=True)


def test_phase_max_requant_relu_floor():
    # All-negative input: ReLU floors every output at exactly 0.
    from scan_tpu.ops.pallas.phase_max_kernel import phase_max_requant

    z = -jnp.ones((1, 4, 8, 256), jnp.bfloat16)
    got = phase_max_requant(z, jnp.float32(0.5), block_h=2, interpret=True)
    assert int(np.abs(np.asarray(got)).max()) == 0
