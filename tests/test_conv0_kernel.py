"""Fused int8 conv0+quantize Pallas kernel vs its plain-XLA oracle.

On CPU the kernel runs in interpreter mode (bit-exact assertion — the
kernel's contract is exact equality with the static-int8 stem path, not
a tolerance); the driver's bench exercises the compiled TPU path via
TPU.PALLAS_CONV0. Also checks the col-split successor-weight lifting
(`vgg._phase_pair_weights_colsplit`) reproduces the plain full-res conv
from the kernel's column-deinterleaved planar output layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _data(b=1, h=16, w=32, seed=0):
    rng = np.random.RandomState(seed)
    x_q = rng.randint(-127, 128, size=(b, h, w, 3)).astype(np.int8)
    w0 = (rng.randn(3, 3, 3, 64) * 0.2).astype(np.float32)
    b0 = (rng.randn(64) * 0.5).astype(np.float32)
    s0 = np.float32(0.7)
    s1 = np.float32(0.11)
    return map(jnp.asarray, (x_q, w0, b0, s0, s1))


@pytest.mark.parametrize("b,h,w,tr", [(1, 16, 32, 2), (2, 24, 48, 4)])
def test_conv0_kernel_bit_exact_vs_oracle(b, h, w, tr):
    from jax.experimental.pallas import tpu as pltpu

    from scan_tpu.ops.pallas.conv0_kernel import (
        conv0_s8, reference_conv0_s8,
    )

    x_q, w0, b0, s0, s1 = _data(b=b, h=h, w=w)
    want = reference_conv0_s8(x_q, w0, b0, s0, s1)
    with pltpu.force_tpu_interpret_mode():
        got = conv0_s8(x_q, w0, b0, s0, s1, tr=tr)
    assert got.shape == want.shape and got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_colsplit_weights_reproduce_full_res_conv():
    """The lifted (3,3,2*Cin,2*Cout) kernel applied to the
    column-deinterleaved planar layout with the two row-parity paddings
    must equal the plain 3x3 stride-2x... full-res conv outputs."""
    rng = np.random.RandomState(1)
    cin, cout = 4, 6
    b, h, w = 2, 8, 12
    y = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32))

    from scan_tpu.modeling.backbone.vgg import _phase_pair_weights_colsplit

    # full-res stride-1 conv, SAME padding — the ground truth
    full = jax.lax.conv_general_dilated(
        y, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # column-deinterleave y into the kernel's output layout
    y_cd = y.reshape(b, h, w // 2, 2 * cin)
    kcs = _phase_pair_weights_colsplit(k)
    outs = []
    for qy in range(2):
        z = jax.lax.conv_general_dilated(
            y_cd, kcs, (2, 1), ((1 - qy, qy), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (b, h//2, w//2, 2*cout): [col-even out | col-odd out]
        outs.append(z)

    for qy in range(2):
        for qx in range(2):
            got = outs[qy][..., qx * cout:(qx + 1) * cout]
            want = full[:, qy::2, qx::2, :]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
                err_msg=f"qy={qy} qx={qx}",
            )
