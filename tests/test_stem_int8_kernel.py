"""Parity: the fused int8 stem kernel vs the int8_conv s8-epilogue chain.

Oracle = the STEM_S8_EPILOGUE XLA path (ops/quant.int8_conv with
out_quant_scale + fold_relu, packed stride-2 conv1_2, phase-max of s8) —
the chain the kernel claims bit-exactness with. Runs the kernel in
Pallas interpret mode on the CPU test mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scan_tpu.modeling.backbone.vgg import _phase_packed_weight
from scan_tpu.ops.quant import int8_conv, quantize_activation
from scan_tpu.ops.pallas.stem_int8_kernel import fused_stem_int8


def _oracle(x_q, w0, b0, w1, b1, s0, s1, s_out):
    ch = w0.shape[-1]
    y_q = int8_conv(
        x_q, w0, b0, stride=1, padding=((1, 1), (1, 1)),
        act_scale=s0, out_quant_scale=jnp.maximum(s1, 1e-8),
        fold_relu=True,
    )
    wp = _phase_packed_weight(w1)
    z_q = int8_conv(
        y_q, wp, jnp.tile(b1, 4), stride=2, padding=((1, 1), (1, 1)),
        act_scale=s1, out_quant_scale=jnp.maximum(s_out, 1e-8),
        fold_relu=True,
    )
    return jnp.maximum(
        jnp.maximum(z_q[..., :ch], z_q[..., ch:2 * ch]),
        jnp.maximum(z_q[..., 2 * ch:3 * ch], z_q[..., 3 * ch:]),
    )


@pytest.mark.parametrize("hw,th", [((16, 32), 2), ((24, 64), 3),
                                   ((16, 32), 4)])
def test_fused_stem_int8_matches_int8_conv_chain(hw, th):
    h, w = hw
    rng = np.random.RandomState(0)
    b = 2
    x = rng.randn(b, h, w, 3).astype(np.float32) * 40.0
    w0 = rng.randn(3, 3, 3, 64).astype(np.float32) * 0.2
    b0 = rng.randn(64).astype(np.float32) * 0.5
    w1 = rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05
    b1 = rng.randn(64).astype(np.float32) * 0.5

    s0 = jnp.float32(np.abs(x).max() / 127.0)
    x_q, _ = quantize_activation(jnp.asarray(x), s0)
    # plausible downstream scales (|y|max-ish)
    s1 = jnp.float32(0.9)
    s_out = jnp.float32(0.8)

    want = np.asarray(_oracle(x_q, jnp.asarray(w0), jnp.asarray(b0),
                              jnp.asarray(w1), jnp.asarray(b1),
                              s0, s1, s_out))
    got = np.asarray(fused_stem_int8(
        x_q, jnp.asarray(w0), jnp.asarray(b0), jnp.asarray(w1),
        jnp.asarray(b1), s0, s1, s_out, th=th, interpret=True,
    ))
    assert got.shape == want.shape == (b, h // 2, w // 2, 64)
    diff = np.abs(got.astype(int) - want.astype(int))
    # integer accumulation is exact; the f32 epilogue runs in the same
    # order — allow the odd 1-LSB round flip from fused-multiply ordering
    assert (diff > 1).sum() == 0, (diff.max(), (diff > 0).mean())
    assert (diff > 0).mean() < 1e-3, (diff > 0).mean()


def test_fused_stem_int8_zero_input_edge():
    """All-zero input: output must be the quantized relu(bias chain) with
    correct zero padding at the borders (masking bug detector)."""
    b, h, w = 1, 8, 16
    x_q = jnp.zeros((b, h, w, 3), jnp.int8)
    rng = np.random.RandomState(1)
    w0 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32))
    b0 = jnp.asarray(rng.randn(64).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(64).astype(np.float32))
    s0, s1, s_out = jnp.float32(1.0), jnp.float32(0.5), jnp.float32(0.5)
    want = np.asarray(_oracle(x_q, w0, b0, w1, b1, s0, s1, s_out))
    got = np.asarray(fused_stem_int8(x_q, w0, b0, w1, b1, s0, s1, s_out,
                                     th=2, interpret=True))
    np.testing.assert_array_equal(got, want)
