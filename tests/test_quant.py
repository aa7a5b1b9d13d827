"""w8a8 int8 inference path (ops/quant.py + Conv(quant=True)).

Accuracy gates for TPU.INT8_INFERENCE: the int8 conv must track the f32
conv within quantization noise, and the full quantized backbone+head must
reproduce the fp head outputs to high fidelity over the same param tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scan_tpu.ops.quant import int8_conv, quantize_activation, quantize_weight


def test_quantize_roundtrip_scales():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.05)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and s.shape == (32,)
    deq = w_q.astype(jnp.float32) * s
    assert float(jnp.abs(deq - w).max()) <= float(s.max()) * 0.5 + 1e-7

    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32) * 3)
    x_q, sx = quantize_activation(x)
    deq = x_q.astype(jnp.float32) * sx
    assert float(jnp.abs(deq - x).max()) <= float(sx) * 0.5 + 1e-6


def test_int8_conv_close_to_f32():
    from jax import lax

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 64).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.01)

    ref = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=lax.conv_dimension_numbers(x.shape, w.shape,
                                                     ("NHWC", "HWIO", "NHWC")),
    ) + b
    got = int8_conv(x, w, b, padding=((1, 1), (1, 1)))
    scale = float(jnp.abs(ref).max())
    err = float(jnp.abs(got - ref).max()) / scale
    assert err < 0.02, f"int8 conv relative error {err:.4f}"


@pytest.mark.slow
def test_int8_head_outputs_track_fp():
    """Quantized backbone+head over the SAME params: logits/regression maps
    must correlate >0.99 with the fp path."""
    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.detector import build_detector

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "VGG-16-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.FCOS.NUM_CLASSES = 9
    cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON = False
    cfg.MODEL.DA_ON = False
    cfg.TPU.INT8_INFERENCE = True
    det = build_detector(cfg)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)
    params, proto = det.init_params(jax.random.PRNGKey(0), images)

    feats_fp = det.backbone.apply(params["backbone"], images)
    feats_q = det.backbone_inf.apply(params["backbone"], images)
    for f_fp, f_q in zip(feats_fp, feats_q):
        a = np.asarray(f_fp, np.float64).ravel()
        b = np.asarray(f_q, np.float64).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(a @ b / denom) if denom > 0 else 1.0
        assert cos > 0.99, f"backbone cosine {cos:.4f}"

    lg_fp, rg_fp, ct_fp = det.fcos_head.apply(params["fcos"], list(feats_fp))
    lg_q, rg_q, ct_q = det.head_inf.apply(params["fcos"], list(feats_q))
    for a, b in zip(lg_fp + rg_fp + ct_fp, lg_q + rg_q + ct_q):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(a @ b / denom) if denom > 0 else 1.0
        assert cos > 0.99, f"head cosine {cos:.4f}"


def test_static_scale_calibration_matches_dynamic():
    """Calibrating on a batch then running statically reproduces the
    dynamic-quantization output exactly for that batch (same scale), and
    the act_scales collection holds the running |x|max across batches."""
    from scan_tpu.modeling.layers import Conv

    rng = np.random.RandomState(2)
    conv = Conv(8, 3, quant=True)
    x1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32) * 2.0)
    variables = conv.init(jax.random.PRNGKey(0), x1)

    y_dyn = conv.apply(variables, x2)

    # calibration pass over both batches accumulates the running max
    _, up = conv.apply(variables, x1, mutable=["act_scales"])
    variables = {**variables, **up}
    _, up = conv.apply(variables, x2, mutable=["act_scales"])
    variables = {**variables, **up}
    amax = float(jax.tree_util.tree_leaves(up["act_scales"])[0])
    np.testing.assert_allclose(
        amax, float(jnp.abs(x2).max()), rtol=1e-6
    )

    y_static = conv.apply(variables, x2)
    np.testing.assert_allclose(
        np.asarray(y_static), np.asarray(y_dyn), atol=1e-6
    )


def test_int8_conv_im2col_bit_exact():
    """The im2col matmul formulation of the 3x3 stride-1 conv is
    BIT-exact vs lax.conv: identical s8 operands, s32 accumulation
    (integer addition reassociates exactly), identical epilogue."""
    from scan_tpu.ops.quant import int8_conv_im2col

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 14, 3).astype(np.float32) * 50)
    w = jnp.asarray(rng.randn(3, 3, 3, 16).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    scale = jnp.float32(0.41)

    for kwargs in (
        dict(out_quant_scale=jnp.float32(0.2), fold_relu=True),  # s8 out
        dict(out_dtype=jnp.float32),                             # fp out
    ):
        want = int8_conv(x, w, b, stride=1, padding=((1, 1), (1, 1)),
                         act_scale=scale, **kwargs)
        got = int8_conv_im2col(x, w, b, act_scale=scale, **kwargs)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_im2col_s8_input():
    from scan_tpu.ops.quant import int8_conv_im2col

    rng = np.random.RandomState(1)
    x_q = jnp.asarray(rng.randint(-127, 128, (1, 8, 8, 3), np.int8))
    w = jnp.asarray(rng.randn(3, 3, 3, 8).astype(np.float32) * 0.1)
    scale = jnp.float32(0.5)
    want = int8_conv(x_q, w, None, stride=1, padding=((1, 1), (1, 1)),
                     act_scale=scale, out_dtype=jnp.float32)
    got = int8_conv_im2col(x_q, w, None, act_scale=scale,
                           out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
