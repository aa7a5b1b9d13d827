"""Int8 quantized convolution for the inference path.

TPU v5e executes int8 x int8 -> int32 on the MXU at 2x the bf16 FLOP rate
(394 TOPs vs 197 TFLOPs), making w8a8 quantization the main arithmetic
lever for inference throughput (the reference ships no quantized path; its
CUDA kernels are fp32 — reference ``fcos_core/csrc``).

Scheme: symmetric per-output-channel weight scales, symmetric per-tensor
dynamic activation scales (one |x|max reduce per layer, fused by XLA into
the producer). Weights quantize on the fly inside jit from the SAME fp32
param tree the training path uses — no separate quantized checkpoint; the
per-channel max over a (3,3,Cin) kernel is noise next to the conv itself.
Accuracy is gated by tests/test_quant.py (bf16-vs-int8 box parity) and the
torch-reference harness.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


class QuantizedActivation(NamedTuple):
    """An int8 activation plus the f32 scalar scale that dequantizes it
    (``fp ~= q * scale``). Produced by layers that fold their successor's
    static requant into their own epilogue (e.g. the VGG s2d stem) so the
    fp intermediate is never materialised in HBM; consumed by ``Conv``
    (quant=True), which skips its own quantize_activation."""

    q: jnp.ndarray      # int8
    scale: jnp.ndarray  # f32 scalar

    @property
    def shape(self):
        return self.q.shape

    def dequantize(self, dtype):
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)


def quantize_weight(w: jnp.ndarray):
    """(kh, kw, cin, cout) fp -> (int8 kernel, (cout,) f32 scale)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation(x: jnp.ndarray, act_scale=None):
    """Per-tensor symmetric quantization -> (int8, f32 scale).

    With ``act_scale`` (a calibrated static scalar, see
    ``modeling/layers.Conv`` calibration) the |x|max reduce — a full extra
    HBM pass over the activation, ~7% of e2e inference time measured — is
    skipped, and the round/clip/cast chain becomes a pure elementwise op
    XLA fuses into the producer's epilogue (the activation then lives in
    HBM as int8: half the bf16 read+write traffic).
    """
    if act_scale is None:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(amax, 1e-8) / 127.0
    else:
        scale = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return x_q, scale


def int8_conv(x, kernel, bias=None, stride: int = 1, padding="SAME",
              out_dtype: Optional[object] = None, act_scale=None,
              out_quant_scale=None, fold_relu: bool = False):
    """w8a8 conv: int32 MXU accumulation, f32 dequant epilogue (+bias).

    x: (B, H, W, Cin) float — or int8 already quantized, in which case
    ``act_scale`` is REQUIRED and taken as its scale (no re-quantization).
    kernel: (kh, kw, Cin, Cout) float (quantized here, inside jit).
    ``act_scale``: optional calibrated static activation scale (see
    quantize_activation). Returns float (out_dtype or x.dtype) — unless
    ``out_quant_scale`` is given: then the epilogue folds
    round/clip-to-int8 at that scale (and ReLU when ``fold_relu``, which
    is just a 0 lower clip bound) and returns int8. The whole epilogue is
    then elementwise, so XLA fuses it into the conv and only the int8
    tensor ever reaches HBM — 4x less write traffic than the f32 dequant.
    ``fold_relu`` with a float return applies ReLU before the cast.
    """
    w_q, w_scale = quantize_weight(kernel)
    if x.dtype == jnp.int8:
        assert act_scale is not None, "int8 input requires its scale"
        x_q = x
        x_scale = jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    else:
        x_q, x_scale = quantize_activation(x, act_scale)
    strides = (stride, stride) if isinstance(stride, int) else stride
    acc = lax.conv_general_dilated(
        x_q, w_q, strides, padding,
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, kernel.shape, _DN
        ),
        preferred_element_type=jnp.int32,
    )
    return _dequant_epilogue(
        acc, x_scale * w_scale, bias, out_quant_scale, fold_relu,
        out_dtype or x.dtype,
    )


def _dequant_epilogue(acc, scale, bias, out_quant_scale, fold_relu,
                      out_dtype):
    """Shared int32->output epilogue: dequant scale, +bias, then either
    requant to int8 (with optional folded ReLU via the 0 lower clip) or
    fp cast."""
    y = acc.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if out_quant_scale is not None:
        lo = 0.0 if fold_relu else -127.0
        q = jnp.clip(jnp.round(y / out_quant_scale), lo, 127.0)
        return q.astype(jnp.int8)
    if fold_relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype)


def int8_conv_im2col(x, kernel, bias=None, out_dtype: Optional[object] = None,
                     act_scale=None, out_quant_scale=None,
                     fold_relu: bool = False):
    """w8a8 3x3 stride-1 SAME conv as an explicit im2col matmul.

    Bit-exact with ``int8_conv`` (same s8 operands, same s32 accumulation
    — addition reassociation is exact in integers — same epilogue), but a
    different XLA execution strategy: for tiny input channel counts XLA's
    conv pads the contraction dim to the full 128-lane tile, so the VGG
    stem's Cin=3 first conv runs at ~2.8% MXU utilisation (12.5
    ms/batch32 measured, 11 TF/s). Materialising the 9-tap patches as an
    (B, H, W, 9*Cin) int8 tensor and contracting with a (9*Cin, Cout)
    matmul trades one extra ~1 GB HBM pass for a 9*Cin-deep contraction.

    Only correct for kh=kw=3, stride 1, SAME padding (asserted).
    """
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), "im2col path is for the 3x3 stem conv"
    w_q, w_scale = quantize_weight(kernel)
    if x.dtype == jnp.int8:
        assert act_scale is not None, "int8 input requires its scale"
        x_q, x_scale = x, jnp.maximum(act_scale.astype(jnp.float32), 1e-8)
    else:
        x_q, x_scale = quantize_activation(x, act_scale)
    b, h, w, _ = x_q.shape
    # SAME padding with zeros: identical to what lax.conv pads (the s8
    # zero-point is 0 under symmetric quantization)
    xp = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        xp[:, dy:dy + h, dx:dx + w, :]
        for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(taps, axis=-1)            # (B,H,W,9*Cin) s8
    acc = lax.dot_general(
        patches, w_q.reshape(9 * cin, cout),
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _dequant_epilogue(
        acc, x_scale * w_scale, bias, out_quant_scale, fold_relu,
        out_dtype or x.dtype,
    )
