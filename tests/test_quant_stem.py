"""Int8-static s2d stem: requant-before-phase-max commutation.

The static int8 stem (modeling/backbone/vgg.py::_stage1_s2d) folds ReLU +
the successor conv's requant into each conv epilogue BEFORE the phase max
(requant and ReLU are monotonic, and all four phase slices share the same
per-channel scale, so max commutes). These tests pin:
  * the folded s8 output equals quantize(relu(max(dequant))) bit-exactly,
  * the full backbone stays close to the fallback (fp-intermediate) path,
  * STEM_CHUNK sub-batching does not change the s8 numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scan_tpu.modeling.backbone.vgg import VGG16
from scan_tpu.ops.quant import QuantizedActivation


def _x(b=2, h=32, w=64, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 40 + 20)


def _calibrated(m, x):
    v0 = m.init(jax.random.PRNGKey(0), x)
    _, ups = m.apply(v0, x, mutable=["act_scales"])
    return {**v0, "act_scales": ups["act_scales"]}


def test_stem_scales_created_by_calibration():
    m = VGG16(s2d_stage1=True, quant=True, width_div=8)
    v = _calibrated(m, _x())
    acts = v["act_scales"]
    for name in ("conv0_act", "conv1_act", "stem_out_act"):
        assert name in acts, sorted(acts)
        assert float(acts[name]) > 0


def test_s8_stem_exact_vs_fallback_quantization():
    """outs[0] (C1) of the s8 path must equal the fallback fp C1 pushed
    through quantize-at-stem_out_act — the bit-exactness claim of the
    requant/max commutation."""
    m = VGG16(s2d_stage1=True, quant=True, width_div=8)
    x = _x()
    v = _calibrated(m, x)
    outs_s8 = m.apply(v, x)

    acts_fb = dict(v["act_scales"])
    s_out = float(acts_fb.pop("stem_out_act")) / 127.0
    v_fb = {**v, "act_scales": acts_fb}
    outs_fb = m.apply(v_fb, x)

    c1_fb_q = np.clip(
        np.round(np.asarray(outs_fb[0], np.float64) / s_out), 0, 127
    ) * s_out
    np.testing.assert_allclose(
        np.asarray(outs_s8[0], np.float64), c1_fb_q, atol=1e-5, rtol=0
    )
    # downstream stages see inputs differing by <= 1 LSB of s_out; outputs
    # must stay close
    for lvl in range(1, 5):
        a, b = np.asarray(outs_s8[lvl]), np.asarray(outs_fb[lvl])
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.1, lvl


@pytest.mark.parametrize("chunk", [1, 2])
def test_s8_stem_chunking_invariant(chunk):
    x = _x(b=4)
    m0 = VGG16(s2d_stage1=True, quant=True, width_div=8, stem_chunk=0)
    v = _calibrated(m0, x)
    mc = VGG16(s2d_stage1=True, quant=True, width_div=8, stem_chunk=chunk)
    outs0 = m0.apply(v, x)
    outsc = mc.apply(v, x)
    for lvl in range(5):
        np.testing.assert_array_equal(
            np.asarray(outs0[lvl]), np.asarray(outsc[lvl])
        )


def test_pair_conv_exact_vs_packed():
    """The two row-phase-pair stride-2 convs (25% fewer MACs) must be
    bit-exact vs the single packed conv in the static int8 path — the
    dropped taps are structural zeros in s32 accumulation."""
    x = _x()
    m_pair = VGG16(s2d_stage1=True, quant=True, width_div=8,
                   stem_pair_conv=True)
    m_pack = VGG16(s2d_stage1=True, quant=True, width_div=8,
                   stem_pair_conv=False)
    v = _calibrated(m_pack, x)
    outs_pair = m_pair.apply(v, x)
    outs_pack = m_pack.apply(v, x)
    for lvl in range(5):
        np.testing.assert_array_equal(
            np.asarray(outs_pair[lvl]), np.asarray(outs_pack[lvl]), err_msg=str(lvl)
        )


def test_pair_conv_exact_vs_packed_s8_epilogue():
    x = _x()
    m_pair = VGG16(s2d_stage1=True, quant=True, width_div=8,
                   stem_pair_conv=True, stem_s8_epilogue=True)
    m_pack = VGG16(s2d_stage1=True, quant=True, width_div=8,
                   stem_pair_conv=False, stem_s8_epilogue=True)
    v = _calibrated(m_pack, x)
    np.testing.assert_array_equal(
        np.asarray(m_pair.apply(v, x)[0]), np.asarray(m_pack.apply(v, x)[0])
    )


def test_quantized_activation_pytree():
    qa = QuantizedActivation(
        jnp.ones((2, 4, 4, 8), jnp.int8), jnp.float32(0.5)
    )
    leaves = jax.tree_util.tree_leaves(qa)
    assert len(leaves) == 2
    out = jax.lax.stop_gradient(qa)
    assert isinstance(out, QuantizedActivation)
    np.testing.assert_allclose(
        np.asarray(qa.dequantize(jnp.float32)), 0.5
    )
