"""Fused Pallas stem vs the plain-XLA conv-relu-conv-relu-maxpool oracle.

On CPU the kernel runs in interpreter mode; the driver's bench exercises
the compiled TPU path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _data(h=32, w=64, b=2, ch=16, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, h, w, 3).astype(dtype) * 2
    w0 = (rng.randn(3, 3, 3, ch) * 0.1).astype(dtype)
    b0 = (rng.randn(ch) * 0.1).astype(dtype)
    w1 = (rng.randn(3, 3, ch, ch) * 0.05).astype(dtype)
    b1 = (rng.randn(ch) * 0.1).astype(dtype)
    return map(jnp.asarray, (x, w0, b0, w1, b1))


@pytest.mark.parametrize("th", [4, 8])
def test_fused_stem_matches_oracle(monkeypatch, th):
    from jax.experimental.pallas import tpu as pltpu

    from scan_tpu.ops.pallas.stem_kernel import (
        fused_s2d_stem, reference_stem,
    )

    x, w0, b0, w1, b1 = _data()
    want = reference_stem(x, w0, b0, w1, b1, dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_s2d_stem(x, w0, b0, w1, b1, th=th,
                             out_dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_fused_stem_nondivisible_height_guard():
    from scan_tpu.ops.pallas.stem_kernel import fused_s2d_stem

    x, w0, b0, w1, b1 = _data(h=30)
    with pytest.raises(AssertionError):
        fused_s2d_stem(x, w0, b0, w1, b1, th=4)
