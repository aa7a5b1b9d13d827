"""Space-to-depth VGG stem: exact numeric parity with the naive stage 1."""

import numpy as np
import jax
import jax.numpy as jnp

from scan_tpu.modeling.backbone.vgg import (
    VGG16,
    _phase_packed_weight,
    _s2d,
)


def test_s2d_layout():
    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    s = _s2d(x)
    assert s.shape == (2, 2, 2, 12)
    # channel (py*2+px)*3+c
    np.testing.assert_allclose(s[0, 0, 0, 0:3], x[0, 0, 0])
    np.testing.assert_allclose(s[0, 0, 0, 3:6], x[0, 0, 1])
    np.testing.assert_allclose(s[0, 0, 0, 6:9], x[0, 1, 0])
    np.testing.assert_allclose(s[0, 0, 0, 9:12], x[0, 1, 1])


def test_phase_packed_conv_equivalence():
    """The stride-2 phase-packed conv reproduces the full-res 3x3 conv with
    the output arriving space-to-depth packed."""
    rng = np.random.RandomState(0)
    cout = 5
    x = jnp.asarray(rng.randn(1, 8, 12, 3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, cout), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    wp = _phase_packed_weight(w)
    assert wp.shape == (4, 4, 3, 4 * cout)
    got = np.asarray(jax.lax.conv_general_dilated(
        x, wp, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ))
    # channel block (qy*2+qx) at cell (i, j) is full-res pixel (2i+qy, 2j+qx)
    for qy in range(2):
        for qx in range(2):
            c0 = (qy * 2 + qx) * cout
            np.testing.assert_allclose(
                got[..., c0:c0 + cout],
                np.asarray(want)[:, qy::2, qx::2, :],
                atol=1e-4,
            )


def test_vgg_s2d_stem_matches_naive():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 48, 3), jnp.float32)
    naive = VGG16(s2d_stage1=False)
    fast = VGG16(s2d_stage1=True)
    params = naive.init(jax.random.PRNGKey(0), x)
    out_naive = naive.apply(params, x)
    out_fast = fast.apply(params, x)  # SAME params tree
    for a, b in zip(out_naive, out_fast):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
        )


def test_vgg_s2d_param_tree_identical():
    x = jnp.zeros((1, 32, 48, 3))
    p_naive = VGG16(s2d_stage1=False).init(jax.random.PRNGKey(0), x)
    p_fast = VGG16(s2d_stage1=True).init(jax.random.PRNGKey(0), x)
    t1 = jax.tree_util.tree_structure(p_naive)
    t2 = jax.tree_util.tree_structure(p_fast)
    assert t1 == t2
    for a, b in zip(
        jax.tree_util.tree_leaves(p_naive), jax.tree_util.tree_leaves(p_fast)
    ):
        assert a.shape == b.shape


def test_phase_max_forms_bit_exact():
    """TPU.PHASE_MAX_FORM variants ("slice"/"reshape"/"pair2") are the max
    over the same four phase values — outputs must be BIT-identical."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 32, 48, 3), jnp.float32)
    base = VGG16(s2d_stage1=True, phase_max_form="slice")
    params = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(params, x)
    for form in ("reshape", "pair2"):
        got = VGG16(s2d_stage1=True, phase_max_form=form).apply(params, x)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
