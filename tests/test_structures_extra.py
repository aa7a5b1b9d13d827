"""Masks/keypoints structures + layers compatibility surface."""

import numpy as np

from scan_tpu.structures.masks import (
    PersonKeypoints,
    PolygonInstance,
    SegmentationMask,
)


def test_polygon_rasterize_square():
    inst = PolygonInstance(
        [np.asarray([2.0, 2, 8, 2, 8, 8, 2, 8])], (12, 12)
    )
    m = inst.rasterize()
    assert m[5, 5]
    assert not m[0, 0]
    # area within a pixel of the polygon area
    assert 25 <= m.sum() <= 49


def test_segmentation_mask_resize_flip():
    sm = SegmentationMask([[[2.0, 2, 8, 2, 8, 8, 2, 8]]], (12, 12))
    sm2 = sm.resize((24, 24))
    assert sm2.instances[0].polygons[0][0] == 4.0
    sm3 = sm.transpose()
    # x -> 12 - x - 1
    assert sm3.instances[0].polygons[0][0] == 9.0
    arr = sm.to_bitmask_array()
    assert arr.shape == (1, 12, 12)


def test_keypoints_flip_swaps_left_right():
    kp = np.zeros((1, 17, 3))
    li = PersonKeypoints.NAMES.index("left_eye")
    ri = PersonKeypoints.NAMES.index("right_eye")
    kp[0, li] = [2, 5, 2]
    kp[0, ri] = [8, 5, 2]
    k = PersonKeypoints(kp, (10, 10))
    f = k.transpose()
    # after flip: left_eye slot holds the flipped right_eye x
    np.testing.assert_allclose(f.keypoints[0, li, 0], 10 - 8 - 1)
    np.testing.assert_allclose(f.keypoints[0, ri, 0], 10 - 2 - 1)


def test_layers_surface_imports():
    import jax.numpy as jnp

    from scan_tpu import layers as L

    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    assert float(L.smooth_l1_loss(x, x)) == 0.0
    assert np.isfinite(float(L.kl_loss(x, x)))
    sim, kl = L.cosine_loss(x, x, jnp.asarray([1, 1]))
    assert float(sim) < 1e-5
    f = jnp.asarray([[1.0, 0], [0, 1.0]])
    loss = L.supcon_loss_with_prototype(
        f, jnp.asarray([1, 2]), f, jnp.asarray([1, 2])
    )
    assert np.isfinite(float(loss))


def test_keypoints_vertical_flip():
    from scan_tpu.structures.masks import FLIP_TOP_BOTTOM

    kp = np.zeros((1, 17, 3), np.float32)
    ni = PersonKeypoints.NAMES.index("nose")
    kp[0, ni] = [4, 3, 2]
    k = PersonKeypoints(kp, (10, 8))  # (w, h)
    f = k.transpose(FLIP_TOP_BOTTOM)
    # y mirrored (h - y - 1), x unchanged, no left/right name swap
    assert f.keypoints[0, ni].tolist() == [4, 8 - 3 - 1, 2]
    # invisible keypoints zero entirely (COCO convention)
    assert np.all(f.keypoints[0, PersonKeypoints.NAMES.index("left_eye")] == 0)


def test_collect_env_info():
    from scan_tpu.utils.collect_env import collect_env_info

    s = collect_env_info()
    assert "JAX:" in s and "flax:" in s and "devices:" in s
