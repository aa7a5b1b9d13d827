"""RetinaNet / RPN / RoI-heads / GeneralizedRCNN smoke + semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.anchors import grid_anchors
from scan_tpu.modeling.retinanet import (
    RetinaNetConfig,
    RetinaNetHead,
    matcher_assign,
    retinanet_losses,
    smooth_l1,
)
from scan_tpu.ops.roi_align import roi_align


def test_matcher_semantics():
    ious = jnp.asarray(
        [
            [0.8, 0.1],   # clear fg for gt0
            [0.45, 0.2],  # between thresholds -> ignored
            [0.1, 0.05],  # background
            [0.2, 0.39],  # best anchor for gt1 -> low-quality forced
        ]
    )
    m = np.asarray(matcher_assign(ious, 0.5, 0.4))
    assert m[0] == 0
    assert m[1] == -2
    assert m[2] == -1
    assert m[3] == 1  # forced low-quality match
    m2 = np.asarray(matcher_assign(ious, 0.5, 0.4, allow_low_quality=False))
    assert m2[3] == -1


def test_smooth_l1():
    x = jnp.asarray([-2.0, -0.05, 0.0, 0.05, 2.0])
    out = np.asarray(smooth_l1(x, 0.11))
    np.testing.assert_allclose(out[2], 0.0)
    np.testing.assert_allclose(out[0], 2 - 0.055, rtol=1e-5)
    np.testing.assert_allclose(out[1], 0.5 * 0.0025 / 0.11, rtol=1e-5)


def test_retinanet_head_and_loss():
    cfg = RetinaNetConfig(num_classes=3)
    head = RetinaNetHead(cfg)
    feats = [jnp.zeros((1, 8 // 2**l + 1, 12 // 2**l + 1, 256)) for l in range(5)]
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, reg = head.apply(params, feats)
    a = cfg.num_anchors
    assert logits[0].shape[-1] == a * 2
    assert reg[0].shape[-1] == a * 4

    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    from scan_tpu.modeling.anchors import atss_level_sizes

    anchors = grid_anchors(
        shapes, cfg.strides,
        atss_level_sizes(cfg.anchor_sizes, cfg.octave, cfg.scales_per_octave),
        cfg.aspect_ratios,
    )
    g = 5
    boxes = jnp.zeros((1, g, 4)).at[0, 0].set(jnp.asarray([4.0, 4, 60, 60]))
    labels = jnp.zeros((1, g), jnp.int32).at[0, 0].set(2)
    mask = jnp.zeros((1, g), bool).at[0, 0].set(True)
    losses = retinanet_losses(cfg, anchors, logits, reg, boxes, labels, mask)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_generalized_rcnn_end_to_end():
    from scan_tpu.modeling.generalized_rcnn import FasterRCNN

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.RPN.USE_FPN = True
    cfg.MODEL.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 32
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 64

    model = FasterRCNN(cfg)
    images = jnp.zeros((1, 64, 96, 3))
    params = model.init_params(jax.random.PRNGKey(0), images)

    g = 4
    targets = dict(
        boxes=jnp.zeros((1, g, 4)).at[0, 0].set(jnp.asarray([8.0, 8, 56, 56])),
        labels=jnp.zeros((1, g), jnp.int32).at[0, 0].set(3),
        mask=jnp.zeros((1, g), bool).at[0, 0].set(True),
    )
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    losses = jax.jit(model.forward_train)(params, images, targets, sizes)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert set(losses) == {
        "loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"
    }

    out = jax.jit(model.forward_inference)(params, images, sizes)
    assert out["boxes"].shape == (1, 100, 4)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_keypoints_to_heatmap_semantics():
    """Floor discretisation, boundary-to-last-cell, valid = in-grid & vis
    (reference structures/keypoint.py:154-184)."""
    from scan_tpu.modeling.roi_heads import keypoints_to_heatmap

    rois = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    kp = jnp.asarray([[
        [2.5, 5.0, 2],    # interior, visible
        [10.0, 10.0, 1],  # exactly on max boundary -> last cell
        [3.0, 3.0, 0],    # not visible
        [12.0, 3.0, 1],   # outside roi -> invalid
    ]])
    t, v = keypoints_to_heatmap(kp, rois, 4)
    t, v = np.asarray(t), np.asarray(v)
    # scale = 4/10 = 0.4: (2.5, 5.0) -> (1, 2) -> 2*4+1 = 9
    assert t[0, 0] == 9
    assert t[0, 1] == 4 * 4 - 1  # last cell
    np.testing.assert_array_equal(v[0], [1, 1, 0, 0])


def test_roi_keypoint_decode_recovers_peak():
    """A synthetic heatmap peak decodes to the cell's image-space center."""
    from scan_tpu.modeling.roi_heads import roi_keypoint_decode

    h = w = 8
    rois = jnp.asarray([[10.0, 20.0, 42.0, 52.0]])  # 32x32 roi
    hm = np.full((1, h, w, 2), -5.0, np.float32)
    hm[0, 2, 5, 0] = 3.0   # kp0 peak at (y=2, x=5)
    hm[0, 6, 1, 1] = 4.0   # kp1 peak at (y=6, x=1)
    xy, scores = roi_keypoint_decode(jnp.asarray(hm), rois)
    xy = np.asarray(xy)
    # cell size = 32/8 = 4; center of (x=5) = (5+0.5)*4 + 10 = 32
    np.testing.assert_allclose(xy[0, 0, 0], 32.0, atol=2.0)
    np.testing.assert_allclose(xy[0, 0, 1], 20 + 2.5 * 4, atol=2.0)
    np.testing.assert_allclose(xy[0, 1, 0], 10 + 1.5 * 4, atol=2.0)
    np.testing.assert_allclose(xy[0, 1, 1], 20 + 6.5 * 4, atol=2.0)
    assert np.asarray(scores)[0, 0] == pytest.approx(3.0)
    assert np.asarray(scores)[0, 1] == pytest.approx(4.0)


@pytest.mark.slow
def test_mask_keypoint_rcnn_end_to_end():
    """MASK_ON + KEYPOINT_ON branches train and decode (reference
    roi_heads/roi_heads.py:14-49 three-branch combination)."""
    from scan_tpu.modeling.generalized_rcnn import FasterRCNN

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.RPN.USE_FPN = True
    cfg.MODEL.RPN.ANCHOR_STRIDE = (4, 8, 16, 32, 64)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 5
    cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM = 64
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_MASK_HEAD.CONV_LAYERS = (32, 32)
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_LAYERS = (32, 32)
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_CLASSES = 17

    model = FasterRCNN(cfg)
    images = jnp.zeros((1, 64, 96, 3))
    params = model.init_params(jax.random.PRNGKey(0), images)
    assert "roi_mask" in params and "roi_keypoint" in params

    g = 4
    gt_masks = np.zeros((1, g, 64, 96), np.float32)
    gt_masks[0, 0, 16:48, 16:48] = 1.0
    gt_kp = np.zeros((1, g, 17, 3), np.float32)
    gt_kp[0, 0, :, 0] = 30.0
    gt_kp[0, 0, :, 1] = 30.0
    gt_kp[0, 0, :, 2] = 2.0
    targets = dict(
        boxes=jnp.zeros((1, g, 4)).at[0, 0].set(jnp.asarray([8.0, 8, 56, 56])),
        labels=jnp.zeros((1, g), jnp.int32).at[0, 0].set(3),
        mask=jnp.zeros((1, g), bool).at[0, 0].set(True),
        gt_masks=jnp.asarray(gt_masks),
        gt_keypoints=jnp.asarray(gt_kp),
    )
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    losses = jax.jit(model.forward_train)(params, images, targets, sizes)
    assert "loss_mask" in losses and "loss_kp" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    out = jax.jit(model.forward_inference)(params, images, sizes)
    assert out["masks"].shape[0] == 1 and out["masks"].shape[2:] == (28, 28)
    assert out["keypoints"].shape[-2:] == (17, 3)
    assert out["keypoint_scores"].shape[-1] == 17
    assert np.all(np.isfinite(np.asarray(out["keypoints"])))


def test_roi_mask_head():
    from scan_tpu.modeling.roi_heads import RoIMaskConfig, RoIMaskHead, roi_mask_loss

    cfg = RoIMaskConfig(num_classes=4, pooler_resolution=6, conv_layers=(32, 32))
    head = RoIMaskHead(cfg)
    pooled = jnp.zeros((3, 6, 6, 16))
    params = head.init(jax.random.PRNGKey(0), pooled)
    logits = head.apply(params, pooled)
    assert logits.shape == (3, 12, 12, 4)
    targets = jnp.zeros((3, 12, 12))
    loss = roi_mask_loss(
        logits, jnp.asarray([1, 2, 0]), targets, jnp.asarray([True, True, False])
    )
    assert np.isfinite(float(loss))
