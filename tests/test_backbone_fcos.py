"""Backbone / FCOS head shape and pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.backbone.build import build_backbone
from scan_tpu.modeling.fcos.head import FCOSHead
from scan_tpu.modeling.fcos.loss import fcos_losses
from scan_tpu.modeling.fcos.postprocess import PostProcessConfig, fcos_postprocess
from scan_tpu.ops.locations import compute_locations, level_sizes_from_image

STRIDES = [8, 16, 32, 64, 128]


def _vgg_cfg():
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "VGG-16-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    return cfg


def test_vgg_fpn_shapes():
    cfg = _vgg_cfg()
    model = build_backbone(cfg)
    x = jnp.zeros((1, 128, 160, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    want = level_sizes_from_image(128, 160, STRIDES)
    for f, (h, w) in zip(feats, want):
        assert f.shape == (1, h, w, 256), (f.shape, (h, w))


def test_resnet_fpn_shapes():
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "R-50-FPN-RETINANET"
    cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS = 256
    cfg.MODEL.RETINANET.USE_C5 = False
    model = build_backbone(cfg)
    x = jnp.zeros((1, 128, 160, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    want = level_sizes_from_image(128, 160, STRIDES)
    for f, (h, w) in zip(feats, want):
        assert f.shape == (1, h, w, 256)


def _head_outputs(batch=2, hw=(16, 20), num_classes=9):
    head = FCOSHead(num_classes=num_classes, with_reg_ctr=True)
    feats = [
        jnp.asarray(np.random.RandomState(l).randn(batch, hw[0] // 2**l + 1, hw[1] // 2**l + 1, 256), jnp.float32)
        for l in range(5)
    ]
    params = head.init(jax.random.PRNGKey(0), feats)
    logits, reg, ctr = head.apply(params, feats)
    return feats, logits, reg, ctr


def test_fcos_head_shapes_and_priors():
    feats, logits, reg, ctr = _head_outputs()
    assert len(logits) == len(reg) == len(ctr) == 5
    for f, lg, rg, ct in zip(feats, logits, reg, ctr):
        b, h, w, _ = f.shape
        assert lg.shape == (b, h, w, 8)
        assert rg.shape == (b, h, w, 4)
        assert ct.shape == (b, h, w, 1)
        assert np.all(np.asarray(rg) > 0)  # exp'ed
    # focal prior: mean sigmoid(logit) should be near 0.01 at init
    p = float(jax.nn.sigmoid(logits[0]).mean())
    assert 0.001 < p < 0.1


def test_fcos_loss_runs_and_is_finite():
    num_classes = 9
    batch = 2
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    rng = np.random.RandomState(0)
    box_cls = [jnp.asarray(rng.randn(batch, h, w, 8), jnp.float32) for h, w in shapes]
    box_reg = [jnp.asarray(np.abs(rng.randn(batch, h, w, 4)) * 20 + 1, jnp.float32) for h, w in shapes]
    ctr = [jnp.asarray(rng.randn(batch, h, w, 1), jnp.float32) for h, w in shapes]
    locations = compute_locations(shapes, STRIDES)

    G = 10
    gt_boxes = np.zeros((batch, G, 4), np.float32)
    gt_labels = np.zeros((batch, G), np.int32)
    gt_mask = np.zeros((batch, G), bool)
    gt_boxes[0, 0] = [10, 10, 60, 70]
    gt_labels[0, 0] = 3
    gt_mask[0, 0] = True
    gt_boxes[1, 0] = [30, 20, 100, 120]
    gt_labels[1, 0] = 1
    gt_mask[1, 0] = True

    losses = fcos_losses(
        locations, box_cls, box_reg, ctr,
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask),
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_cls"]) > 0


def test_fcos_loss_empty_targets_zero_pos():
    batch = 1
    shapes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    box_cls = [jnp.zeros((batch, h, w, 8)) for h, w in shapes]
    box_reg = [jnp.ones((batch, h, w, 4)) for h, w in shapes]
    ctr = [jnp.zeros((batch, h, w, 1)) for h, w in shapes]
    locations = compute_locations(shapes, STRIDES)
    losses = fcos_losses(
        locations, box_cls, box_reg, ctr,
        jnp.zeros((1, 5, 4)), jnp.zeros((1, 5), jnp.int32), jnp.zeros((1, 5), bool),
    )
    assert float(losses["loss_reg"]) == 0.0
    assert float(losses["loss_centerness"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


def test_postprocess_recovers_planted_box():
    """Plant one strong detection at a known location; it must come out."""
    num_classes = 9
    batch = 1
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    locations = compute_locations(shapes, STRIDES)
    box_cls = [jnp.full((batch, h, w, 8), -8.0) for h, w in shapes]
    box_reg = [jnp.ones((batch, h, w, 4)) * 5 for h, w in shapes]
    ctr = [jnp.full((batch, h, w, 1), 4.0) for h, w in shapes]

    # strong logit at level 0, position (y=2, x=3), class idx 4 (label 5)
    box_cls[0] = box_cls[0].at[0, 2, 3, 4].set(6.0)
    # ltrb = (12, 8, 20, 16) around location (x=3*8+4=28, y=2*8+4=20)
    box_reg[0] = box_reg[0].at[0, 2, 3].set(jnp.asarray([12.0, 8.0, 20.0, 16.0]))

    cfg = PostProcessConfig(num_classes=num_classes, nms_cap=256)
    out = fcos_postprocess(
        cfg, locations, box_cls, box_reg, ctr,
        jnp.asarray([[128, 160]], jnp.int32),
    )
    assert out["boxes"].shape == (1, 100, 4)
    assert bool(out["valid"][0, 0])
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0, 0]), [28 - 12, 20 - 8, 28 + 20, 20 + 16], atol=1e-3
    )
    assert int(out["labels"][0, 0]) == 5
    # score = sqrt(sigmoid(6) * sigmoid(4))
    want = np.sqrt((1 / (1 + np.exp(-6.0))) * (1 / (1 + np.exp(-4.0))))
    np.testing.assert_allclose(float(out["scores"][0, 0]), want, atol=1e-4)
