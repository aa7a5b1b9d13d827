"""ATSS head/assignment/coder/postprocess tests + DA step with the
GA-discriminator EPM ATSS config."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.anchors import (
    atss_level_sizes,
    generate_cell_anchors,
    grid_anchors,
)
from scan_tpu.modeling.atss.atss import (
    ATSSConfig,
    atss_assign_single,
    atss_decode,
    atss_encode,
)

ATSS_CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "epm",
    "da_ga_sim10k_VGG_16_FPN_4x_atss.yaml",
)


def test_cell_anchors_detectron_math():
    # stride 8, size 64, ratio 1 -> one 64x64 anchor centred at (3.5, 3.5)
    a = generate_cell_anchors(8, (64,), (1.0,))
    assert a.shape == (1, 4)
    w = a[0, 2] - a[0, 0] + 1
    h = a[0, 3] - a[0, 1] + 1
    assert w == 64 and h == 64
    np.testing.assert_allclose((a[0, 0] + a[0, 2]) / 2, 3.5)


def test_encode_decode_roundtrip():
    cfg = ATSSConfig(num_classes=2)
    anchors = jnp.asarray(
        [[0.0, 0, 63, 63], [100, 100, 227, 227], [4, 4, 67, 67]]
    )
    gts = jnp.asarray([[5.0, 8, 60, 70], [90, 110, 260, 300], [0, 0, 50, 40]])
    enc = atss_encode(cfg, gts, anchors)
    dec = atss_decode(cfg, enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-3)


def test_atss_assignment_prefers_matching_scale():
    cfg = ATSSConfig(num_classes=2, topk=3)
    shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anchors = grid_anchors(
        shapes, cfg.strides,
        atss_level_sizes(cfg.anchor_sizes, cfg.octave, cfg.scales_per_octave),
        cfg.aspect_ratios,
    )
    level_counts = [a.shape[0] for a in anchors]
    anchors_cat = jnp.concatenate(anchors, 0)
    # one 64x64 gt centred in the image -> positives on P3 (size-64 anchors)
    gt = jnp.asarray([[0.0, 0, 63, 63]])
    labels, matched = atss_assign_single(
        cfg, anchors_cat, level_counts, gt, jnp.asarray([1]),
        jnp.asarray([True]),
    )
    labels = np.asarray(labels)
    assert labels.sum() > 0
    # positive anchors must be in the P3 range
    pos_idx = np.nonzero(labels)[0]
    assert np.all(pos_idx < level_counts[0])
    # matched boxes are the gt
    np.testing.assert_allclose(
        np.asarray(matched)[pos_idx], np.tile(np.asarray(gt[0]), (len(pos_idx), 1))
    )


def test_atss_assignment_empty_gt():
    cfg = ATSSConfig(num_classes=2)
    shapes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    anchors = grid_anchors(
        shapes, cfg.strides,
        atss_level_sizes(cfg.anchor_sizes, cfg.octave, cfg.scales_per_octave),
        cfg.aspect_ratios,
    )
    labels, _ = atss_assign_single(
        cfg, jnp.concatenate(anchors, 0), [a.shape[0] for a in anchors],
        jnp.zeros((3, 4)), jnp.zeros((3,), jnp.int32), jnp.zeros((3,), bool),
    )
    assert np.asarray(labels).sum() == 0


@pytest.mark.slow
def test_atss_da_train_step_and_inference():
    from scan_tpu.engine.train_step import make_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer

    cfg = get_default_cfg()
    cfg.merge_from_file(ATSS_CFG_PATH)
    cfg.TPU.MAX_BOXES = 8

    det = build_detector(cfg)
    assert det.atss_on
    assert set(p for p in det.dis_modules) == {
        "dis_P3", "dis_P4", "dis_P5", "dis_P6", "dis_P7"
    }

    rng = np.random.RandomState(0)
    b, h, w, g = 1, 64, 96, 8
    batch_s = dict(
        images=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        sizes=jnp.asarray([[h, w]], jnp.int32),
        boxes=jnp.zeros((b, g, 4)).at[0, 0].set(jnp.asarray([8.0, 8, 60, 56])),
        labels=jnp.zeros((b, g), jnp.int32).at[0, 0].set(1),
        mask=jnp.zeros((b, g), bool).at[0, 0].set(True),
    )
    batch_t = dict(images=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32))

    params, proto = det.init_params(jax.random.PRNGKey(0), batch_s["images"])
    assert proto is None  # condgraph off in this config
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)
    p1, os1, proto1, metrics = step(params, opt_state, proto, batch_s, batch_t,
                                    forward_target=False)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "loss_cls_gs" in metrics
    assert "loss_adv_P3_GA_ds" in metrics and "loss_adv_P7_GA_dt" in metrics

    out = det.forward_inference(params, proto, batch_s["images"], batch_s["sizes"])
    assert out["boxes"].shape == (1, 100, 4)
    assert np.all(np.isfinite(np.asarray(out["scores"])))


def test_adapt_atss_topk_table_and_assignment():
    from scan_tpu.modeling.atss.atss import compute_adapt_topk
    import dataclasses

    tbl = compute_adapt_topk([1000, 100, 10], base_topk=9, cap=17)
    assert tbl[0] == 9            # common class keeps base
    assert tbl[2] == 17           # rare class capped at 17
    assert tbl[1] >= tbl[0]

    cfg = dataclasses.replace(
        ATSSConfig(num_classes=4, topk=3), positive_type="ADAPT_ATSS",
        adapt_topk=(3, 5, 9),
    )
    shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    anchors = grid_anchors(
        shapes, cfg.strides,
        atss_level_sizes(cfg.anchor_sizes, cfg.octave, cfg.scales_per_octave),
        cfg.aspect_ratios,
    )
    labels, matched = atss_assign_single(
        cfg, jnp.concatenate(anchors, 0), [a.shape[0] for a in anchors],
        jnp.asarray([[0.0, 0, 63, 63]]), jnp.asarray([3]),
        jnp.asarray([True]),
    )
    assert np.asarray(labels).max() == 3


def test_adapt_atss_wired_from_cfg(tmp_path, monkeypatch):
    """POSITIVE_TYPE='ADAPT_ATSS' in a config derives the per-class topk
    table from the configured training dataset's class frequencies
    (reference atss/loss.py:41-60)."""
    import json

    from scan_tpu.config import get_default_cfg
    from scan_tpu.config.paths_catalog import DatasetCatalog

    # synthetic COCO annotations: class 1 common (10 inst), class 2 rare (1)
    anns = []
    k = 0
    for img_id, n1 in ((1, 6), (2, 4)):
        for _ in range(n1):
            k += 1
            anns.append(dict(id=k, image_id=img_id, category_id=1,
                             bbox=[0, 0, 10, 10], area=100, iscrowd=0))
    k += 1
    anns.append(dict(id=k, image_id=1, category_id=2,
                     bbox=[5, 5, 10, 10], area=100, iscrowd=0))
    coco = dict(
        images=[dict(id=1, width=64, height=64, file_name="1.jpg"),
                dict(id=2, width=64, height=64, file_name="2.jpg")],
        categories=[dict(id=1, name="a"), dict(id=2, name="b")],
        annotations=anns,
    )
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(coco))
    monkeypatch.setitem(
        DatasetCatalog.DATASETS, "coco_synth_adapt",
        {"img_dir": str(tmp_path), "ann_file": str(ann_file)},
    )

    cfg = get_default_cfg()
    cfg.DATASETS.TRAIN_SOURCE = ("coco_synth_adapt",)
    cfg.MODEL.ATSS.NUM_CLASSES = 3
    cfg.MODEL.ATSS.POSITIVE_TYPE = "ADAPT_ATSS"
    acfg = ATSSConfig.from_cfg(cfg)
    # counts=[10,1], mean=5.5: common keeps base 9, rare capped at 17
    assert acfg.adapt_topk == (9, 17)

    # missing dataset files -> graceful fallback to plain ATSS (None table)
    cfg2 = get_default_cfg()
    cfg2.DATASETS.TRAIN_SOURCE = ("cityscapes_train_cocostyle",)
    cfg2.MODEL.ATSS.POSITIVE_TYPE = "ADAPT_ATSS"
    acfg2 = ATSSConfig.from_cfg(cfg2)
    assert acfg2.adapt_topk is None


@pytest.mark.slow
def test_atss_postprocess_recovers_planted_box():
    import dataclasses

    from scan_tpu.modeling.atss.atss import atss_encode, atss_postprocess
    from scan_tpu.modeling.fcos.postprocess import PostProcessConfig

    cfg = ATSSConfig(num_classes=3)
    shapes = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
    anchors = grid_anchors(
        shapes, cfg.strides,
        atss_level_sizes(cfg.anchor_sizes, cfg.octave, cfg.scales_per_octave),
        cfg.aspect_ratios,
    )
    box_cls = [jnp.full((1, h, w, 2), -8.0) for h, w in shapes]
    box_reg = [jnp.zeros((1, h, w, 4)) for h, w in shapes]
    ctr = [jnp.full((1, h, w, 1), 4.0) for h, w in shapes]

    # plant at level 0, anchor (y=2, x=3), class idx 1 (label 2) with a
    # known target box encoded through the coder
    target = jnp.asarray([[10.0, 8.0, 70.0, 60.0]])
    a_idx = 2 * 20 + 3
    enc = atss_encode(cfg, target, anchors[0][a_idx : a_idx + 1])[0]
    box_cls[0] = box_cls[0].at[0, 2, 3, 1].set(6.0)
    box_reg[0] = box_reg[0].at[0, 2, 3].set(enc)

    pp = PostProcessConfig(num_classes=3, nms_cap=256)
    out = atss_postprocess(
        cfg, pp, anchors, box_cls, box_reg, ctr,
        jnp.asarray([[128, 160]], jnp.int32),
    )
    assert bool(out["valid"][0, 0])
    assert int(out["labels"][0, 0]) == 2
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0, 0]), np.asarray(target[0]), atol=0.1
    )
