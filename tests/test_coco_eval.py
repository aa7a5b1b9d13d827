"""Correctness tests for the self-contained COCO evaluator."""

import numpy as np

from scan_tpu.evaluation.coco_eval import (
    evaluate_detections,
    xyxy_to_xywh_plus1,
)


def _gt(bbox, cat=1, iscrowd=0):
    return {
        "bbox": bbox,
        "category_id": cat,
        "iscrowd": iscrowd,
        "area": bbox[2] * bbox[3],
        "ignore": 0,
    }


def _pred(boxes, scores, cats):
    return {
        "boxes_xywh": np.asarray(boxes, np.float64),
        "scores": np.asarray(scores, np.float64),
        "category_ids": np.asarray(cats),
    }


def test_perfect_predictions_give_ap1():
    gt = {
        1: [_gt([10, 10, 50, 60]), _gt([100, 100, 30, 30], cat=2)],
        2: [_gt([5, 5, 20, 20])],
    }
    preds = {
        1: _pred([[10, 10, 50, 60], [100, 100, 30, 30]], [0.9, 0.8], [1, 2]),
        2: _pred([[5, 5, 20, 20]], [0.95], [1]),
    }
    res = evaluate_detections(gt, preds, [1, 2])
    assert abs(res["AP"] - 1.0) < 1e-6
    assert abs(res["AP50"] - 1.0) < 1e-6


def test_no_predictions_gives_ap0():
    gt = {1: [_gt([10, 10, 50, 60])]}
    res = evaluate_detections(gt, {}, [1])
    assert res["AP50"] == 0.0


def test_false_positive_lowers_precision():
    gt = {1: [_gt([10, 10, 50, 60])]}
    # one spurious high-scoring detection far away + the true one lower
    preds = {
        1: _pred([[300, 300, 40, 40], [10, 10, 50, 60]], [0.9, 0.8], [1, 1])
    }
    res = evaluate_detections(gt, preds, [1])
    # recall 1 reached at precision 1/2 -> 101-pt AP ~ (1 pt at r=0 + ...)
    assert 0.4 < res["AP50"] < 0.6


def test_localization_quality_affects_higher_ious():
    # ~0.55 IoU box: counts at IoU .5 but not at .75
    gt = {1: [_gt([0, 0, 100, 100])]}
    preds = {1: _pred([[0, 0, 60, 100]], [0.9], [1])}
    res = evaluate_detections(gt, preds, [1])
    assert res["AP50"] > 0.99
    assert res["AP75"] < 0.01
    assert res["AP"] < res["AP50"]


def test_crowd_gt_is_ignore_region():
    gt = {1: [_gt([10, 10, 50, 60], iscrowd=1)]}
    # detection inside the crowd region: matched to ignore -> neither tp nor fp
    preds = {1: _pred([[10, 10, 50, 60]], [0.9], [1])}
    res = evaluate_detections(gt, preds, [1])
    # no non-ignored GT at all -> category skipped -> AP==-1 sentinel
    assert res["AP50"] == -1.0


def test_area_ranges():
    # a small (20x20=400 < 1024) and a large GT
    gt = {
        1: [_gt([0, 0, 20, 20]), _gt([50, 50, 200, 200])],
    }
    preds = {
        1: _pred([[0, 0, 20, 20], [50, 50, 200, 200]], [0.9, 0.8], [1, 1])
    }
    res = evaluate_detections(gt, preds, [1])
    assert abs(res["APs"] - 1.0) < 1e-6
    assert abs(res["APl"] - 1.0) < 1e-6
    assert res["APm"] == -1.0  # no medium GT


def test_xyxy_to_xywh_plus1():
    out = xyxy_to_xywh_plus1(np.asarray([[10, 20, 29, 49]]))
    np.testing.assert_allclose(out, [[10, 20, 20, 30]])


def test_score_ordering_matters():
    # two dets on one gt: higher-scored matches (tp), lower is fp
    gt = {1: [_gt([10, 10, 50, 60])]}
    preds = {
        1: _pred([[10, 10, 50, 60], [11, 11, 50, 60]], [0.6, 0.9], [1, 1])
    }
    res = evaluate_detections(gt, preds, [1])
    # the 0.9 det matches first (both overlap), 0.6 is fp; recall still 1
    assert 0.9 < res["AP50"] <= 1.0


def test_detections_for_class_with_no_gt_are_fps():
    # a class that appears only in predictions: contributes fps to that
    # category's stream without crashing (no GT -> npig 0 -> skipped)
    gt = {1: [_gt([10, 10, 50, 60], cat=1)]}
    preds = {1: _pred([[10, 10, 50, 60], [200, 200, 20, 20]], [0.9, 0.8], [1, 2])}
    res = evaluate_detections(gt, preds, [1, 2])
    assert abs(res["AP50"] - 1.0) < 1e-6 or res["AP50"] == 1.0
    assert res["per_category"][2] == -1.0
