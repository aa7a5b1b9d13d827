"""Numeric tests for the op layer: NMS, focal losses, IoU loss, locations,
dynamic conv. NMS vectors include the hand-computed cases from the
reference's tests/test_nms.py (Caffe2 UtilsNMSTest lineage)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scan_tpu.ops import (
    nms,
    ml_nms,
    sigmoid_focal_loss,
    softmax_focal_loss,
    bce_focal_loss,
    iou_loss,
    compute_locations_level,
    dynamic_conv,
)


def _run_nms(boxes, scores, thresh, labels=None):
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    valid = jnp.ones((boxes.shape[0],), bool)
    if labels is None:
        keep = nms(boxes, scores, valid, thresh)
    else:
        keep = ml_nms(boxes, scores, jnp.asarray(labels), valid, thresh)
    return np.nonzero(np.asarray(keep))[0]


def _greedy_nms_ref(boxes, scores, thresh, labels=None):
    """Plain-python greedy NMS with the +1 convention (oracle)."""
    boxes = np.asarray(boxes, np.float64)
    order = np.argsort(-np.asarray(scores))
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if labels is not None and labels[i] != labels[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            a_i = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
            a_j = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
            if inter / (a_i + a_j - inter) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_nms_single_box():
    keep = _run_nms([[10, 10, 50, 60]], [0.5], 0.5)
    assert list(keep) == [0]


def test_nms_identical_boxes():
    # 10 identical boxes -> exactly one survivor (reference test_nms.py case).
    boxes = [[10, 10, 50, 60]] * 10
    scores = [0.5] * 10
    keep = _run_nms(boxes, scores, 0.5)
    assert len(keep) == 1


def test_nms_vs_oracle_random():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        xy = rng.uniform(0, 100, (n, 2))
        wh = rng.uniform(5, 60, (n, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1)
        scores = rng.uniform(0, 1, n)
        for thresh in (0.3, 0.5, 0.7):
            got = sorted(_run_nms(boxes, scores, thresh))
            want = _greedy_nms_ref(boxes, scores, thresh)
            assert got == want, f"trial={trial} thresh={thresh}"


def test_ml_nms_only_same_label_suppresses():
    boxes = [[10, 10, 50, 60], [10, 10, 50, 60]]
    scores = [0.9, 0.5]
    keep = _run_nms(boxes, scores, 0.5, labels=[1, 2])
    assert len(keep) == 2
    keep = _run_nms(boxes, scores, 0.5, labels=[1, 1])
    assert len(keep) == 1


def test_nms_respects_padding():
    boxes = jnp.asarray([[10, 10, 50, 60], [0, 0, 0, 0]], jnp.float32)
    scores = jnp.asarray([0.5, 99.0], jnp.float32)
    valid = jnp.asarray([True, False])
    keep = np.asarray(nms(boxes, scores, valid, 0.5))
    assert keep.tolist() == [True, False]


def test_sigmoid_focal_loss_matches_reference_formula():
    rng = np.random.RandomState(1)
    logits = rng.randn(40, 8).astype(np.float32)
    targets = rng.randint(0, 9, 40)
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))

    # replicate reference layers/sigmoid_focal_loss.py:40-53 in numpy
    gamma, alpha = 2.0, 0.25
    class_range = np.arange(1, 9)[None, :]
    t = targets[:, None]
    p = 1 / (1 + np.exp(-logits))
    term1 = (1 - p) ** gamma * np.log(p)
    term2 = p**gamma * np.log(1 - p)
    want = (
        -(t == class_range).astype(np.float64) * term1 * alpha
        - ((t != class_range) & (t >= 0)).astype(np.float64) * term2 * (1 - alpha)
    ).sum()
    assert abs(got - want) < 1e-3


def test_sigmoid_focal_loss_mask_zeroes_padding():
    logits = jnp.ones((4, 3))
    targets = jnp.asarray([1, 2, 0, 3])
    m = jnp.asarray([True, True, False, False])
    full = sigmoid_focal_loss(logits[:2], targets[:2])
    masked = sigmoid_focal_loss(logits, targets, valid_mask=m)
    assert abs(float(full) - float(masked)) < 1e-6


def test_softmax_focal_loss_formula():
    rng = np.random.RandomState(2)
    logits = rng.randn(30, 9).astype(np.float32)
    targets = rng.randint(0, 9, 30)
    got = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    e = np.exp(logits - logits.max(1, keepdims=True))
    p = e / e.sum(1, keepdims=True)
    pt = p[np.arange(30), targets]
    want = (-((1 - pt) ** 2) * np.log(pt)).mean()
    assert abs(got - want) < 1e-4


def test_bce_focal_loss_formula():
    rng = np.random.RandomState(3)
    logits = rng.randn(20, 2).astype(np.float32)
    targets = np.zeros((20, 2), np.float32)
    targets[np.arange(20), rng.randint(0, 2, 20)] = 1
    got = float(bce_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    pt = np.clip(1 / (1 + np.exp(-logits)), 1e-5, 1 - 1e-5)
    loss = -0.25 * (1 - pt) ** 2 * targets * np.log(pt) - 0.75 * pt**2 * (
        1 - targets
    ) * np.log(1 - pt)
    assert abs(got - loss.mean()) < 1e-4


def test_iou_loss_perfect_match_is_near_zero():
    t = jnp.asarray([[10.0, 10, 10, 10], [3, 4, 5, 6]])
    out = float(iou_loss(t, t))
    assert out < 0.02  # -log((I+1)/(U+1)) == 0 exactly when I == U


def test_iou_loss_weighting():
    pred = jnp.asarray([[10.0, 10, 10, 10], [1, 1, 1, 1]])
    tgt = jnp.asarray([[10.0, 10, 10, 10], [2, 2, 2, 2]])
    w_first = float(iou_loss(pred, tgt, weight=jnp.asarray([1.0, 0.0])))
    assert w_first < 0.02


def test_locations_grid():
    locs = np.asarray(compute_locations_level(2, 3, 8))
    # row-major over y, x varies fastest; + stride//2 offset
    want = np.array(
        [[4, 4], [12, 4], [20, 4], [4, 12], [12, 12], [20, 12]], np.float32
    )
    np.testing.assert_allclose(locs, want)


def test_dynamic_conv_matches_manual():
    rng = np.random.RandomState(4)
    feats = rng.randn(2, 4, 5, 16).astype(np.float32)
    kern = rng.randn(9, 16).astype(np.float32)
    out = np.asarray(dynamic_conv(jnp.asarray(feats), jnp.asarray(kern)))
    want = np.einsum("bhwc,kc->bhwk", feats, kern)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_dynamic_conv_bias():
    rng = np.random.RandomState(5)
    feats = rng.randn(1, 2, 2, 8).astype(np.float32)
    kern = rng.randn(3, 9).astype(np.float32)
    out = np.asarray(dynamic_conv(jnp.asarray(feats), jnp.asarray(kern), with_bias=True))
    want = np.einsum("bhwc,kc->bhwk", feats, kern[:, :-1]) + kern[:, -1]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_iou_loss_inf_at_masked_row_has_finite_grads():
    """Round-4 stability-run collapse regression (iter 1837): an inf
    prediction at a MASKED row must not NaN the gradients — the output
    `where` zeroes the cotangent but 0 * inf from the untaken branch's
    area arithmetic is NaN unless the inputs are sanitised at entry."""
    import jax

    pred = jnp.asarray([[10.0, 10, 10, 10], [jnp.inf, 1e30, 5, 5]])
    tgt = jnp.asarray([[10.0, 10, 10, 10], [0, 0, 0, 0]])
    mask = jnp.asarray([True, False])

    def f(p):
        return iou_loss(p, tgt, weight=jnp.asarray([1.0, 0.0]),
                        valid_mask=mask)

    val, grads = jax.value_and_grad(f)(pred)
    assert np.isfinite(float(val))
    g = np.asarray(grads)
    assert np.all(np.isfinite(g)), g
    assert np.all(g[1] == 0.0)  # masked row contributes nothing


def test_fcos_head_exp_is_overflow_clamped():
    """The head's exp(scale * pred) must stay finite (and differentiable
    without NaN) even when the raw prediction drifts far past the fp32
    overflow point at an unsupervised location."""
    import jax

    from scan_tpu.modeling.fcos.head import FCOSHead

    head = FCOSHead(num_classes=9, num_levels=1, in_channels=32,
                    num_convs_cls=1, num_convs_reg=1)
    feat = [jnp.ones((1, 4, 4, 32), jnp.float32)]
    params = head.init(jax.random.PRNGKey(0), feat)

    # blow up the bbox_pred kernel so scale*pred >> 88 (fp32 exp overflow)
    params = jax.tree_util.tree_map(lambda x: x, params)  # copy structure
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    params["params"]["bbox_pred"]["Conv_0"]["kernel"] = (
        jnp.ones_like(params["params"]["bbox_pred"]["Conv_0"]["kernel"]) * 1e4
    )

    def f(p):
        _, reg, _ = head.apply(p, feat)
        return jnp.sum(reg[0])

    val, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
