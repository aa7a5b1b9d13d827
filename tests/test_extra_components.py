"""Tests for auxiliary components: deform conv, MobileNetV2, target-sampling
variants, expected-results checker, ROI ops."""

import os

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from scan_tpu.ops.deform_conv import deform_conv2d
from scan_tpu.ops.roi_align import roi_align
from scan_tpu.evaluation.expected_results import check_expected_results
from scan_tpu.modeling.condgraph.sampling import (
    density_cluster_drop_first,
    kmeans2_minority,
    meanshift_high_mode,
    sample_target_nodes,
)


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 9, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    offsets = jnp.zeros((1, 8, 9, 18))
    got = deform_conv2d(x, offsets, w)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_deform_conv_integer_shift():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 10, 2), jnp.float32)
    # 1x1-like kernel via 3x3 with only centre tap nonzero
    w = jnp.zeros((3, 3, 2, 2)).at[1, 1].set(jnp.eye(2))
    # shift every sample by (dy=1, dx=0): out[y] = x[y+1]
    offsets = jnp.zeros((1, 10, 10, 18)).at[..., 2 * 4].set(1.0)
    got = np.asarray(deform_conv2d(x, offsets, w))
    want = np.asarray(x)[:, 1:, :, :]
    np.testing.assert_allclose(got[:, :-1], want, atol=1e-5)


@pytest.mark.slow
def test_mobilenet_v2_endpoints():
    from scan_tpu.modeling.backbone.mobilenet import MobileNetV2

    m = MobileNetV2()
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    shapes = [(o.shape[1], o.shape[2], o.shape[3]) for o in outs]
    assert shapes == [(16, 24, 24), (8, 12, 32), (4, 6, 96), (2, 3, 320)]


@pytest.mark.slow
def test_mnv2_fpn_builder():
    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.backbone.build import build_backbone

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "MNV2-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    model = build_backbone(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert len(feats) == 5
    assert feats[0].shape == (1, 8, 12, 256)


def test_kmeans_minority():
    rng = np.random.RandomState(2)
    big = rng.randn(40, 8) * 0.1
    small = rng.randn(8, 8) * 0.1 + 5.0
    pts = jnp.asarray(np.vstack([big, small]), jnp.float32)
    valid = jnp.ones((48,), bool)
    keep = np.asarray(kmeans2_minority(pts, valid))
    assert keep[40:].all() and not keep[:40].any()


def test_meanshift_high_mode():
    scores = jnp.asarray([0.01] * 30 + [0.9] * 5, jnp.float32)
    valid = jnp.ones((35,), bool)
    keep = np.asarray(meanshift_high_mode(scores, valid))
    assert keep[30:].all() and not keep[:30].any()


def test_density_cluster_keeps_secondary_blobs():
    rng = np.random.RandomState(3)
    blob0 = rng.randn(30, 4) * 0.05          # dominant blob -> dropped
    blob1 = rng.randn(10, 4) * 0.05 + 10.0   # secondary -> kept
    lone = np.ones((1, 4)) * 50.0            # noise -> kept
    pts = jnp.asarray(np.vstack([blob0, blob1, lone]), jnp.float32)
    valid = jnp.ones((41,), bool)
    keep = np.asarray(density_cluster_drop_first(pts, valid, eps=1.0))
    assert not keep[:30].any()
    assert keep[30:40].all()
    assert keep[40]


@pytest.mark.slow
def test_sample_target_modes_run():
    rng = np.random.RandomState(4)
    feats = [jnp.asarray(rng.randn(1, 8, 10, 16), jnp.float32) for _ in range(2)]
    acts = [
        jnp.asarray(jax.nn.softmax(rng.randn(1, 8, 10, 4), -1), jnp.float32)
        for _ in range(2)
    ]
    for mode in ("score_threshold", "dbscan", "kmeans", "mean_shift"):
        nodes, labels, valid, any_nodes = sample_target_nodes(
            feats, acts, max_nodes=32, sampling_cfg=mode,
            score_threshold=0.3, max_candidates_per_level=64,
        )
        assert nodes.shape == (32, 16)
        assert np.all(np.isfinite(np.asarray(nodes)))


def test_expected_results_checker():
    results = {"AP50": 0.42}
    assert check_expected_results(results, [("bbox", "AP50", 0.41, 0.01)], 2)
    assert not check_expected_results(results, [("bbox", "AP50", 0.30, 0.01)], 2)
    assert check_expected_results(results, [], 2)


def test_roi_align_known_values():
    ramp = jnp.broadcast_to(jnp.arange(16.0)[None, :, None], (16, 16, 1))[None]
    out = roi_align(ramp, jnp.asarray([[8.0, 8, 40, 40]]), jnp.asarray([0]),
                    4, 0.25, 2)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, :, 0]), [3.0, 5.0, 7.0, 9.0], atol=1e-5
    )


def test_fbnet_trunk_and_builder():
    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.backbone.build import build_backbone
    from scan_tpu.modeling.backbone.fbnet import FBNetTrunk

    m = FBNetTrunk(arch="default")
    x = jnp.zeros((1, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert outs[-1].shape[-1] == 240

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "FBNet"
    cfg.MODEL.RETINANET.USE_C5 = False
    model = build_backbone(cfg)
    feats = model.apply(model.init(jax.random.PRNGKey(0), x), x)
    assert len(feats) == 5 and feats[0].shape == (1, 8, 12, 256)


@pytest.mark.slow
def test_tensorboard_logger_writes_events(tmp_path):
    """--use-tensorboard wiring: log_scalars produces an events file
    (reference utils/metric_logger.py:71-106 TensorboardLogger)."""
    from scan_tpu.utils.tensorboard import TensorboardLogger

    tb = TensorboardLogger(str(tmp_path))
    tb.log_scalars({"loss_total": 1.5, "val/AP50": 0.3}, step=20)
    tb.flush()
    if tb._writer is None:  # backend unavailable in this env
        return
    import os

    files = os.listdir(str(tmp_path))
    assert any("tfevents" in f for f in files), files


# --------------------------------------------------------------------- #
# ModelCatalog / cache_url (reference utils/model_zoo.py:10-64,
# config/paths_catalog.py:184-235, utils/checkpoint.py:117-139)
# --------------------------------------------------------------------- #
def test_model_catalog_urls():
    from scan_tpu.config.paths_catalog import ModelCatalog

    assert ModelCatalog.get("ImageNetPretrained/MSRA/R-50") == (
        "https://dl.fbaipublicfiles.com/detectron/"
        "ImageNetPretrained/MSRA/R-50.pkl"
    )
    url = ModelCatalog.get(
        "Caffe2Detectron/COCO/35857345/e2e_faster_rcnn_R-50-FPN_1x"
    )
    assert url == (
        "https://dl.fbaipublicfiles.com/detectron/35857345/"
        "12_2017_baselines/e2e_faster_rcnn_R-50-FPN_1x.yaml."
        "01_36_30.cUF7QR7I/output/train/coco_2014_train%3A"
        "coco_2014_valminusminival/generalized_rcnn/model_final.pkl"
    )
    kp = ModelCatalog.get(
        "Caffe2Detectron/COCO/37697547/e2e_keypoint_rcnn_R-50-FPN_1x"
    )
    assert "keypoints_coco_2014_train" in kp
    with pytest.raises(RuntimeError):
        ModelCatalog.get("NotACatalog/thing")


def test_cache_url_filename_and_cache_hit(tmp_path, monkeypatch):
    from scan_tpu.utils.model_zoo import cache_url, url_to_filename

    # hash-named pth keeps its basename; detectron model_final.pkl
    # flattens the path; a #fragment wins outright
    assert url_to_filename(
        "https://x/y/vgg16_caffe-292e1171.pth"
    ) == "vgg16_caffe-292e1171.pth"
    assert url_to_filename(
        "https://dl.fb.com/detectron/35857345/x/model_final.pkl"
    ) == "_detectron_35857345_x_model_final.pkl"
    assert url_to_filename("https://x/y/a.pth#alias.pth") == "alias.pth"

    # pre-cached file is returned without any network access
    cached = tmp_path / "vgg16_caffe-292e1171.pth"
    cached.write_bytes(b"weights")
    def boom(*a, **k):
        raise AssertionError("network touched on cache hit")
    monkeypatch.setattr("scan_tpu.utils.model_zoo._download", boom)
    got = cache_url(
        "https://x/y/vgg16_caffe-292e1171.pth", model_dir=str(tmp_path)
    )
    assert got == str(cached)


def test_resolve_weight_uri_catalog_cached(tmp_path, monkeypatch):
    from scan_tpu.utils.model_zoo import resolve_weight_uri

    monkeypatch.setenv("SCAN_TPU_CACHE_DIR", str(tmp_path))
    (tmp_path / "R-50.pkl").write_bytes(b"caffe2")
    got = resolve_weight_uri("catalog://ImageNetPretrained/MSRA/R-50")
    assert got == str(tmp_path / "R-50.pkl")
    # local paths pass through untouched
    assert resolve_weight_uri("/a/b/c.pth") == "/a/b/c.pth"


def test_list_dataset(tmp_path):
    from PIL import Image

    from scan_tpu.data import ListDataset

    p = tmp_path / "img.png"
    Image.fromarray(np.zeros((32, 48, 3), np.uint8)).save(p)
    ds = ListDataset([str(p)])
    assert len(ds) == 1
    info = ds.get_img_info(0)
    assert (info["height"], info["width"]) == (32, 48)
    boxes, labels = ds.get_raw_target(0)
    np.testing.assert_allclose(boxes, [[0, 0, 47, 31]])
    assert labels.tolist() == [1]
    assert ds.load_image(0).shape == (32, 48, 3)


def test_instances2dict_with_polygons(tmp_path):
    """Pure-numpy instanceIds.png ingestion (reference
    tools/cityscapes/instances2dict_with_polygons.py:19-71): contours
    cover each instance, pixelCount exact, semantic pixels skipped."""
    import sys as _sys

    tools_dir = os.path.join(
        os.path.dirname(__file__), "..", "tools", "cityscapes"
    )
    _sys.path.insert(0, tools_dir)
    try:
        from instances2dict_with_polygons import (
            external_contours, instances2dict_with_polygons,
        )
    finally:
        _sys.path.pop(0)

    from PIL import Image as PILImage

    img = np.zeros((40, 60), np.int32)
    img[:] = 7 * 1  # 'road' semantic pixels (no instance)
    img[5:15, 10:30] = 26000  # car instance 0
    img[20:35, 40:55] = 26001  # car instance 1
    img[18:22, 2:6] = 24000  # person instance
    p = tmp_path / "x_gtFine_instanceIds.png"
    PILImage.fromarray(img, mode="I").save(p)

    out = instances2dict_with_polygons(str(p))
    inst = out[os.path.abspath(str(p))]
    cars = inst["car"]
    assert len(cars) == 2
    assert {c["instID"] for c in cars} == {26000, 26001}
    c0 = next(c for c in cars if c["instID"] == 26000)
    assert c0["pixelCount"] == 10 * 20
    assert len(c0["contours"]) == 1
    xs, ys = c0["contours"][0][0::2], c0["contours"][0][1::2]
    assert (min(xs), min(ys), max(xs), max(ys)) == (10, 5, 29, 14)
    # boundary trace visits every corner of the rectangle
    pts = set(zip(xs, ys))
    assert {(10, 5), (29, 5), (29, 14), (10, 14)} <= pts
    assert len(inst["person"]) == 1
    # 'road' never appears as an instance
    assert inst["road"] == []

    # two disjoint components under one instance id -> two contours
    m = np.zeros((10, 10), bool)
    m[1:3, 1:3] = True
    m[6:9, 6:9] = True
    cs = external_contours(m)
    assert len(cs) == 2
