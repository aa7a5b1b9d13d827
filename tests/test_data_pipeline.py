"""Synthetic-COCO data pipeline tests: dataset parsing, transforms,
bucketed fixed-shape batching, and evaluation round-trip."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from scan_tpu.config import get_default_cfg
from scan_tpu.data.build import DetectionLoader, compute_bucket_hw
from scan_tpu.data.datasets.coco import COCODataset
from scan_tpu.data.transforms import Preprocessor, get_resize_hw
from scan_tpu.evaluation.coco_eval import evaluate_coco_dataset


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    sizes = [(120, 160), (100, 140), (120, 160)]
    for i, (h, w) in enumerate(sizes, start=1):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"img{i}.png")
        images.append(
            dict(id=i, file_name=f"img{i}.png", height=h, width=w)
        )
        for b in range(2):
            x, y = 10 + 30 * b, 12 + 20 * b
            bw, bh = 40, 35
            annotations.append(
                dict(
                    id=ann_id, image_id=i, category_id=(b % 2) + 1,
                    bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                )
            )
            ann_id += 1
    cats = [dict(id=1, name="car"), dict(id=2, name="person")]
    ann_file = root / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return str(ann_file), str(img_dir)


def test_dataset_parsing(tiny_coco):
    ann, img_dir = tiny_coco
    ds = COCODataset(ann, img_dir, remove_images_without_annotations=True)
    assert len(ds) == 3
    boxes, labels = ds.get_raw_target(0)
    assert boxes.shape == (2, 4)
    # xywh -> xyxy with -1: [10,12,40,35] -> [10,12,49,46]
    np.testing.assert_allclose(boxes[0], [10, 12, 49, 46])
    assert labels.tolist() == [1, 2]
    img = ds.load_image(0)
    assert img.shape == (120, 160, 3)


def _small_cfg():
    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 160
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.TPU.MAX_BOXES = 10
    cfg.TPU.LOADER_THREADS = 2
    return cfg


def test_loader_fixed_shapes(tiny_coco):
    ann, img_dir = tiny_coco
    ds = COCODataset(ann, img_dir, remove_images_without_annotations=True)
    cfg = _small_cfg()
    loader = DetectionLoader(ds, cfg, is_train=True, batch_size=2, max_iters=3)
    batches = list(loader)
    assert len(batches) == 3
    H, W = loader.bucket_hw
    assert H % 32 == 0 and W % 32 == 0
    for b in batches:
        assert b["images"].shape == (2, H, W, 3)
        assert b["boxes"].shape == (2, 10, 4)
        assert b["mask"].dtype == bool
        assert b["mask"].sum() > 0
        # boxes stay inside the resized image extent
        for s in range(2):
            oh, ow = b["sizes"][s]
            valid_boxes = b["boxes"][s][b["mask"][s]]
            assert np.all(valid_boxes[:, 2] <= ow)
            assert np.all(valid_boxes[:, 3] <= oh)


def test_eval_loader_and_scale_roundtrip(tiny_coco):
    ann, img_dir = tiny_coco
    ds = COCODataset(ann, img_dir, remove_images_without_annotations=False)
    cfg = _small_cfg()
    loader = DetectionLoader(ds, cfg, is_train=False, batch_size=2)
    batches = list(loader)
    assert sum(int((b["indices"] >= 0).sum()) for b in batches) == 3

    # feed the GROUND TRUTH (rescaled back to original) as predictions:
    # the evaluator must return AP == 1.
    predictions = {}
    for b in batches:
        for s in range(2):
            idx = int(b["indices"][s])
            if idx < 0:
                continue
            m = b["mask"][s]
            boxes = b["boxes"][s][m]
            sw, sh = b["scales"][s]
            boxes = boxes * np.asarray([sw, sh, sw, sh])
            predictions[idx] = dict(
                boxes=boxes,
                scores=np.ones(m.sum()),
                labels=b["labels"][s][m],
            )
    res = evaluate_coco_dataset(ds, predictions)
    assert res["AP50"] > 0.99
    assert res["AP"] > 0.9  # resize rounding can nudge the highest IoUs


def test_resize_math_matches_reference_rules():
    # aspect 2:1, min side 800 capped by max 1333
    # round(666.5) banker's-rounds to 666, matching the reference's
    # int(round(...)) on python3
    assert get_resize_hw(2048, 1024, 800, 1333) == (666, 1332)
    assert get_resize_hw(1024, 2048, 800, 1333) == (1332, 666)
    assert get_resize_hw(800, 600, 600, 1000) == (600, 800)


def test_preprocessor_bgr255_and_flip():
    img = np.zeros((4, 6, 3), np.uint8)
    img[:, :, 0] = 200  # R
    pre = Preprocessor([4], 6, [102.9801, 115.9465, 122.7717], [1, 1, 1],
                       to_bgr255=True, flip_prob=0.0)
    out, _, (oh, ow) = pre(img, None)
    assert (oh, ow) == (4, 6)
    # channel 0 must now be B (0 - mean_b)
    np.testing.assert_allclose(out[0, 0, 0], -102.9801, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2], 200 - 122.7717, rtol=1e-5)

    pre_flip = Preprocessor([4], 6, [0, 0, 0], [1, 1, 1], flip_prob=1.0)
    boxes = np.asarray([[0.0, 0, 2, 3]], np.float32)
    _, fboxes, _ = pre_flip(img, boxes.copy())
    np.testing.assert_allclose(fboxes[0], [6 - 2 - 1, 0, 6 - 0 - 1, 3])


def test_aspect_ratio_grouping(tmp_path):
    """Mixed-orientation dataset: eval batches come in per-orientation
    buckets and cover every image exactly once."""
    import json as _json

    root = tmp_path / "mixed"
    img_dir = root / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    sizes = [(80, 120), (120, 80), (80, 124), (124, 80)]  # 2 landscape, 2 portrait
    for i, (h, w) in enumerate(sizes, start=1):
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(img_dir / f"i{i}.png")
        images.append(dict(id=i, file_name=f"i{i}.png", height=h, width=w))
        annotations.append(
            dict(id=i, image_id=i, category_id=1, bbox=[5, 5, 30, 30],
                 area=900, iscrowd=0)
        )
    ann = root / "ann.json"
    with open(ann, "w") as f:
        _json.dump(
            dict(images=images, annotations=annotations,
                 categories=[dict(id=1, name="x")]), f,
        )
    ds = COCODataset(str(ann), str(img_dir), remove_images_without_annotations=False)
    cfg = _small_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    loader = DetectionLoader(ds, cfg, is_train=False, batch_size=2)
    assert len(loader.buckets) == 2
    batches = list(loader)
    shapes = {b["images"].shape[1:3] for b in batches}
    assert len(shapes) == 2  # one bucket per orientation
    seen = sorted(
        int(i) for b in batches for i in b["indices"] if int(i) >= 0
    )
    assert seen == [0, 1, 2, 3]

    # training stream yields full batches from single groups
    tl = DetectionLoader(ds, cfg, is_train=True, batch_size=2, max_iters=6)
    for b in tl:
        hs = set()
        for s in range(2):
            oh, ow = b["sizes"][s]
            hs.add(oh > ow)
        assert len(hs) == 1  # no mixed orientation inside a batch


def _rand_cfg():
    """Config with real train-time randomness: size range + flip."""
    cfg = _small_cfg()
    cfg.INPUT.MIN_SIZE_TRAIN = (80, 96)
    cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.5
    return cfg


def test_loader_deterministic_across_thread_counts(tiny_coco):
    """Transform draws are keyed by (seed, iteration, slot), so the
    batch stream must be identical under any prefetch-thread schedule."""
    ann, img_dir = tiny_coco
    ds = COCODataset(ann, img_dir, remove_images_without_annotations=True)
    cfg = _rand_cfg()
    runs = []
    for threads in (1, 3):
        loader = DetectionLoader(ds, cfg, True, 2, max_iters=6,
                                 num_threads=threads)
        runs.append(list(loader))
    for a, b in zip(*runs):
        for k in ("images", "sizes", "boxes", "labels", "mask"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_loader_start_iter_resumes_exact_stream(tiny_coco):
    """start_iter=k yields exactly the tail of the full stream —
    indices AND transform draws (reference IterationBasedBatchSampler,
    fcos_core/data/build.py:86-104 + make_data_loader(start_iter))."""
    ann, img_dir = tiny_coco
    ds = COCODataset(ann, img_dir, remove_images_without_annotations=True)
    cfg = _rand_cfg()
    full = list(DetectionLoader(ds, cfg, True, 2, max_iters=7))
    tail = list(DetectionLoader(ds, cfg, True, 2, max_iters=7, start_iter=3))
    assert len(full) == 7 and len(tail) == 4
    for a, b in zip(full[3:], tail):
        for k in ("images", "sizes", "boxes", "labels", "mask"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
