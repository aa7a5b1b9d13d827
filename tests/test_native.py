"""Native C++ component tests: builds the library and checks numeric parity
against the pure-Python (PIL/numpy) fallbacks."""

import numpy as np
import pytest

from scan_tpu import native
from scan_tpu.data.transforms import Preprocessor


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_native_preprocess_matches_pil(lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), dtype=np.uint8)
    mean = [102.9801, 115.9465, 122.7717]
    pre = Preprocessor([24], 40, mean, [1, 1, 1], to_bgr255=True)

    # PIL reference path
    want, _, (oh, ow) = pre(img, None)

    out = np.zeros((32, 64, 3), np.float32)
    ok = native.preprocess_image(img, out, oh, ow, mean, [1, 1, 1], True)
    assert ok
    got = out[:oh, :ow]
    # PIL uses fixed-point taps; allow ~1 intensity step of tolerance
    assert np.abs(got - want).max() <= 1.5
    assert np.abs(got - want).mean() < 0.3
    # padding stays zero
    assert np.all(out[oh:] == 0) and np.all(out[:, ow:] == 0)


def test_native_preprocess_identity_size(lib):
    img = np.full((16, 16, 3), 100, np.uint8)
    img[:, :, 0] = 200
    out = np.zeros((16, 16, 3), np.float32)
    ok = native.preprocess_image(
        img, out, 16, 16, [10.0, 20.0, 30.0], [1, 1, 1], True
    )
    assert ok
    # BGR swap: channel 0 = B(100) - 10
    np.testing.assert_allclose(out[0, 0], [90.0, 80.0, 170.0])


def test_native_nms_matches_oracle(lib):
    rng = np.random.RandomState(1)
    n = 100
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 50, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    keep = native.nms_cpu(boxes, scores, 0.5)

    import jax.numpy as jnp

    from scan_tpu.ops.nms import nms

    want = np.asarray(
        nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5)
    )
    np.testing.assert_array_equal(keep, want)


def test_native_iou_matrix(lib):
    det = np.asarray([[0, 0, 10, 10], [5, 5, 10, 10]], np.float32)
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    out = native.iou_matrix_xywh(det, gt, np.zeros(1, np.uint8))
    np.testing.assert_allclose(out[0, 0], 1.0)
    np.testing.assert_allclose(out[1, 0], 25.0 / 175.0, rtol=1e-6)
    # crowd: union = det area
    out_c = native.iou_matrix_xywh(det, gt, np.ones(1, np.uint8))
    np.testing.assert_allclose(out_c[1, 0], 25.0 / 100.0, rtol=1e-6)


def test_loader_native_path_consistency():
    """into_buffer (native or fallback) must agree with the legacy __call__
    path on boxes and sizes."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    boxes = np.asarray([[4.0, 6, 30, 40]], np.float32)
    mean = [102.9801, 115.9465, 122.7717]
    pre1 = Preprocessor([48], 80, mean, [1, 1, 1], flip_prob=0.0, seed=5)
    pre2 = Preprocessor([48], 80, mean, [1, 1, 1], flip_prob=0.0, seed=5)
    want_img, want_boxes, (oh, ow) = pre1(img, boxes.copy())
    out = np.zeros((64, 96, 3), np.float32)
    got_boxes, (oh2, ow2) = pre2.into_buffer(img, boxes.copy(), out)
    assert (oh, ow) == (oh2, ow2)
    np.testing.assert_allclose(got_boxes, want_boxes)
    assert np.abs(out[:oh, :ow] - want_img).max() <= 1.5


def test_device_normalize_parity():
    """uint8 loader path + on-device normalization must equal the host f32
    normalized path (to resize rounding)."""
    import jax.numpy as jnp

    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.detector import build_detector

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (1, 32, 48, 3), dtype=np.uint8)

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.CONV_BODY = "VGG-16-FPN-RETINANET"
    cfg.MODEL.RETINANET.USE_C5 = False
    cfg.MODEL.DA_ON = False
    det = build_detector(cfg)

    got = np.asarray(det._prep_images(jnp.asarray(img)))
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
    want = img[..., ::-1].astype(np.float32) - mean
    np.testing.assert_allclose(got, want, atol=1e-4)

    # float input passes through untouched
    f = jnp.asarray(want)
    np.testing.assert_allclose(np.asarray(det._prep_images(f)), want)


def test_native_resize_u8_matches_pil(lib):
    """BIT-exact vs PIL: the native resize IS Pillow's fixed-point 8bpc
    algorithm (Resample.c: 1<<22 coefficients, int32 accumulation, u8
    intermediate between passes) — down/up/identity scales all match."""
    from PIL import Image

    rng = np.random.RandomState(8)
    for (ih, iw), (oh, ow) in [
        ((40, 56), (24, 36)),      # downscale
        ((40, 56), (64, 80)),      # upscale
        ((40, 56), (40, 56)),      # identity
        ((37, 53), (29, 41)),      # odd sizes
    ]:
        img = rng.randint(0, 256, (ih, iw, 3), dtype=np.uint8)
        out = np.zeros((oh + 8, ow + 16, 3), np.uint8)
        ok = native.resize_image_u8(img, out, oh, ow)
        assert ok
        want = np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
        )
        diff = np.abs(out[:oh, :ow].astype(int) - want.astype(int))
        assert diff.max() == 0, ((ih, iw), (oh, ow), diff.max())
        assert np.all(out[oh:] == 0)


def test_native_preprocess_bitexact_vs_pil_then_normalize(lib):
    """The fused f32 path = PIL-exact u8 resize then affine normalize —
    the reference's own order (PIL resize returns u8, torchvision
    normalizes after; transforms.py:70-90)."""
    from PIL import Image

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (50, 70, 3), dtype=np.uint8)
    mean = np.array([102.98, 115.95, 122.77], np.float32)
    std = np.ones(3, np.float32)
    out = np.zeros((40, 64, 3), np.float32)
    ok = native.preprocess_image(img, out, 36, 50, mean, std, True)
    assert ok
    res = np.asarray(
        Image.fromarray(img).resize((50, 36), Image.BILINEAR)
    ).astype(np.float32)
    want = res[:, :, ::-1] - mean  # BGR255, std 1
    np.testing.assert_array_equal(out[:36, :50], want)
    assert np.all(out[36:] == 0)


def test_eval_loader_decode_once_cache():
    """Second iteration of an eval loader serves from the decode-once
    cache: identical batches, zero further load_image calls."""
    import json as _json
    import tempfile

    from PIL import Image

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import DetectionLoader
    from scan_tpu.data.datasets.coco import COCODataset

    rng = np.random.RandomState(3)
    with tempfile.TemporaryDirectory() as root:
        images, annotations = [], []
        for i in range(1, 7):
            arr = rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
            Image.fromarray(arr).save(f"{root}/img{i}.png")
            images.append(dict(id=i, file_name=f"img{i}.png",
                               height=64, width=96))
            annotations.append(dict(id=i, image_id=i, category_id=1,
                                    bbox=[4, 4, 30, 20], area=600,
                                    iscrowd=0))
        ann = f"{root}/ann.json"
        with open(ann, "w") as f:
            _json.dump(dict(images=images, annotations=annotations,
                            categories=[dict(id=1, name="car")]), f)
        cfg = get_default_cfg()
        cfg.INPUT.MIN_SIZE_TEST = 48
        cfg.INPUT.MAX_SIZE_TEST = 80
        cfg.TPU.MAX_BOXES = 4
        cfg.TPU.EVAL_CACHE_MB = 64
        ds = COCODataset(ann, root, remove_images_without_annotations=False)
        calls = [0]
        orig = ds.load_image
        ds.load_image = lambda i: (calls.__setitem__(0, calls[0] + 1),
                                   orig(i))[1]
        loader = DetectionLoader(ds, cfg, False, 2, num_threads=1)
        first = [{k: v.copy() for k, v in b.items()} for b in loader]
        n_cold = calls[0]
        assert n_cold == 6
        second = list(loader)
        assert calls[0] == n_cold, "cache missed: load_image re-called"
        for b1, b2 in zip(first, second):
            for k in b1:
                np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)
