"""Chained inference (detector.forward_inference_multi + TPU.INFER_CHAIN):
stacking k batches into one dispatch must be a pure scheduling change —
outputs identical to per-batch forward_inference, and compute_predictions
must return identical predictions with chaining on/off (including a short
tail that falls back to per-batch dispatch)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.detector import build_detector

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.TPU.MAX_NODES = 16
    cfg.TPU.MAX_TARGET_POINTS = 16
    cfg.TPU.VGG_WIDTH_DIV = 4
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.MODEL.FCOS.NUM_CONVS_REG = 1
    cfg.MODEL.FCOS.NUM_CONVS_CLS = 1
    return cfg


def test_forward_inference_multi_matches_per_batch():
    cfg = tiny_cfg()
    det = build_detector(cfg)
    b, h, w, k = 2, 64, 96, 3
    params, proto = det.init_params(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32)
    )
    rng = np.random.RandomState(0)
    stack = jnp.asarray(rng.randint(0, 255, (k, b, h, w, 3), np.uint8))
    sizes = jnp.asarray(np.tile([[h, w]], (k, b, 1)), jnp.int32)

    fwd1 = jax.jit(lambda im, sz: det.forward_inference(params, proto, im, sz))
    fwdk = jax.jit(
        lambda im, sz: det.forward_inference_multi(params, proto, im, sz)
    )
    outk = jax.device_get(fwdk(stack, sizes))
    for i in range(k):
        out1 = jax.device_get(fwd1(stack[i], sizes[i]))
        for key in out1:
            np.testing.assert_array_equal(
                np.asarray(out1[key]), np.asarray(outk[key][i]), err_msg=key
            )


def test_compute_predictions_chain_equivalence(tmp_path):
    from scan_tpu.data.build import DetectionLoader
    from scan_tpu.data.datasets.coco import COCODataset
    from scan_tpu.engine.inference import compute_predictions

    from tests.test_e2e_train import make_synth_coco

    cfg = tiny_cfg()
    # 5 images at batch 2 -> two chained groups of... chain=2 gives 2 full
    # groups + a 1-batch tail exercising the per-batch fallback
    ann, img_dir = make_synth_coco(str(tmp_path / "ds"), n_images=5,
                                   hw=(64, 96), seed=3)
    ds = COCODataset(ann, img_dir)
    det = build_detector(cfg)
    loader = DetectionLoader(ds, cfg, False, 2, num_threads=1)
    h, w = loader.bucket_hw
    params, proto = det.init_params(
        jax.random.PRNGKey(1), jnp.zeros((1, h, w, 3), jnp.float32)
    )

    det.cfg.TPU.INFER_CHAIN = 1
    preds_1 = compute_predictions(det, params, proto, loader,
                                  progress_every=0)
    det.cfg.TPU.INFER_CHAIN = 2
    preds_2 = compute_predictions(det, params, proto, loader,
                                  progress_every=0)
    assert set(preds_1) == set(preds_2) and len(preds_1) == 5
    for idx in preds_1:
        for key in ("boxes", "scores", "labels"):
            np.testing.assert_array_equal(
                preds_1[idx][key], preds_2[idx][key],
                err_msg=f"img {idx} {key}",
            )
