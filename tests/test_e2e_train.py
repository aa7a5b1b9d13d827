"""End-to-end DA training integration: synthetic source/target COCO
datasets -> loaders -> fused DA step -> in-training validation ->
checkpoint save/restore round-trip."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from scan_tpu.config import get_default_cfg
from scan_tpu.data.build import DetectionLoader
from scan_tpu.data.datasets.coco import COCODataset
from scan_tpu.engine.train_step import make_da_train_step
from scan_tpu.engine.trainer import do_train_da
from scan_tpu.modeling.detector import build_detector
from scan_tpu.solver.build import make_optimizer
from scan_tpu.utils.checkpoint import Checkpointer

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)


def make_synth_coco(root, n_images=4, hw=(96, 128), n_cats=8, seed=0):
    os.makedirs(root, exist_ok=True)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(1, n_images + 1):
        h, w = hw
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"img{i}.png"))
        images.append(dict(id=i, file_name=f"img{i}.png", height=h, width=w))
        for b in range(2):
            x, y = int(rng.randint(0, w // 2)), int(rng.randint(0, h // 2))
            bw, bh = int(rng.randint(16, w // 2)), int(rng.randint(16, h // 2))
            annotations.append(
                dict(id=ann_id, image_id=i,
                     category_id=int(rng.randint(1, n_cats + 1)),
                     bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0)
            )
            ann_id += 1
    cats = [dict(id=c, name=f"cat{c}") for c in range(1, n_cats + 1)]
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return ann, img_dir


@pytest.mark.slow
def test_e2e_da_training(tmp_path):
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.INPUT.MIN_SIZE_RANGE_TRAIN = (-1, -1)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.VAL_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.SOLVER.INITIAL_AP50 = 0  # forward_target on from the start... but
    # ap50_emp starts at 0 which is NOT > 0, so first iters run gated off.
    cfg.TPU.MAX_NODES = 64
    cfg.TPU.MAX_TARGET_POINTS = 64
    cfg.TPU.MAX_BOXES = 10
    cfg.TPU.LOADER_THREADS = 2
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    ann_s, img_s = make_synth_coco(str(tmp_path / "src"), seed=0)
    ann_t, img_t = make_synth_coco(str(tmp_path / "tgt"), seed=1)

    ds_s = COCODataset(ann_s, img_s, remove_images_without_annotations=True)
    ds_t = COCODataset(ann_t, img_t, remove_images_without_annotations=True)
    loader_s = DetectionLoader(ds_s, cfg, True, 2, max_iters=4, num_threads=2)
    loader_t = DetectionLoader(ds_t, cfg, True, 2, max_iters=4, num_threads=2)
    loader_val = DetectionLoader(ds_t, cfg, False, 2, num_threads=2)

    detector = build_detector(cfg)
    H, W = loader_s.bucket_hw
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params, proto = detector.init_params(jax.random.PRNGKey(0), sample)
    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    ckpt = Checkpointer(cfg.OUTPUT_DIR, detector)
    step = make_da_train_step(detector, optimizer)

    params, opt_state, proto, best = do_train_da(
        cfg, detector, step, params, opt_state, proto,
        loader_s, loader_t, loader_val, ckpt, start_iter=0,
    )
    # validation happened and training finished
    assert best >= 0
    assert ckpt.has_checkpoint()

    # restore round-trip
    params2, proto2 = detector.init_params(jax.random.PRNGKey(7), sample)
    opt2 = optimizer.init(params2)
    params2, proto2, opt2, it = ckpt.load("", params2, proto2, opt2)
    assert it == cfg.SOLVER.MAX_ITER
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(proto.prototype), np.asarray(proto2.prototype)
    )


@pytest.mark.slow
def test_resume_continuation_equivalence(tmp_path):
    """Kill/resume must be invisible: 4 straight iterations == 2
    iterations + checkpoint + restore + 2 more (params, opt state and
    prototypes all exactly equal). Relies on the loader's start_iter
    skip and the (seed, iteration, slot)-keyed transform draws.
    Reference: fcos_core checkpoint 'arguments' resume,
    engine/trainer.py:146 + data/build.py make_data_loader(start_iter)."""
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.INPUT.MIN_SIZE_RANGE_TRAIN = (-1, -1)
    cfg.INPUT.MIN_SIZE_TRAIN = (96,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.VAL_ITER = 100  # no in-loop val: gate stays off either way
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.TPU.MAX_NODES = 64
    cfg.TPU.MAX_TARGET_POINTS = 64
    cfg.TPU.MAX_BOXES = 10
    cfg.TPU.LOADER_THREADS = 2

    ann_s, img_s = make_synth_coco(str(tmp_path / "src"), seed=0)
    ann_t, img_t = make_synth_coco(str(tmp_path / "tgt"), seed=1)
    ds_s = COCODataset(ann_s, img_s, remove_images_without_annotations=True)
    ds_t = COCODataset(ann_t, img_t, remove_images_without_annotations=True)

    detector = build_detector(cfg)
    sample_loader = DetectionLoader(ds_s, cfg, True, 2, max_iters=1)
    H, W = sample_loader.bucket_hw
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    optimizer = None
    step = None

    def run(max_iter, start_iter, params, opt_state, proto, ckpt):
        nonlocal optimizer, step
        cfg.SOLVER.MAX_ITER = max_iter
        ls = DetectionLoader(ds_s, cfg, True, 2, max_iters=max_iter,
                             start_iter=start_iter)
        lt = DetectionLoader(ds_t, cfg, True, 2, max_iters=max_iter,
                             start_iter=start_iter, seed=1235)
        return do_train_da(
            cfg, detector, step, params, opt_state, proto,
            ls, lt, None, ckpt, start_iter=start_iter,
        )

    # straight 4-iteration run
    cfg.OUTPUT_DIR = str(tmp_path / "straight")
    params0, proto0 = detector.init_params(jax.random.PRNGKey(0), sample)
    optimizer = make_optimizer(cfg, params0)
    step = make_da_train_step(detector, optimizer)
    opt0 = optimizer.init(params0)
    ckpt_a = Checkpointer(cfg.OUTPUT_DIR, detector)
    p_a, o_a, pr_a, _ = run(4, 0, params0, opt0, proto0, ckpt_a)

    # interrupted run: 2 iters, drop state, restore, 2 more
    cfg.OUTPUT_DIR = str(tmp_path / "resumed")
    ckpt_b = Checkpointer(cfg.OUTPUT_DIR, detector)
    run(2, 0, params0, opt0, proto0, ckpt_b)
    params_r, proto_r = detector.init_params(jax.random.PRNGKey(9), sample)
    opt_r = optimizer.init(params_r)
    params_r, proto_r, opt_r, it = ckpt_b.load("", params_r, proto_r, opt_r)
    assert it == 2
    p_b, o_b, pr_b, _ = run(4, it, params_r, opt_r, proto_r, ckpt_b)

    for a, b in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(o_a),
                    jax.tree_util.tree_leaves(o_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(pr_a.prototype), np.asarray(pr_b.prototype)
    )
