"""Numeric parity against the actual torch reference, run side-by-side on CPU.

The strongest available stand-in for the published 42.3 mAP@50 target
(reference README.md:71) without datasets or released weights: build the
reference model (pure PyTorch via ``reference_harness``), convert its live
weights through this repo's checkpoint converter, push identical inputs
through both stacks, and assert stage-by-stage agreement:

  * VGG16+FPN feature maps        (fcos_core/modeling/backbone/{vgg16,fpn}.py)
  * condgraph inference: conded kernels, act maps, post-processed features
                                  (fcos_core/modeling/rpn/fcos/condgraph.py)
  * FCOS head outputs             (fcos_core/modeling/rpn/fcos/fcos.py:90-114)
  * decoded boxes under all three TEST.MODEs
                                  (fcos_core/modeling/rpn/fcos/inference.py)
  * source-pass losses + prototype EMA
                                  (condgraph.py:423-463, loss.py:151-236)
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_harness import (
    build_ref_modules,
    checkpoint_dict,
    make_boxlist,
    ref_cfg,
    to_image_list,
)
from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.detector import build_detector
from scan_tpu.utils.checkpoint import Checkpointer

C2F_YAML = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)
REF_YAML = "/root/reference/configs/scan/scan_vgg16_cityscapace_to_foggy.yaml"

H, W = 128, 160
BATCH = 2

pytestmark = pytest.mark.slow


def _disable_dropout(modules):
    for m in modules.values():
        for sub in m.modules():
            if isinstance(sub, torch.nn.Dropout):
                sub.p = 0.0


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    """(ref modules, my detector, my params, my proto_state, images)."""
    tmp = tmp_path_factory.mktemp("parity")
    cfg_ref = ref_cfg(REF_YAML)
    mods = build_ref_modules(cfg_ref, seed=0)
    _disable_dropout(mods)
    # non-trivial prototype so conded kernels/act maps are informative
    g = torch.Generator().manual_seed(7)
    mh = mods["middle_head"]
    mh.prototype.data = torch.randn(mh.prototype.shape, generator=g) * 0.5

    ckpt_path = str(tmp / "ref_weights.pth")
    torch.save(checkpoint_dict(mods), ckpt_path)

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F_YAML)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_BOXES = 8
    det = build_detector(cfg)

    import jax

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    params, proto_state = det.init_params(rng, sample)
    ckptr = Checkpointer(str(tmp / "ckpt"), det)
    params, proto_state = ckptr._load_torch(ckpt_path, params, proto_state, True)

    rs = np.random.RandomState(3)
    images = rs.randn(BATCH, H, W, 3).astype(np.float32) * 20.0
    return mods, det, params, proto_state, images


def _t_images(images):
    return torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))


def _close(mine, ref_nchw, tol, what):
    """mine: jax NHWC; ref: torch NCHW."""
    a = np.asarray(mine)
    b = ref_nchw.detach().numpy().transpose(0, 2, 3, 1)
    scale = max(np.abs(b).max(), 1e-3)
    diff = np.abs(a - b).max() / scale
    assert diff < tol, f"{what}: rel diff {diff:.2e} (tol {tol:.0e})"


def test_backbone_fpn_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
    my_feats = det.backbone.apply(params["backbone"], jnp.asarray(images))
    assert len(my_feats) == len(ref_feats) == 5
    for lvl, (a, b) in enumerate(zip(my_feats, ref_feats)):
        _close(a, b, 2e-4, f"FPN P{lvl + 3}")


def test_condgraph_inference_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
    my_feats = list(det.backbone.apply(params["backbone"], jnp.asarray(images)))
    my_out, _, my_maps, _ = det.middle_head.apply(
        params["middle_head"], my_feats, proto_state, "inference"
    )
    for lvl, (a, b) in enumerate(zip(my_maps, ref_maps)):
        _close(a, b, 1e-4, f"act map P{lvl + 3}")
    for lvl, (a, b) in enumerate(zip(my_out, ref_out)):
        _close(a, b, 5e-4, f"condgraph features P{lvl + 3}")


def test_fcos_head_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
        mods["fcos"].head.mode = "common"  # compute the cls tower
        logits_r, reg_r, ctr_r = mods["fcos"].head(ref_out)
    my_feats = list(det.backbone.apply(params["backbone"], jnp.asarray(images)))
    my_out, _, my_maps, _ = det.middle_head.apply(
        params["middle_head"], my_feats, proto_state, "inference"
    )
    logits, reg, ctr = det.fcos_head.apply(params["fcos"], my_out, True)
    for lvl in range(5):
        _close(logits[lvl], logits_r[lvl], 5e-4, f"cls logits P{lvl + 3}")
        _close(reg[lvl], reg_r[lvl], 5e-3, f"bbox reg P{lvl + 3}")
        _close(ctr[lvl], ctr_r[lvl], 5e-4, f"centerness P{lvl + 3}")


@pytest.mark.parametrize("mode", ["common", "precision", "light"])
def test_boxes_parity(stacks, mode):
    """Final decoded boxes match under every TEST.MODE
    (reference fcos.py:163-172 mixing + inference.py decode/NMS)."""
    import dataclasses

    mods, det, params, proto_state, images = stacks
    mods["fcos"].mode = mode
    mods["fcos"].head.mode = mode
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
        ref_boxes, _, _ = mods["fcos"](il, ref_out, act_maps=ref_maps)

    det.test_mode = mode
    sizes = jnp.asarray([[H, W]] * BATCH, jnp.int32)
    out = det.forward_inference(
        params, proto_state, jnp.asarray(images), sizes
    )

    for b in range(BATCH):
        rb = ref_boxes[b]
        r_boxes = rb.bbox.numpy()
        r_scores = rb.get_field("scores").numpy()
        r_labels = rb.get_field("labels").numpy()
        valid = np.asarray(out["valid"][b])
        m_boxes = np.asarray(out["boxes"][b])[valid]
        m_scores = np.asarray(out["scores"][b])[valid]
        m_labels = np.asarray(out["labels"][b])[valid]
        assert len(m_boxes) == len(r_boxes), (
            f"mode={mode} img{b}: {len(m_boxes)} boxes vs ref {len(r_boxes)}"
        )
        # order-insensitive match: greedily pair each ref det to a mine det
        used = np.zeros(len(m_boxes), bool)
        for i in range(len(r_boxes)):
            d_box = np.abs(m_boxes - r_boxes[i]).max(axis=1)
            d_scr = np.abs(m_scores - r_scores[i])
            ok = (d_box < 1e-2) & (d_scr < 1e-3) & (m_labels == r_labels[i]) & ~used
            j = int(np.argmax(ok))
            assert ok.any(), (
                f"mode={mode} img{b}: no match for ref det {i} "
                f"(box {r_boxes[i]}, score {r_scores[i]:.4f}, "
                f"label {r_labels[i]})"
            )
            used[j] = True
