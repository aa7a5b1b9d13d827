"""Full-pipeline mAP A/B against the torch reference.

Both stacks run END-TO-END on the same synthetic COCO set with identical
converted weights: PIL image -> resize policy -> BGR255 normalize -> pad ->
backbone -> condgraph -> FCOS -> postprocess -> COCO evaluation; the final
AP numbers must agree in all three TEST.MODEs. This covers the composite
(data pipeline x model x postprocess x evaluator) where stage-level parity
tests can't see silent mAP killers (reference engine/inference.py:62 ->
evaluation/coco/coco_eval.py:13).

The reference's own COCODataset/pycocotools are unavailable here, so its
side feeds PIL images through the REFERENCE transforms
(fcos_core/data/transforms/transforms.py) and its model/postprocess, and
both stacks' predictions are scored by scan_tpu's COCOeval-protocol
implementation (itself behaviourally tested in tests/test_coco_eval.py).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scan_tpu.config import get_default_cfg  # noqa: E402
from scan_tpu.data.build import DetectionLoader  # noqa: E402
from scan_tpu.data.datasets.coco import COCODataset  # noqa: E402
from scan_tpu.engine.inference import (  # noqa: E402
    compute_predictions, evaluate_dataset,
)
from scan_tpu.modeling.detector import build_detector  # noqa: E402
from scan_tpu.utils.checkpoint import Checkpointer  # noqa: E402

from tests.reference_harness import (  # noqa: E402
    REF_ROOT, build_ref_modules, checkpoint_dict, ref_cfg, to_image_list,
)
from tests.test_e2e_train import make_synth_coco  # noqa: E402

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)
REF_YAML = os.path.join(REF_ROOT, "configs", "scan",
                        "scan_vgg16_cityscapace_to_foggy.yaml")

MIN_TEST, MAX_TEST = 96, 128


def _drawn_synth_coco(root, n_images=12, seed=0):
    """Synthetic set whose images contain bright rectangles at the GT boxes
    so an untrained-but-shared-weights model yields structured scores."""
    from PIL import Image, ImageDraw

    ann, img_dir = make_synth_coco(root, n_images=n_images, hw=(120, 160),
                                   seed=seed)
    import json

    with open(ann) as f:
        d = json.load(f)
    anns_by_img = {}
    for a in d["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)
    for im in d["images"]:
        p = os.path.join(img_dir, im["file_name"])
        img = Image.open(p).convert("RGB")
        dr = ImageDraw.Draw(img)
        for a in anns_by_img.get(im["id"], []):
            x, y, w, h = a["bbox"]
            color = tuple(int(c) for c in
                          np.random.RandomState(a["id"]).randint(128, 255, 3))
            dr.rectangle([x, y, x + w, y + h], fill=color)
        img.save(p)
    return ann, img_dir


def _ref_predictions(mods, cfg_ref, dataset, mode):
    """Reference stack end-to-end: PIL -> reference transforms -> pad ->
    model -> postprocess -> boxes in ORIGINAL image coordinates."""
    from PIL import Image

    from fcos_core.data.transforms import build_transforms
    from fcos_core.structures.bounding_box import BoxList

    tr = build_transforms(cfg_ref, is_train=False)
    mods["fcos"].mode = mode
    mods["fcos"].head.mode = mode
    # the post-processor holds its own mode copy (reference
    # inference.py:52,68: 'common' applies sigmoid there)
    mods["fcos"].box_selector_test.mode = mode
    preds = {}
    for index in range(len(dataset)):
        info = dataset.get_img_info(index)
        img = Image.open(
            os.path.join(dataset.root, info["file_name"])
        ).convert("RGB")
        dummy = BoxList(torch.zeros((0, 4)), img.size, mode="xyxy")
        img_t, _ = tr(img, dummy)
        with torch.no_grad():
            il = to_image_list([img_t], 32)
            feats = mods["backbone"](il.tensors)
            feats, _, _, act_maps = mods["middle_head"](
                il, feats, mode="inference"
            )
            boxlists, _, _ = mods["fcos"](il, feats, act_maps=act_maps)
        bl = boxlists[0].resize((info["width"], info["height"]))
        preds[index] = dict(
            boxes=bl.bbox.numpy(),
            scores=bl.get_field("scores").numpy(),
            labels=bl.get_field("labels").numpy().astype(np.int32),
        )
    return preds


@pytest.fixture(scope="module")
def ab_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("map_ab")
    ann, img_dir = _drawn_synth_coco(str(tmp / "ds"))

    cfg_ref = ref_cfg(REF_YAML, opts=[
        "INPUT.MIN_SIZE_TEST", str(MIN_TEST),
        "INPUT.MAX_SIZE_TEST", str(MAX_TEST),
        # untrained weights score low; drop the pre-NMS threshold so the
        # 'common' mode emits detections too (identically on both stacks)
        "MODEL.FCOS.INFERENCE_TH", "0.002",
    ])
    mods = build_ref_modules(cfg_ref, seed=0)
    g = torch.Generator().manual_seed(7)
    mh = mods["middle_head"]
    mh.prototype.data = torch.randn(mh.prototype.shape, generator=g) * 0.5
    mh.multihead_attn.layer_norm.bias.data = (
        torch.randn(256, generator=g) * 0.05
    )
    ckpt_path = str(tmp / "ref_weights.pth")
    torch.save(checkpoint_dict(mods), ckpt_path)

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.INPUT.MIN_SIZE_TEST = MIN_TEST
    cfg.INPUT.MAX_SIZE_TEST = MAX_TEST
    cfg.MODEL.FCOS.INFERENCE_TH = 0.002
    cfg.TEST.IMS_PER_BATCH = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.LOADER_THREADS = 1
    det = build_detector(cfg)

    dataset = COCODataset(ann, img_dir,
                          remove_images_without_annotations=False)
    loader = DetectionLoader(dataset, cfg, is_train=False, batch_size=4,
                             num_threads=1)
    H, W = loader.bucket_hw
    params, proto = det.init_params(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    ckptr = Checkpointer(str(tmp / "ckpt"), det)
    params, proto = ckptr._load_torch(ckpt_path, params, proto, True)
    return mods, cfg_ref, det, params, proto, dataset, loader


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["common", "precision", "light"])
def test_full_pipeline_map_matches_reference(ab_setup, mode):
    mods, cfg_ref, det, params, proto, dataset, loader = ab_setup

    det.test_mode = mode
    mine = compute_predictions(det, params, proto, loader, progress_every=0)
    res_mine = evaluate_dataset(dataset, mine)

    ref = _ref_predictions(mods, cfg_ref, dataset, mode)
    res_ref = evaluate_dataset(dataset, ref)

    # both stacks detect SOMETHING (guard against a trivially-empty pass)
    assert sum(len(p["scores"]) for p in ref.values()) > 0
    assert sum(len(p["scores"]) for p in mine.values()) > 0
    for metric in ("AP", "AP50", "AP75"):
        assert abs(res_mine[metric] - res_ref[metric]) <= 1e-3, (
            f"mode={mode} {metric}: mine={res_mine[metric]:.4f} "
            f"ref={res_ref[metric]:.4f}"
        )
