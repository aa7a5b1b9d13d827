"""VOC-XML dataset parsers (Sim10k/KITTI/PascalVOC) on synthetic fixtures,
plus the keypoint RoI head."""

import os

import numpy as np
import pytest
from PIL import Image

from scan_tpu.data.datasets.voc_xml import (
    KittiDataset,
    PascalVOCDataset,
    Sim10kDataset,
)

XML_TMPL = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>"""
OBJ_TMPL = """<object>
    <name>{name}</name>
    <difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_voc_tree(root, ids, ext=".jpg", objects_per_id=None):
    os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    for img_id in ids:
        objs = objects_per_id[img_id]
        xml = XML_TMPL.format(
            w=100, h=80,
            objects="".join(OBJ_TMPL.format(**o) for o in objs),
        )
        with open(os.path.join(root, "Annotations", img_id + ".xml"), "w") as f:
            f.write(xml)
        arr = np.zeros((80, 100, 3), np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "JPEGImages", img_id + ext)
        )
    with open(os.path.join(root, "ImageSets", "Main", "split.txt"), "w") as f:
        f.write("\n".join(ids))


def test_sim10k_car_only(tmp_path):
    objs = {
        "a": [
            dict(name="car", diff=0, x1=10, y1=10, x2=50, y2=40),
            dict(name="person", diff=0, x1=1, y1=1, x2=20, y2=20),
            dict(name="car", diff=1, x1=5, y1=5, x2=25, y2=25),
        ]
    }
    make_voc_tree(str(tmp_path), ["a"], objects_per_id=objs)
    ds = Sim10kDataset(str(tmp_path), "split")
    assert len(ds) == 1
    boxes, labels = ds.get_raw_target(0)
    # person filtered (car-only), difficult car filtered
    assert boxes.shape == (1, 4)
    np.testing.assert_allclose(boxes[0], [9, 9, 49, 39])  # 0-based
    assert labels.tolist() == [1]
    assert ds.load_image(0).shape == (80, 100, 3)
    assert ds.get_img_info(0) == {"height": 80, "width": 100}


def test_kitti_png(tmp_path):
    objs = {"k": [dict(name="car", diff=0, x1=2, y1=2, x2=30, y2=30)]}
    make_voc_tree(str(tmp_path), ["k"], ext=".png", objects_per_id=objs)
    ds = KittiDataset(str(tmp_path), "split")
    assert ds.load_image(0).shape == (80, 100, 3)
    boxes, labels = ds.get_raw_target(0)
    assert labels.tolist() == [1]


def test_pascal_voc_multiclass_and_difficult(tmp_path):
    objs = {
        "p": [
            dict(name="dog", diff=0, x1=10, y1=10, x2=40, y2=40),
            dict(name="cat", diff=1, x1=1, y1=1, x2=20, y2=20),
        ]
    }
    make_voc_tree(str(tmp_path), ["p"], objects_per_id=objs)
    ds = PascalVOCDataset(str(tmp_path), "split", use_difficult=True)
    boxes, labels = ds.get_raw_target(0)
    assert len(labels) == 2
    assert PascalVOCDataset.CLASSES[labels[0]] == "dog"
    b, l, difficult, (h, w) = ds.get_groundtruth(0)
    assert difficult.tolist() == [False, True]
    ds2 = PascalVOCDataset(str(tmp_path), "split", use_difficult=False)
    _, labels2 = ds2.get_raw_target(0)
    assert len(labels2) == 1


def test_keypoint_head():
    import jax
    import jax.numpy as jnp

    from scan_tpu.modeling.roi_heads import (
        RoIKeypointConfig,
        RoIKeypointHead,
        roi_keypoint_loss,
    )

    cfg = RoIKeypointConfig(num_keypoints=17, pooler_resolution=7,
                            conv_layers=(32, 32))
    head = RoIKeypointHead(cfg)
    pooled = jnp.zeros((2, 7, 7, 16))
    params = head.init(jax.random.PRNGKey(0), pooled)
    hm = head.apply(params, pooled)
    assert hm.shape == (2, 28, 28, 17)
    tgt = jnp.zeros((2, 17), jnp.int32)
    vis = jnp.zeros((2, 17), bool).at[0, :5].set(True)
    loss = roi_keypoint_loss(hm, tgt, vis)
    assert np.isfinite(float(loss))
