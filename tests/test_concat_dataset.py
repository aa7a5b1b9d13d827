"""ConcatDataset + multi-name dataset lists in the loader builders.

Parity target: reference ``fcos_core/data/datasets/concat_dataset.py:7-23``
and ``fcos_core/data/build.py:32-54`` (every name in a DATASETS tuple is
built and concatenated for training; test names stay separate).
"""

import numpy as np
import pytest

from scan_tpu.data.datasets.concat import ConcatDataset
from tests.test_voc_datasets import make_voc_tree


def _mk(root, ids):
    objs = {
        i: [dict(name="car", diff=0, x1=10, y1=10, x2=50, y2=40)] for i in ids
    }
    make_voc_tree(str(root), ids, objects_per_id=objs)


def test_concat_index_mapping(tmp_path):
    from scan_tpu.data.datasets.voc_xml import Sim10kDataset

    a_root, b_root = tmp_path / "a", tmp_path / "b"
    _mk(a_root, ["a0", "a1"])
    _mk(b_root, ["b0", "b1", "b2"])
    a = Sim10kDataset(str(a_root), "split")
    b = Sim10kDataset(str(b_root), "split")
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    assert cat.get_idxs(0) == (0, 0)
    assert cat.get_idxs(1) == (0, 1)
    assert cat.get_idxs(2) == (1, 0)
    assert cat.get_idxs(4) == (1, 2)
    with pytest.raises(IndexError):
        cat.get_idxs(5)
    # delegation
    assert cat.get_img_info(3) == b.get_img_info(1)
    boxes, labels = cat.get_raw_target(2)
    b_boxes, b_labels = b.get_raw_target(0)
    np.testing.assert_array_equal(boxes, b_boxes)
    assert cat.load_image(0).shape == (80, 100, 3)
    assert cat.class_names() == a.class_names()


def test_source_loader_draws_from_both_datasets(tmp_path, monkeypatch):
    from scan_tpu.config import get_default_cfg
    from scan_tpu.config.paths_catalog import DatasetCatalog
    from scan_tpu.data.build import make_data_loader_source

    a_root, b_root = tmp_path / "a", tmp_path / "b"
    _mk(a_root, ["a0", "a1"])
    _mk(b_root, ["b0", "b1"])
    monkeypatch.setitem(
        DatasetCatalog.DATASETS, "sim10k_synth_a",
        {"data_dir": str(a_root), "split": "split"},
    )
    monkeypatch.setitem(
        DatasetCatalog.DATASETS, "sim10k_synth_b",
        {"data_dir": str(b_root), "split": "split"},
    )

    cfg = get_default_cfg()
    cfg.DATASETS.TRAIN_SOURCE = ("sim10k_synth_a", "sim10k_synth_b")
    cfg.INPUT.MIN_SIZE_TRAIN = (80,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 8
    cfg.TPU.LOADER_THREADS = 2
    cfg.freeze()

    loader = make_data_loader_source(cfg)
    assert isinstance(loader.dataset, ConcatDataset)
    assert len(loader.dataset) == 4

    seen_datasets = set()
    for batch in loader:
        for idx in batch["indices"]:
            if idx >= 0:
                seen_datasets.add(loader.dataset.get_idxs(int(idx))[0])
    assert seen_datasets == {0, 1}


def test_test_loaders_stay_separate(tmp_path, monkeypatch):
    from scan_tpu.config import get_default_cfg
    from scan_tpu.config.paths_catalog import DatasetCatalog
    from scan_tpu.data.build import make_data_loaders_test

    a_root, b_root = tmp_path / "a", tmp_path / "b"
    _mk(a_root, ["a0"])
    _mk(b_root, ["b0", "b1"])
    monkeypatch.setitem(
        DatasetCatalog.DATASETS, "sim10k_synth_ta",
        {"data_dir": str(a_root), "split": "split"},
    )
    monkeypatch.setitem(
        DatasetCatalog.DATASETS, "sim10k_synth_tb",
        {"data_dir": str(b_root), "split": "split"},
    )
    cfg = get_default_cfg()
    cfg.DATASETS.TEST = ("sim10k_synth_ta", "sim10k_synth_tb")
    cfg.INPUT.MIN_SIZE_TEST = 80
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.TEST.IMS_PER_BATCH = 1
    cfg.TPU.LOADER_THREADS = 2
    cfg.freeze()

    loaders = make_data_loaders_test(cfg)
    assert len(loaders) == 2
    assert len(loaders[0].dataset) == 1
    assert len(loaders[1].dataset) == 2
