"""Config system: every shipped YAML must load over the defaults verbatim."""

import glob
import os

import pytest

from scan_tpu.config import get_default_cfg

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"), recursive=True))


def test_found_configs():
    assert len(ALL_CONFIGS) >= 3


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=[os.path.basename(p) for p in ALL_CONFIGS])
def test_config_loads(path):
    cfg = get_default_cfg()
    cfg.merge_from_file(path)
    cfg.freeze()
    assert cfg.MODEL.FCOS.NUM_CLASSES >= 2


def test_c2f_values():
    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(CONFIG_ROOT, "scan", "scan_vgg16_cityscapace_to_foggy.yaml")
    )
    assert cfg.MODEL.FCOS.NUM_CLASSES == 9
    assert cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON is True
    # string literal decoding: "('NODES', 'ADJ')" -> tuple
    assert cfg.MODEL.MIDDLE_HEAD.TRANSFER_CFG == ("NODES", "ADJ")
    assert cfg.MODEL.MIDDLE_HEAD.USE_RNN == "RNN"
    assert cfg.MODEL.MIDDLE_HEAD.PROTO_ITER == 3
    assert cfg.MODEL.ADV.USE_DIS_P3_CON is True
    assert cfg.SOLVER.BACKBONE.BASE_LR == 0.0025
    assert cfg.SOLVER.BACKBONE.STEPS == (60000, 80000)
    assert cfg.TEST.MODE == "precision"
    assert cfg.INPUT.MIN_SIZE_RANGE_TRAIN == (640, 800)
    assert cfg.DATASETS.TRAIN_SOURCE == ("cityscapes_train_cocostyle",)


def test_merge_from_list():
    cfg = get_default_cfg()
    cfg.merge_from_list(["MODEL.FCOS.NUM_CLASSES", "5", "TEST.MODE", "light"])
    assert cfg.MODEL.FCOS.NUM_CLASSES == 5
    assert cfg.TEST.MODE == "light"


def test_freeze_blocks_writes():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.FCOS.NUM_CLASSES = 3
    cfg.defrost()
    cfg.MODEL.FCOS.NUM_CLASSES = 3
    assert cfg.MODEL.FCOS.NUM_CLASSES == 3


def test_clone_is_deep():
    cfg = get_default_cfg()
    c2 = cfg.clone()
    c2.MODEL.FCOS.NUM_CLASSES = 77
    assert cfg.MODEL.FCOS.NUM_CLASSES != 77
