"""CLI tools smoke tests: tools/test_net.py end-to-end over a synthetic
catalog-registered dataset (covers config merge, loader, inference,
evaluation and the JSON output contract)."""

import json
import os
import subprocess
import sys

import pytest

from tests.test_e2e_train import make_synth_coco

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_test_net_cli(tmp_path):
    ann, img_dir = make_synth_coco(str(tmp_path / "data"), n_images=4,
                                   hw=(96, 128), n_cats=8)
    # register via the catalog's env-based DATA_DIR by pointing a known name
    # at our synthetic tree through a custom catalog patch file
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        f"""
MODEL:
  RPN_ONLY: True
  FCOS_ON: True
  DA_ON: False
  MIDDLE_HEAD:
    CONDGRAPH_ON: True
    NUM_CONVS_IN: 2
    CAT_ACT_MAP: True
    PROTO_ITER: 3
    USE_RNN: 'RNN'
    GLOBAL_GCN: True
    ACT_LOSS: 'softmaxFL'
  BACKBONE:
    CONV_BODY: "VGG-16-FPN-RETINANET"
  RETINANET:
    USE_C5: False
  FCOS:
    NUM_CLASSES: 9
    REG_CTR_ON: True
TEST:
  MODE: 'precision'
  IMS_PER_BATCH: 2
INPUT:
  MIN_SIZE_TEST: 96
  MAX_SIZE_TEST: 128
DATASETS:
  TEST: ("cityscapes_foggy_val_cocostyle",)
OUTPUT_DIR: "{tmp_path}/out"
TPU:
  MAX_NODES: 32
  MAX_BOXES: 10
  LOADER_THREADS: 2
"""
    )
    # point the catalog name at our synthetic tree
    env = dict(os.environ)
    env["SCAN_TPU_DATA_DIR"] = str(tmp_path / "data")
    env["JAX_PLATFORMS"] = "cpu"
    patch = (
        "import scan_tpu.config.paths_catalog as pc;"
        "pc.DatasetCatalog.DATASETS['cityscapes_foggy_val_cocostyle'] = "
        "{'img_dir': 'images', 'ann_file': 'ann.json'};"
        "import runpy, sys;"
        f"sys.argv = ['test_net.py', '--config-file', r'{cfg_path}'];"
        f"runpy.run_path(r'{REPO}/tools/test_net.py', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", patch], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # last stdout line is the JSON results dict
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    results = json.loads(line)
    assert "AP50" in results and "AP" in results
