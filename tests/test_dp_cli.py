"""Multi-chip training reachable from the CLI: tools/train_net_da.py under
an 8-virtual-device CPU mesh builds the dp step, shards the loaders'
batches, and completes (reference wires DDP into the same tool,
tools/train_net_da.py:421-515)."""

import os
import subprocess
import sys

import pytest

from tests.test_e2e_train import make_synth_coco

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_train_net_da_cli_8dev(tmp_path):
    for sub, seed in (("src", 0), ("tgt", 1), ("val", 2)):
        make_synth_coco(str(tmp_path / sub), n_images=8, hw=(96, 128), seed=seed)

    env = dict(os.environ)
    env["SCAN_TPU_DATA_DIR"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    patch = (
        "import scan_tpu.config.paths_catalog as pc;"
        "pc.DatasetCatalog.DATASETS.update({"
        "'cityscapes_train_cocostyle': {'img_dir': 'src/images', 'ann_file': 'src/ann.json'},"
        "'cityscapes_foggy_train_cocostyle': {'img_dir': 'tgt/images', 'ann_file': 'tgt/ann.json'},"
        "'cityscapes_foggy_val_cocostyle': {'img_dir': 'val/images', 'ann_file': 'val/ann.json'},"
        "});"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys;"
        "sys.argv = ['train_net_da.py', '--config-file', "
        f"r'{REPO}/configs/scan/scan_vgg16_cityscapace_to_foggy.yaml', "
        "'INPUT.MIN_SIZE_RANGE_TRAIN', '(-1,-1)', 'INPUT.MIN_SIZE_TRAIN', '(96,)', "
        "'INPUT.MAX_SIZE_TRAIN', '128', 'INPUT.MIN_SIZE_TEST', '96', "
        "'INPUT.MAX_SIZE_TEST', '128', 'SOLVER.IMS_PER_BATCH', '8', "
        "'TEST.IMS_PER_BATCH', '8', 'SOLVER.MAX_ITER', '2', 'SOLVER.VAL_ITER', '2', "
        "'SOLVER.CHECKPOINT_PERIOD', '100', 'TPU.MAX_NODES', '32', "
        "'TPU.MAX_TARGET_POINTS', '32', 'TPU.MAX_BOXES', '10', "
        "'TPU.LOADER_THREADS', '2', 'TPU.COMPUTE_DTYPE', 'float32', "
        f"'OUTPUT_DIR', r'{tmp_path}/out'];"
        f"runpy.run_path(r'{REPO}/tools/train_net_da.py', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", patch], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=2400,
    )
    assert out.returncode == 0, (out.stderr[-3000:], out.stdout[-1000:])
    log = out.stdout + out.stderr
    assert "data-parallel mesh over 8 devices" in log
    assert "saved checkpoint" in log
