#!/usr/bin/env python
"""Evaluation entry point (reference ``tools/test_net.py``).

Usage:
  python tools/test_net.py --config-file configs/scan/....yaml MODEL.WEIGHT path/to/ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description="SCAN-TPU evaluation")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import make_data_loaders_test
    from scan_tpu.engine.inference import inference
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.utils.checkpoint import Checkpointer
    from scan_tpu.utils.logger import setup_logger

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    logger = setup_logger("scan_tpu", cfg.OUTPUT_DIR)
    from scan_tpu.utils.collect_env import collect_env_info

    logger.info("environment:\n%s", collect_env_info())
    detector = build_detector(cfg)
    # one loader per DATASETS.TEST name (reference tools/test_net.py:71-97
    # evaluates each test dataset separately)
    loaders = make_data_loaders_test(cfg)

    bucket = max(loader.bucket_hw for loader in loaders)
    sample = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
    params, proto_state = detector.init_params(jax.random.PRNGKey(0), sample)

    ckpt = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "eval_tmp"), detector)
    if cfg.MODEL.WEIGHT:
        params, proto_state, _, _ = ckpt.load(
            cfg.MODEL.WEIGHT, params, proto_state, None, load_dis=False
        )

    base_params = params
    all_printable = {}
    for name, loader in zip(cfg.DATASETS.TEST, loaders):
        if cfg.TPU.INT8_INFERENCE:
            # calibrate static activation scales over the first
            # TPU.INT8_CALIB_BATCHES batches of THIS dataset (replaces
            # per-batch dynamic |x|max reduces; docs/perf/PERF.md).
            # Per-dataset from the base params: a single-batch global
            # calibration clips datasets with larger activations at +-127.
            batches = []
            for _, b in zip(range(int(cfg.TPU.INT8_CALIB_BATCHES)),
                            iter(loader)):
                batches.append(b["images"])
            params = detector.calibrate_int8(
                base_params, proto_state, batches
            )
            logger.info(
                "int8[%s]: calibrated static activation scales over %d "
                "batches", name, len(batches),
            )
        results, predictions = inference(detector, params, proto_state, loader)
        printable = {
            k: v for k, v in results.items() if not isinstance(v, dict)
        }
        logger.info("results[%s]: %s", name, printable)
        all_printable[name] = printable
    if len(all_printable) == 1:
        all_printable = next(iter(all_printable.values()))
    print(json.dumps(all_printable))


if __name__ == "__main__":
    main()
