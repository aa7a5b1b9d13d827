#!/usr/bin/env python
"""Adversarial domain-adaptation training (the main SCAN entry point).

Parity target: reference ``tools/train_net_da.py`` — builds the model dict
(backbone / middle_head / fcos / per-level discriminators), per-module
optimizers, source+target loaders, and runs the DA loop with in-training
COCO validation and best-AP50 checkpointing.

Usage:
  python tools/train_net_da.py --config-file configs/scan/scan_vgg16_cityscapace_to_foggy.yaml [opts ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description="SCAN-TPU DA training")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--test-only", action="store_true")
    parser.add_argument("--use-tensorboard", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import (
        make_data_loader_source,
        make_data_loader_target,
        make_data_loader_test,
    )
    from scan_tpu.engine.train_step import make_da_train_step
    from scan_tpu.engine.trainer import do_train_da
    from scan_tpu.engine.inference import inference
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer
    from scan_tpu.utils.checkpoint import Checkpointer
    from scan_tpu.utils.logger import setup_logger

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    if cfg.TPU.get("DEBUG_NANS", False):
        # reference parity: test_nan asserts on GCN adjacency/losses
        # (condgraph.py:676-678); here XLA checks every op's output.
        jax.config.update("jax_debug_nans", True)

    logger = setup_logger("scan_tpu", cfg.OUTPUT_DIR)
    logger.info("devices: %s", jax.devices())
    logger.info("config:\n%s", args.config_file)

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(cfg.OUTPUT_DIR, ".jax_cache"),
    )

    detector = build_detector(cfg)

    loader_src = make_data_loader_source(cfg)
    bucket = loader_src.bucket_hw
    sample = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
    params, proto_state = detector.init_params(jax.random.PRNGKey(1234), sample)

    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    checkpointer = Checkpointer(cfg.OUTPUT_DIR, detector)
    params, proto_state, opt_state, start_iter = checkpointer.load(
        cfg.MODEL.WEIGHT if not cfg.MODEL.WEIGHT.startswith("http") else "",
        params, proto_state, opt_state,
    )

    loader_val = make_data_loader_test(cfg)

    if args.test_only:
        results, _ = inference(detector, params, proto_state, loader_val)
        logger.info("test results: %s", dict(results))
        return

    loader_tgt = make_data_loader_target(cfg)
    train_step = make_da_train_step(detector, optimizer)
    do_train_da(
        cfg, detector, train_step, params, opt_state, proto_state,
        loader_src, loader_tgt, loader_val, checkpointer,
        start_iter=start_iter,
    )


if __name__ == "__main__":
    main()
