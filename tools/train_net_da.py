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
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize before device query",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import (
        make_data_loader_source,
        make_data_loader_target,
        make_data_loader_test,
    )
    from scan_tpu.engine.dp import build_da_train_step
    from scan_tpu.engine.trainer import do_train_da
    from scan_tpu.engine.inference import inference
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.parallel.mesh import make_mesh, maybe_init_distributed, replicate
    from scan_tpu.solver.build import make_optimizer
    from scan_tpu.utils.checkpoint import Checkpointer
    from scan_tpu.utils.logger import setup_logger

    maybe_init_distributed(args.distributed)

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
    from scan_tpu.utils.collect_env import collect_env_info

    logger.info("environment:\n%s", collect_env_info())
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

    # resume mid-schedule: the loaders skip to the restored iteration so
    # the stream matches what an uninterrupted run would have seen
    # (reference make_data_loader(start_iter), data/build.py:107-127)
    loader_src.start_iter = start_iter

    loader_val = make_data_loader_test(cfg)

    # data-parallel mesh over every visible chip (reference wires DDP into
    # this tool, train_net_da.py:421-515); batch stays global — shard_map
    # splits it over 'dp', so IMS_PER_BATCH must divide evenly
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1:
        if cfg.SOLVER.IMS_PER_BATCH % n_dev == 0:
            mesh = make_mesh()
            logger.info("data-parallel mesh over %d devices", n_dev)
        else:
            logger.warning(
                "IMS_PER_BATCH=%d not divisible by %d devices; "
                "running single-device", cfg.SOLVER.IMS_PER_BATCH, n_dev,
            )

    if args.test_only:
        results, _ = inference(detector, params, proto_state, loader_val,
                               mesh=mesh)
        logger.info("test results: %s", dict(results))
        return

    if mesh is not None:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        proto_state = replicate(mesh, proto_state)

    tb_logger = None
    if args.use_tensorboard:
        from scan_tpu.utils.tensorboard import TensorboardLogger

        tb_logger = TensorboardLogger(os.path.join(cfg.OUTPUT_DIR, "tb"))

    loader_tgt = make_data_loader_target(cfg, start_iter=start_iter)
    train_step = build_da_train_step(detector, optimizer, mesh=mesh)
    do_train_da(
        cfg, detector, train_step, params, opt_state, proto_state,
        loader_src, loader_tgt, loader_val, checkpointer,
        start_iter=start_iter, mesh=mesh, tb_logger=tb_logger,
    )
    if tb_logger is not None:
        tb_logger.flush()


if __name__ == "__main__":
    main()
