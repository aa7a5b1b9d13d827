#!/usr/bin/env python
"""Plain (source-only) training (reference ``tools/train_net.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description="SCAN-TPU plain training")
    parser.add_argument("--config-file", required=True)
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host: jax.distributed.initialize before device query",
    )
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = parser.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import make_data_loader_train
    from scan_tpu.engine.dp import build_source_only_train_step
    from scan_tpu.engine.trainer import do_train_plain
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
    cfg.defrost()
    cfg.MODEL.DA_ON = False
    cfg.freeze()

    if cfg.TPU.get("DEBUG_NANS", False):
        # reference parity: test_nan asserts on GCN adjacency/losses
        # (condgraph.py:676-678); here XLA checks every op's output.
        jax.config.update("jax_debug_nans", True)

    logger = setup_logger("scan_tpu", cfg.OUTPUT_DIR)
    from scan_tpu.utils.collect_env import collect_env_info

    logger.info("environment:\n%s", collect_env_info())
    detector = build_detector(cfg)
    loader = make_data_loader_train(cfg)
    bucket = loader.bucket_hw
    sample = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
    params, proto_state = detector.init_params(jax.random.PRNGKey(1234), sample)
    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    checkpointer = Checkpointer(cfg.OUTPUT_DIR, detector)
    params, proto_state, opt_state, start_iter = checkpointer.load(
        cfg.MODEL.WEIGHT if not cfg.MODEL.WEIGHT.startswith("http") else "",
        params, proto_state, opt_state,
    )
    loader.start_iter = start_iter  # resume: skip into the stream
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and cfg.SOLVER.IMS_PER_BATCH % n_dev == 0:
        mesh = make_mesh()
        logger.info("data-parallel mesh over %d devices", n_dev)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        proto_state = replicate(mesh, proto_state)
    step = build_source_only_train_step(detector, optimizer, mesh=mesh)
    do_train_plain(cfg, detector, step, params, opt_state, proto_state,
                   loader, checkpointer, start_iter)


if __name__ == "__main__":
    main()
