"""Bisect a mid-training NaN: resume from a checkpoint and step with
per-iteration finiteness checks on every loss term.

Written for the round-4 stability-run post-mortem (the iter-~1830 collapse
in docs/perf/stability_r4.log): the keyed deterministic loaders + fold_in
dropout draws make any window of a run exactly reproducible from the last
healthy checkpoint, so the first non-finite step can be pinned without
re-running the whole schedule.

Usage:
    SCAN_TPU_DATA_DIR=/tmp/stab_ds python tools/nan_bisect.py \
        --ckpt /tmp/stab_r4/model_0001750 --config-file configs/scan/... \
        --until 1860 [--fwd-tgt] [--save-prev /tmp/prenan] [overrides...]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--until", type=int, required=True)
    ap.add_argument("--fwd-tgt", action="store_true")
    ap.add_argument("--save-prev", default="",
                    help="dir to save (params, proto, opt) of the last "
                         "finite iteration and the offending batches")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import (
        make_data_loader_source,
        make_data_loader_target,
    )
    from scan_tpu.engine.dp import build_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer
    from scan_tpu.utils.checkpoint import Checkpointer

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    if args.overrides:
        cfg.merge_from_list(args.overrides)
    cfg.freeze()

    detector = build_detector(cfg)
    loader_src = make_data_loader_source(cfg)
    bucket = loader_src.bucket_hw
    import jax.numpy as jnp

    sample = jnp.zeros((1, bucket[0], bucket[1], 3), jnp.float32)
    params, proto_state = detector.init_params(
        jax.random.PRNGKey(1234), sample
    )
    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)

    # NOT dirname(ckpt): Checkpointer.load prefers an existing
    # last_checkpoint pointer over the explicit path (reference-compatible
    # resume semantics), which here would resolve to the corrupt final.
    ckpt = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "bisect_scratch"),
                        detector)
    params, proto_state, opt_state, start_iter = ckpt.load(
        args.ckpt, params, proto_state, opt_state
    )
    print(f"restored {args.ckpt} at iteration {start_iter}", flush=True)

    loader_src.start_iter = start_iter
    loader_tgt = make_data_loader_target(cfg, start_iter=start_iter)
    train_step = build_da_train_step(detector, optimizer, mesh=None)

    use_dropout = bool(
        cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON
        and cfg.MODEL.MIDDLE_HEAD.GLOBAL_GCN
        and cfg.MODEL.MIDDLE_HEAD.ATT_DROPOUT > 0.0
    )
    dropout_base = jax.random.PRNGKey(1234)

    src_iter = iter(loader_src)
    tgt_iter = iter(loader_tgt)
    prev = None
    for iteration in range(start_iter, args.until):
        batch_s = next(src_iter)
        batch_t_full = next(tgt_iter)
        batch_t = {"images": batch_t_full["images"]}
        kw = {}
        if use_dropout:
            kw["rng"] = jax.random.fold_in(dropout_base, iteration)
        if args.save_prev:
            prev = (params, proto_state, opt_state, batch_s, batch_t, kw)
        params, opt_state, proto_state, metrics = train_step(
            params, opt_state, proto_state, batch_s, batch_t,
            forward_target=args.fwd_tgt, **kw,
        )
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        # metrics lag params by one step (losses are computed BEFORE the
        # update), so also sentinel-check a few post-update param leaves:
        # the first nonfinite SENTINEL pins the true offending step.
        fp = params["fcos"]["params"]
        host["sent_scale0"] = float(fp["scale0"]["scale"].max())
        host["sent_bbox_w"] = float(
            jnp.abs(fp["bbox_pred"]["Conv_0"]["kernel"]).max())
        bad = {k: v for k, v in host.items() if not np.isfinite(v)}
        it = iteration + 1
        if it % 10 == 0 or bad:
            print(f"iter {it}: loss_total={host.get('loss_total'):.4f} "
                  f"nonfinite={sorted(bad)}", flush=True)
        if bad:
            print(f"FIRST NONFINITE at iter {it}: {bad}", flush=True)
            if args.save_prev:
                os.makedirs(args.save_prev, exist_ok=True)
                p, ps, os_, bs, bt, kw = prev
                np.savez(os.path.join(args.save_prev, "batches.npz"),
                         **{f"s_{k}": np.asarray(v) for k, v in bs.items()},
                         **{f"t_{k}": np.asarray(v) for k, v in bt.items()})
                ck2 = Checkpointer(args.save_prev, detector)
                ck2.save("prenan", p, ps, os_, it - 1)
                print(f"saved pre-nan state + batches to {args.save_prev}",
                      flush=True)
            return 1
    print("no nonfinite value reached", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
