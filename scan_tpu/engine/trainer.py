"""Training loops.

Parity target: reference ``fcos_core/engine/trainer.py:124-495``:
  * the zipped source/target iteration with a single optimizer step;
  * the AP50-gated target GST pass (``forward_target = AP50 >
    SOLVER.INITIAL_AP50``, trainer.py:350) — realised here as two compiled
    variants of one fused step;
  * periodic in-training COCO validation every SOLVER.VAL_ITER with
    best-AP50 checkpointing named ``model_{AP50:.4f}_{iter}`` (trainer.py:465-479);
  * smoothed metric logging with ETA.
"""

import datetime
import logging
import math
import time
from typing import Optional

import jax
import numpy as np

from ..utils.metric_logger import MetricLogger

logger = logging.getLogger("scan_tpu.trainer")


def check_finite(host_metrics: dict, it: int) -> None:
    """Fail LOUDLY on a non-finite loss (SURVEY §5 numerics guards).

    A NaN/Inf in any loss term means NaN grads have already poisoned the
    params — continuing only burns chip-hours producing garbage while the
    smoothed log looks alive. The round-4 stability run collapsed at
    iter ~1830 and trained 170 more iterations silently; this converts
    that into an immediate, attributable failure."""
    bad = {k: v for k, v in host_metrics.items() if not math.isfinite(v)}
    if bad:
        raise FloatingPointError(
            f"non-finite training metrics at iter {it}: {bad} — "
            "params are NaN-poisoned; resume from the last healthy "
            "checkpoint (tools/nan_bisect.py pins the offending step)"
        )


class FiniteGuard:
    """Per-step first-failure latch on ``loss_total``.

    The expensive full-metrics fetch stays on a 20-iter cadence, but a
    single f32 scalar is checked EVERY step, so a NaN at iter k raises
    in iter k+1's loop body — not up to 19 optimizer steps later.

    Pipelining matters: blocking on iter k's scalar at the END of iter
    k's own body serializes host and device (one D2H round trip per
    step — measured ~1.2 s/iter through this environment's dispatch
    relay, a 4x trainer slowdown, docs/perf/PERF.md round 5). Instead
    the loop dispatches step k+1 FIRST and then block-reads step k's
    already-computed scalar, so the fetch latency overlaps step k+1's
    device execution and the steady-state cost is ~0. The price is one
    in-flight optimizer step after the poisoned one — it is dispatched
    but its params are never consumed: the raise fires before any
    checkpoint/validation of iter k+1 happens.
    """

    def __init__(self):
        self._pending = None  # (iter, device scalar)

    def arm(self, it: int, loss_total) -> None:
        try:  # start the D2H copy early; overlaps with host-side work
            loss_total.copy_to_host_async()
        except AttributeError:
            pass
        self._pending = (it, loss_total)

    def check(self) -> None:
        if self._pending is None:
            return
        it, dev = self._pending
        self._pending = None
        val = float(dev)
        if not math.isfinite(val):
            raise FloatingPointError(
                f"non-finite loss_total={val} at iter {it} — params are "
                "NaN-poisoned; resume from the last healthy checkpoint "
                "(tools/nan_bisect.py pins the offending step)"
            )


def to_percent_ap(cur: float) -> float:
    """Pin the validation-metric unit: the evaluator reports COCO metrics
    as FRACTIONS in [0, 1] (evaluation/coco_eval.py); the gate/threshold
    space (SOLVER.INITIAL_AP50, reference trainer.py:350) is PERCENT.
    One assertion, one scale — no <=1.0 rescale heuristics."""
    cur = float(cur)
    assert 0.0 <= cur <= 1.0, (
        f"validation metric {cur} is not a fraction; the evaluator "
        "contract (fractions in [0,1]) was broken"
    )
    return cur * 100.0


def do_train_da(
    cfg,
    detector,
    train_step,            # from make_da_train_step (forward_target static)
    params,
    opt_state,
    proto_state,
    loader_source,
    loader_target,
    loader_val=None,
    checkpointer=None,
    start_iter: int = 0,
    initial_ap50: Optional[float] = None,
    mesh=None,
    tb_logger=None,
):
    meters = MetricLogger()
    max_iter = cfg.SOLVER.MAX_ITER
    val_iter = cfg.SOLVER.VAL_ITER
    adapt_val = cfg.SOLVER.ADAPT_VAL_ON
    val_type = cfg.SOLVER.VAL_TYPE
    ap50_emp = initial_ap50 if initial_ap50 is not None else 0.0
    best_metric = ap50_emp

    logger.info("Start DA training: %d iterations", max_iter)
    end = time.time()
    data_time_acc = 0.0
    window = 0

    # Train-time dropout in the condgraph MHA (reference transformer.py:36-91
    # trains with p=0.1): draws are deterministic per (seed, iteration) via
    # fold_in, so resume-from-checkpoint replays the same masks.
    use_dropout = bool(
        cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON
        and cfg.MODEL.MIDDLE_HEAD.GLOBAL_GCN
        and cfg.MODEL.MIDDLE_HEAD.ATT_DROPOUT > 0.0
    )
    dropout_base = jax.random.PRNGKey(1234)  # reference setup_seed(1234)

    src_iter = iter(loader_source)
    tgt_iter = iter(loader_target)
    finite_guard = FiniteGuard()
    for iteration in range(start_iter, max_iter):
        t0 = time.time()
        batch_s = next(src_iter)
        batch_t_full = next(tgt_iter)
        batch_t = {"images": batch_t_full["images"]}
        data_time_acc += time.time() - t0
        window += 1

        forward_target = bool(ap50_emp > cfg.SOLVER.INITIAL_AP50)
        step_kwargs = {}
        if use_dropout:
            step_kwargs["rng"] = jax.random.fold_in(dropout_base, iteration)
        params, opt_state, proto_state, metrics = train_step(
            params, opt_state, proto_state, batch_s, batch_t,
            forward_target=forward_target, **step_kwargs,
        )
        it = iteration + 1
        # pipelined first-failure order: step k+1 is already dispatched,
        # so blocking on step k's scalar overlaps device execution.
        finite_guard.check()
        finite_guard.arm(it, metrics["loss_total"])

        if it % 20 == 0 or it == max_iter:
            host_metrics = {
                k: float(v) for k, v in jax.device_get(metrics).items()
            }
            check_finite(host_metrics, it)
            batch_time = (time.time() - end) / window
            meters.update(time=batch_time, data=data_time_acc / window,
                          **host_metrics)
            data_time_acc = 0.0
            window = 0
            if tb_logger is not None:
                tb_logger.log_scalars(host_metrics, it)
            eta = datetime.timedelta(
                seconds=int(meters.time.global_avg * (max_iter - it))
            )
            logger.info(
                "eta: %s  iter: %d  %s  fwd_tgt: %s",
                eta, it, str(meters), forward_target,
            )
            end = time.time()

        # ---- in-training validation + best checkpoint ----
        if adapt_val and loader_val is not None and it % val_iter == 0:
            from .inference import inference

            results, _ = inference(
                detector, params, proto_state, loader_val, mesh=mesh
            )
            cur = float(results.get(val_type, results.get("AP50", 0.0)))
            ap50_emp = to_percent_ap(cur)
            logger.info("validation @%d: %s=%.4f", it, val_type, ap50_emp)
            if tb_logger is not None:
                tb_logger.log_scalars({f"val/{val_type}": ap50_emp}, it)
            if ap50_emp > best_metric:
                best_metric = ap50_emp
                if checkpointer is not None:
                    checkpointer.save(
                        f"model_{ap50_emp:.4f}_{it}",
                        params, proto_state, opt_state, it,
                    )

        if checkpointer is not None and it % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            checkpointer.save(f"model_{it:07d}", params, proto_state, opt_state, it)

    finite_guard.check()  # drain the last in-flight scalar
    if checkpointer is not None:
        checkpointer.save("model_final", params, proto_state, opt_state, max_iter)
    return params, opt_state, proto_state, best_metric


def do_train_plain(cfg, detector, train_step, params, opt_state, proto_state,
                   loader, checkpointer=None, start_iter: int = 0):
    """Source-only training (reference trainer.py:153-240)."""
    meters = MetricLogger()
    max_iter = cfg.SOLVER.MAX_ITER
    end = time.time()
    it = start_iter
    use_dropout = bool(
        cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON
        and cfg.MODEL.MIDDLE_HEAD.GLOBAL_GCN
        and cfg.MODEL.MIDDLE_HEAD.ATT_DROPOUT > 0.0
    )
    dropout_base = jax.random.PRNGKey(1234)
    finite_guard = FiniteGuard()
    for iteration, batch in enumerate(loader, start_iter):
        batch = {
            k: batch[k] for k in ("images", "sizes", "boxes", "labels", "mask")
        }
        data_time = time.time() - end
        step_kwargs = {}
        if use_dropout:
            step_kwargs["rng"] = jax.random.fold_in(dropout_base, iteration)
        params, opt_state, proto_state, metrics = train_step(
            params, opt_state, proto_state, batch, **step_kwargs
        )
        it = iteration + 1
        finite_guard.check()  # previous step's scalar (pipelined, see class)
        finite_guard.arm(it, metrics["loss_total"])
        if it % 20 == 0 or it == max_iter:
            host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            check_finite(host_metrics, it)
            meters.update(time=(time.time() - end) / 20, data=data_time,
                          **host_metrics)
            eta = datetime.timedelta(
                seconds=int(meters.time.global_avg * (max_iter - it))
            )
            logger.info("eta: %s  iter: %d  %s", eta, it, str(meters))
            end = time.time()
        if checkpointer is not None and it % cfg.SOLVER.CHECKPOINT_PERIOD == 0:
            checkpointer.save(f"model_{it:07d}", params, proto_state, opt_state, it)
        if it >= max_iter:
            break
    finite_guard.check()  # drain the last in-flight scalar
    if checkpointer is not None:
        checkpointer.save("model_final", params, proto_state, opt_state, it)
    return params, opt_state, proto_state
