"""Evaluation loop: batched jitted inference + COCO/VOC evaluation.

Parity target: reference ``fcos_core/engine/inference.py:15-123`` and the
in-training validation path (``engine/validation.py``, ``trainer.py:100``).
Predictions come back as fixed-shape masked arrays, are rescaled to original
image coordinates on the host, and scored by the self-contained evaluator.
"""

import logging
import time
from typing import Dict

import jax
import numpy as np

from ..evaluation.coco_eval import evaluate_coco_dataset
from ..evaluation.voc_eval import evaluate_voc_dataset

logger = logging.getLogger("scan_tpu.inference")


def _make_forward(detector, mesh=None, batch_size: int = 0):
    """Jitted inference forward; with a >1-device mesh the batch dim is
    sharded over 'dp' (params replicated) so eval rides all chips
    (reference ``fcos_core/engine/inference.py:40-59`` gathers per-GPU
    predictions; here GSPMD partitions one jitted forward and device_get
    reassembles the global arrays)."""
    if mesh is not None and mesh.size > 1 and batch_size % mesh.size == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("dp"))
        return jax.jit(
            lambda p, s, im, sz: detector.forward_inference(p, s, im, sz),
            in_shardings=(rep, rep, shard, shard),
            out_shardings=shard,
        )
    return jax.jit(
        lambda p, s, im, sz: detector.forward_inference(p, s, im, sz)
    )


def compute_predictions(detector, params, proto_state, data_loader,
                        progress_every: int = 50, mesh=None) -> Dict[int, dict]:
    """Runs the model over an eval loader; returns index -> prediction dict
    (boxes xyxy in ORIGINAL image coordinates, scores, labels).

    With ``TPU.INFER_CHAIN`` > 1, consecutive loader batches are stacked on
    a leading axis and run through ONE device dispatch
    (``detector.forward_inference_multi``) — per-dispatch host latency
    through a remote TPU relay otherwise starves the chip between batches.
    A short tail (fewer than chain batches) falls back to per-batch calls."""
    chain = max(1, int(detector.cfg.TPU.INFER_CHAIN))
    if mesh is not None and mesh.size > 1:
        chain = 1  # sharded eval: GSPMD partitions per-batch dispatches
    fwd = _make_forward(detector, mesh, data_loader.batch_size)
    fwd_multi = jax.jit(
        lambda p, s, im, sz: detector.forward_inference_multi(p, s, im, sz)
    )
    predictions: Dict[int, dict] = {}
    t0 = time.time()
    n_img = 0

    def collect(out_dev, batch):
        nonlocal n_img
        out = jax.device_get(out_dev)
        for slot in range(batch["images"].shape[0]):
            index = int(batch["indices"][slot])
            if index < 0:
                continue
            valid = out["valid"][slot]
            boxes = out["boxes"][slot][valid]
            scores = out["scores"][slot][valid]
            labels = out["labels"][slot][valid]
            sw, sh = batch["scales"][slot]
            boxes = boxes * np.asarray([sw, sh, sw, sh], np.float32)
            predictions[index] = dict(boxes=boxes, scores=scores, labels=labels)
            n_img += 1

    # software pipeline: dispatch batch i+1 before fetching batch i so the
    # host-side decode/collect overlaps device execution
    pending = []

    def drain(keep=0):
        while len(pending) > keep:
            collect(*pending.pop(0))

    def dispatch_group(group):
        if len(group) == chain and chain > 1:
            im = np.stack([b["images"] for b in group])
            sz = np.stack([b["sizes"] for b in group])
            outs = fwd_multi(params, proto_state, im, sz)
            for k, b in enumerate(group):
                pending.append((jax.tree_util.tree_map(
                    lambda a, k=k: a[k], outs), b))
        else:  # short tail: per-batch dispatch avoids a second compile
            for b in group:
                pending.append((fwd(params, proto_state,
                                    b["images"], b["sizes"]), b))
        drain(keep=len(group))

    group = []
    for bi, batch in enumerate(data_loader):
        group.append(batch)
        if len(group) == chain:
            dispatch_group(group)
            group = []
        if progress_every and (bi + 1) % progress_every == 0:
            rate = max(n_img, 1) / (time.time() - t0)
            logger.info("eval batch %d (%.1f img/s)", bi + 1, rate)
    if group:
        dispatch_group(group)
    drain()
    dt = time.time() - t0
    if n_img:
        logger.info("inference done: %d images in %.1fs (%.2f img/s)",
                    n_img, dt, n_img / dt)
    return predictions


def evaluate_dataset(dataset, predictions: Dict[int, dict]):
    from ..data.datasets.coco import COCODataset

    if isinstance(dataset, COCODataset):
        return evaluate_coco_dataset(dataset, predictions)
    return evaluate_voc_dataset(dataset, predictions)


def inference(detector, params, proto_state, data_loader, mesh=None):
    """Full eval: predictions + metrics (reference engine/inference.py:62)."""
    predictions = compute_predictions(
        detector, params, proto_state, data_loader, mesh=mesh
    )
    results = evaluate_dataset(data_loader.dataset, predictions)
    return results, predictions
