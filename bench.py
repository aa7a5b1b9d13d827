"""Headline benchmark: detection inference throughput (images/sec/chip).

Flagship config: SCAN VGG16-FPN + condgraph middle head + FCOS, TEST.MODE
'precision', 800x1333 input (padded 800x1344), bfloat16 conv towers.
Baseline north star (BASELINE.md): >= 300 images/sec/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_PER_SEC = 300.0


def bench_e2e(cfg):
    """End-to-end eval throughput: DetectionLoader (PIL decode, resize,
    normalize, fixed-shape batch, threaded prefetch) -> sharded/jitted
    forward -> host-side decode of the masked outputs. BENCH_E2E=1."""
    import tempfile

    import numpy as np
    from PIL import Image

    from scan_tpu.data.build import DetectionLoader
    from scan_tpu.data.datasets.coco import COCODataset
    from scan_tpu.engine.inference import compute_predictions
    from scan_tpu.modeling.detector import build_detector

    n_images = int(os.environ.get("BENCH_E2E_IMAGES", "96"))
    root = tempfile.mkdtemp(prefix="bench_e2e_")
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(1, n_images + 1):
        arr = rng.randint(0, 255, (1024, 2048, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"b{i}.png"))
        images.append(dict(id=i, file_name=f"b{i}.png", height=1024, width=2048))
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[8, 8, 64, 64], area=4096, iscrowd=0))
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="car")]), f)

    dataset = COCODataset(ann, img_dir)
    loader = DetectionLoader(
        dataset, cfg, is_train=False, batch_size=int(cfg.TEST.IMS_PER_BATCH),
        num_threads=int(cfg.TPU.LOADER_THREADS),
    )
    det = build_detector(cfg)
    H, W = loader.bucket_hw
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params, proto = det.init_params(jax.random.PRNGKey(0), sample)
    if cfg.TPU.INT8_INFERENCE:
        # calibrate static activation scales on the first batch so the
        # e2e metric measures the same deployment mode as the synthetic
        # bench and tools/test_net.py (not the dynamic per-batch path)
        first = next(iter(loader))
        params = det.calibrate_int8(params, proto, [first["images"]])
    # warm (compile + loader threads)
    compute_predictions(det, params, proto, loader, progress_every=0)
    t0 = time.perf_counter()
    preds = compute_predictions(det, params, proto, loader, progress_every=0)
    dt = time.perf_counter() - t0
    return len(preds) / dt


def bench_train(cfg):
    """DA train-step latency (ms/iter) under the same measurement
    discipline as the inference bench: batch 4/domain at 672x1344 bf16
    (the C2F schedule shape), median of BENCH_PASSES timed passes.
    BENCH_TRAIN=1."""
    import optax  # noqa: F401  (pulled transitively; fail fast if absent)

    from scan_tpu.engine.train_step import make_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    h, w = 672, 1344
    cfg.TPU.INT8_INFERENCE = False  # training always runs fp
    det = build_detector(cfg)

    rng = np.random.RandomState(0)
    g = cfg.TPU.MAX_BOXES
    boxes = np.zeros((batch, g, 4), np.float32)
    labels = np.zeros((batch, g), np.int32)
    mask = np.zeros((batch, g), bool)
    n_boxes = 8
    for b in range(batch):
        for k in range(n_boxes):
            x1, y1 = rng.randint(0, w - 80), rng.randint(0, h - 80)
            boxes[b, k] = [x1, y1, x1 + rng.randint(16, 80),
                           y1 + rng.randint(16, 80)]
            labels[b, k] = rng.randint(1, 9)
            mask[b, k] = True
    batch_s = dict(
        images=jnp.asarray(
            rng.randn(batch, h, w, 3).astype(np.float32) * 30 + 100
        ),
        sizes=jnp.asarray([[h, w]] * batch, jnp.int32),
        boxes=jnp.asarray(boxes), labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )
    batch_t = dict(images=jnp.asarray(
        rng.randn(batch, h, w, 3).astype(np.float32) * 30 + 100
    ))

    params, proto = det.init_params(
        jax.random.PRNGKey(0), batch_s["images"][:1]
    )
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)

    # warm both gate variants (compile)
    for ft in (True, False):
        params, opt_state, proto, metrics = step(
            params, opt_state, proto, batch_s, batch_t, forward_target=ft
        )
        _ = float(metrics["loss_total"])

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    passes = int(os.environ.get("BENCH_PASSES", "3"))
    rates = []
    for p in range(passes):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, proto, metrics = step(
                params, opt_state, proto, batch_s, batch_t,
                forward_target=True,
            )
        _ = float(metrics["loss_total"])  # sync
        dt = time.perf_counter() - t0
        rates.append(dt / iters * 1000)
    med = float(np.median(rates))
    spread = (max(rates) - min(rates)) / med * 100
    print(
        f"train passes: {[round(r, 1) for r in rates]} ms/iter "
        f"(median {med:.1f}, spread {spread:.1f}%)",
        file=sys.stderr,
    )
    # BASELINE: the reference's C2F schedule is 80k iters on one GPU; no
    # published it/s — vs_baseline reports the 80k-schedule wall-clock in
    # hours as a scale cue instead of a ratio.
    print(json.dumps({
        "metric": "da_train_step_672x1344_b4",
        "value": round(med, 1),
        "unit": "ms/iter",
        "vs_baseline": round(med * 80000 / 3.6e6, 2),  # hours for 80k iters
    }))


def main():
    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.detector import build_detector

    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "configs", "scan", "scan_vgg16_cityscapace_to_foggy.yaml",
        )
    )
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # knobs: BENCH_INT8=0 -> disable the w8a8 int8-MXU towers (default on:
    # calibrated static-scale int8 is the intended deployment inference
    # mode, box-parity-gated by tests/test_quant.py; docs/perf/PERF.md);
    # BENCH_MODE=light/precision/hybrid -> TEST.MODE
    if os.environ.get("BENCH_INT8", "1") == "1":
        cfg.TPU.INT8_INFERENCE = True
    if os.environ.get("BENCH_MODE"):
        cfg.TEST.MODE = os.environ["BENCH_MODE"]
    if os.environ.get("BENCH_PALLAS_STEM"):
        cfg.TPU.PALLAS_STEM = os.environ["BENCH_PALLAS_STEM"] == "1"
    if os.environ.get("BENCH_STEM_CHUNK"):
        cfg.TPU.STEM_CHUNK = int(os.environ["BENCH_STEM_CHUNK"])
    if os.environ.get("BENCH_STEM_S8"):
        cfg.TPU.STEM_S8_EPILOGUE = os.environ["BENCH_STEM_S8"] == "1"
    if os.environ.get("BENCH_STEM_PAIR"):
        cfg.TPU.STEM_PAIR_CONV = os.environ["BENCH_STEM_PAIR"] == "1"
    if os.environ.get("BENCH_PALLAS_CONV0"):
        cfg.TPU.PALLAS_CONV0 = os.environ["BENCH_PALLAS_CONV0"] == "1"
    if os.environ.get("BENCH_PALLAS_STEM_INT8"):
        cfg.TPU.PALLAS_STEM_INT8 = (
            os.environ["BENCH_PALLAS_STEM_INT8"] == "1"
        )
    if os.environ.get("BENCH_STEM_IM2COL"):
        cfg.TPU.STEM_IM2COL_CONV0 = os.environ["BENCH_STEM_IM2COL"] == "1"
    if os.environ.get("BENCH_PALLAS_PHASEMAX"):
        cfg.TPU.PALLAS_PHASE_MAX = os.environ["BENCH_PALLAS_PHASEMAX"] == "1"
    if os.environ.get("BENCH_PHASEMAX_FORM"):
        cfg.TPU.PHASE_MAX_FORM = os.environ["BENCH_PHASEMAX_FORM"]
    if os.environ.get("BENCH_NMS_CAP"):
        cfg.TPU.NMS_CAP = int(os.environ["BENCH_NMS_CAP"])
    if os.environ.get("BENCH_PRE_NMS_TOP_N"):
        cfg.MODEL.FCOS.PRE_NMS_TOP_N = int(os.environ["BENCH_PRE_NMS_TOP_N"])
    if os.environ.get("BENCH_TRAIN") == "1":
        bench_train(cfg)
        return
    if os.environ.get("BENCH_E2E") == "1":
        cfg.TEST.IMS_PER_BATCH = int(os.environ.get("BENCH_BATCH", "24"))
        img_per_sec = bench_e2e(cfg)
        print(json.dumps({
            "metric": "fcos_vgg16_condgraph_e2e_eval_800x1333",
            "value": round(img_per_sec, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        }))
        return
    # batch 32 measured fastest on v5e-1 (24 -> 141, 32 -> 169, 48 -> 157
    # img/s per-dispatch; 48 no longer OOMs since the s8-only stem)
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    # BENCH_CHAIN batches ride ONE device dispatch (uint8 stack +
    # lax.map, detector.forward_inference_multi): per-call dispatch
    # through the axon relay costs ~30 ms of un-hidden host time per
    # step on this 1-core box (169 img/s dispatched per-batch vs the
    # 202 img/s XProf device-busy rate; chained k=8 measures 196).
    chain = int(os.environ.get("BENCH_CHAIN", "8"))
    h, w = 800, 1344  # 800x1333 padded to /32

    det = build_detector(cfg)
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    params, proto = det.init_params(jax.random.PRNGKey(0), images)

    rng = np.random.RandomState(0)
    # uint8 image stacks: the production loader ships u8 and normalises
    # on device (TPU.DEVICE_NORMALIZE), and f32 stacks of chain*batch
    # full-res frames would not fit HBM
    batch_images = jnp.asarray(
        rng.randint(0, 255, (chain, batch, h, w, 3), np.uint8)
    )
    sizes = jnp.asarray(
        np.tile([[800, 1333]], (chain, batch, 1)), jnp.int32
    )

    if cfg.TPU.INT8_INFERENCE:
        # calibrate static activation scales on one batch (replaces the
        # per-layer dynamic |x|max reduce passes). Calibration runs the
        # UNCHUNKED stem, so cap the calibration slice at 16 images; the
        # amax scales are batch-size independent.
        params = det.calibrate_int8(params, proto, [batch_images[0, :16]])

    fwd = jax.jit(
        lambda p, s, im, sz: det.forward_inference_multi(p, s, im, sz)
    )

    # warmup / compile. NOTE: block_until_ready is unreliable through the
    # axon relay; a tiny host fetch is the only trustworthy sync point.
    out = fwd(params, proto, batch_images, sizes)
    _ = np.asarray(out["scores"][0, 0, 0])

    # ---- single-dispatch timed pass (VERDICT r4 #2) ----
    # The round-4 driver capture paid ~1.27 s of un-hidden relay overhead
    # PER DISPATCH, and the timed pass was 3 dispatches -> the official
    # number halved on relay weather (109.75 wall vs 251 device-busy).
    # Fix: the entire pass is ONE device dispatch — a lax.fori_loop with a
    # DYNAMIC trip count (one compile serves every depth) repeating the
    # chain n times. Two elision guards keep XLA honest:
    #   * the input of every iteration depends on the carry (`im + tok`
    #     where tok = isnan(acc) — 0 at runtime, unprovable at compile
    #     time), so the body cannot be hoisted out of the loop;
    #   * the carry folds a full reduction of EVERY output leaf, so no
    #     output computation is dead-code-eliminated inside the loop.
    def _looped(p, s, im, sz, n):
        def body(i, acc):
            tok = jnp.isnan(acc).astype(im.dtype)  # 0 at runtime, data-dep
            out = det.forward_inference_multi(p, s, im + tok, sz)
            return acc + sum(
                jnp.sum(v.astype(jnp.float32))
                for v in jax.tree_util.tree_leaves(out)
            )
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    looped = jax.jit(_looped)

    def timed(n):
        t0 = time.perf_counter()
        r = looped(params, proto, batch_images, sizes, jnp.int32(n))
        _ = float(r)  # host fetch: the only trustworthy sync point
        return time.perf_counter() - t0

    timed(1)  # compile the looped variant
    # Probe: t(n) = overhead + n * chain_time; differencing two depths
    # cancels the per-dispatch overhead and self-measures both terms.
    t2, t4 = timed(2), timed(4)
    chain_time = (t4 - t2) / 2.0
    if chain_time <= 0:  # relay noise swamped the probe; assume no ovh
        chain_time = t4 / 4.0
    overhead = max(2.0 * t2 - t4, 0.0)

    n_reps = int(os.environ.get("BENCH_REPS", "0"))
    if n_reps <= 0:
        # deep enough that the one dispatch's overhead is <~3% of the
        # pass, with an 8 s floor (pass-to-pass jitter) and a cap so a
        # mis-probed chain_time cannot run away.
        target_s = max(30.0 * overhead,
                       float(os.environ.get("BENCH_MIN_DEVICE_S", "8")))
        n_reps = int(np.clip(np.ceil(target_s / chain_time), 4, 256))

    passes = int(os.environ.get("BENCH_PASSES", "3"))
    rates, walls = [], []
    for p in range(passes):
        dt = timed(n_reps)
        walls.append(dt)
        rates.append(n_reps * chain * batch / dt)
    med = float(np.median(rates))
    spread = (max(rates) - min(rates)) / med * 100
    med_wall = float(np.median(walls))
    print(
        f"bench passes (1 dispatch each, n_reps={n_reps} x {chain}x{batch} "
        f"chain): {[round(r, 1) for r in rates]} img/s "
        f"(median {med:.1f}, spread {spread:.1f}%)",
        file=sys.stderr,
    )
    # Device-busy proxy (VERDICT r3 #5): from the overhead-cancelling
    # probe, so builder/driver captures stay reconcilable.
    dev_rate = chain * batch / chain_time
    print(
        f"device-busy proxy: {dev_rate:.1f} img/s "
        f"({chain_time * 1e3:.1f} ms device per {chain}x{batch}-chain; "
        f"~{overhead * 1e3:.0f} ms host overhead per dispatch = "
        f"{overhead / med_wall * 100:.1f}% of a timed pass)",
        file=sys.stderr,
    )

    img_per_sec = med
    print(
        json.dumps(
            {
                "metric": "fcos_vgg16_condgraph_inference_800x1333",
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
