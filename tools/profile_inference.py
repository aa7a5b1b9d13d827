"""Stage-level inference profile for the flagship SCAN config.

Times cumulative prefixes of the inference pipeline (backbone -> condgraph
-> FCOS head -> postprocess) on the real device so the per-stage cost is
the difference of adjacent rows. Also optionally captures an XProf trace
(--trace DIR) for MXU-utilisation inspection.

Evidence artifact for the perf work: the committed breakdown lives in
STATUS.md's perf section.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, iters, sync_leaf, label=""):
    t_c = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(sync_leaf(out))  # compile + sync
    print(f"[compile] {label}: {time.perf_counter() - t_c:.1f}s", flush=True)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        _ = np.asarray(sync_leaf(o))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--mode", default=None, help="TEST.MODE override")
    ap.add_argument("--trace", default=None, help="XProf trace output dir")
    args = ap.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.modeling.detector import build_detector

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(repo, "configs", "scan", "scan_vgg16_cityscapace_to_foggy.yaml")
    )
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if args.int8:
        cfg.TPU.INT8_INFERENCE = True
    if args.mode:
        cfg.TEST.MODE = args.mode

    det = build_detector(cfg)
    h, w = 800, 1344
    images = jnp.zeros((1, h, w, 3), jnp.float32)
    params, proto = det.init_params(jax.random.PRNGKey(0), images)
    rng = np.random.RandomState(0)
    batch_images = jnp.asarray(rng.randn(args.batch, h, w, 3).astype(np.float32) * 30 + 100)
    sizes = jnp.asarray([[800, 1333]] * args.batch, jnp.int32)
    if cfg.TPU.INT8_INFERENCE:
        # static activation scales — profile the same deployment mode as
        # bench.py/test_net.py (the dynamic per-batch path keeps full-res
        # f32 intermediates alive and OOMs at batch 32)
        params = det.calibrate_int8(params, proto, [batch_images[:16]])

    @jax.jit
    def backbone_only(p, im):
        return det.backbone_inf.apply(p["backbone"], det._prep_images(im))

    @jax.jit
    def through_condgraph(p, s, im):
        feats = list(det.backbone_inf.apply(p["backbone"], det._prep_images(im)))
        if det.condgraph_on:
            feats, _, act_maps, _ = det.middle_head.apply(
                p["middle_head"], feats, s, "inference"
            )
        return feats

    @jax.jit
    def through_head(p, s, im):
        feats = list(det.backbone_inf.apply(p["backbone"], det._prep_images(im)))
        if det.condgraph_on:
            feats, _, act_maps, _ = det.middle_head.apply(
                p["middle_head"], feats, s, "inference"
            )
        return det.head_inf.apply(p["fcos"], feats, det.test_mode != "light")

    full = jax.jit(lambda p, s, im, sz: det.forward_inference(p, s, im, sz))

    rows = {}
    rows["backbone"] = timed(
        backbone_only, (params, batch_images), args.iters, lambda o: o[0][0, 0, 0, 0], "backbone"
    )
    rows["+condgraph"] = timed(
        through_condgraph, (params, proto, batch_images), args.iters,
        lambda o: o[0][0, 0, 0, 0], "+condgraph",
    )
    rows["+fcos_head"] = timed(
        through_head, (params, proto, batch_images), args.iters,
        lambda o: o[1][0][0, 0, 0, 0], "+fcos_head",
    )
    rows["full(+postprocess)"] = timed(
        full, (params, proto, batch_images, sizes), args.iters,
        lambda o: o["scores"][0, 0], "full",
    )

    if args.trace:
        with jax.profiler.trace(args.trace):
            o = full(params, proto, batch_images, sizes)
            _ = np.asarray(o["scores"][0, 0])

    report = {
        "batch": args.batch,
        "int8": args.int8,
        "mode": cfg.TEST.MODE,
        "stages_ms_per_batch": {k: round(v * 1e3, 2) for k, v in rows.items()},
        "img_per_sec_full": round(args.batch / rows["full(+postprocess)"], 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
