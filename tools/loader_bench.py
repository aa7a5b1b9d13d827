"""Loader-only microbench: per-image decode+resize(+normalize) cost vs
prefetch-thread count.

Quantifies the host side of the end-to-end eval pipeline (the TPU-side
forward runs at ~170 img/s, so eval is host-bound whenever the loader
cannot sustain that). On this environment's 1-core box wall-clock cannot
scale with threads; what CAN be shown is (a) the per-image CPU cost,
(b) that the native decode/resize path releases the GIL — aggregate
CPU-seconds per image stays flat as threads rise, so on an N-core host
throughput scales until images/s ~ N / cpu_s_per_image.

Usage:
    python tools/loader_bench.py [--n 64] [--hw 1024 2048] [--threads 1 2 4]

Prints one JSON line per thread count:
  {"threads": T, "wall_s_per_img": ..., "cpu_s_per_img": ...,
   "img_per_sec": ...}
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_images(root, n, h, w, seed=0):
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    base = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    for i in range(1, n + 1):
        # shift the base image so PNGs differ without n full rand() calls
        arr = np.roll(base, i * 37, axis=1)
        Image.fromarray(arr).save(os.path.join(root, f"img{i}.png"))
        images.append(dict(id=i, file_name=f"img{i}.png", height=h, width=w))
        annotations.append(dict(id=i, image_id=i, category_id=1,
                                bbox=[4, 4, 60, 40], area=2400, iscrowd=0))
    ann = os.path.join(root, "ann.json")
    with open(ann, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="car")]), f)
    return ann, root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048))
    ap.add_argument("--threads", type=int, nargs="+", default=(1, 2, 4))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no-native", action="store_true",
                    help="force the PIL fallback path (A/B vs native)")
    args = ap.parse_args()
    if args.no_native:
        os.environ["SCAN_TPU_NO_NATIVE"] = "1"

    from scan_tpu.config import get_default_cfg
    from scan_tpu.data.build import DetectionLoader
    from scan_tpu.data.datasets.coco import COCODataset

    cfg = get_default_cfg()
    cfg.INPUT.MIN_SIZE_TEST = 800
    cfg.INPUT.MAX_SIZE_TEST = 1333
    cfg.TPU.MAX_BOXES = 10

    with tempfile.TemporaryDirectory() as root:
        ann, img_dir = make_images(root, args.n, *args.hw)
        ds = COCODataset(ann, img_dir, remove_images_without_annotations=False)
        for t in args.threads:
            loader = DetectionLoader(ds, cfg, False, args.batch,
                                     num_threads=t)
            # warm the page cache + native lib load
            it = iter(loader)
            next(it)
            del it
            loader._eval_cache = (
                {} if loader._eval_cache is not None else None
            )  # drop the warmup batch's entries: pass 1 must be fully cold
            for label in ("cold", "cached"):
                c0 = time.process_time()
                t0 = time.perf_counter()
                n_img = 0
                for b in loader:
                    n_img += int((b["indices"] >= 0).sum())
                wall = time.perf_counter() - t0
                cpu = time.process_time() - c0
                print(json.dumps({
                    "native": not args.no_native,
                    "threads": t,
                    "pass": label,
                    "wall_s_per_img": round(wall / n_img, 4),
                    "cpu_s_per_img": round(cpu / n_img, 4),
                    "img_per_sec": round(n_img / wall, 2),
                }), flush=True)
                if loader._eval_cache is None:
                    break  # no cache configured: a second pass = the first


if __name__ == "__main__":
    main()
