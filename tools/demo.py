#!/usr/bin/env python
"""Single-image / folder demo (reference ``demo/fcos_demo.py``).

Usage:
  python tools/demo.py --config-file configs/scan/....yaml \
      --weights ckpt --images img1.png img2.png --out-dir demo_out
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    parser = argparse.ArgumentParser(description="SCAN-TPU demo")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--images", nargs="+", required=True)
    parser.add_argument("--out-dir", default="demo_out")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    args = parser.parse_args()

    from scan_tpu.config import get_default_cfg
    from scan_tpu.demo import Predictor

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    predictor = Predictor(
        cfg, args.weights, confidence_threshold=args.confidence_threshold
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.images:
        with Image.open(path) as im:
            img = np.asarray(im.convert("RGB"))
        dets = predictor.detect(img)
        print(f"{path}: {len(dets)} detections")
        for d in dets:
            print(f"  {d['label_name']:12s} {d['score']:.3f} {d['box']}")
        overlay = predictor.run_on_image(img)
        out_path = os.path.join(args.out_dir, os.path.basename(path))
        Image.fromarray(overlay).save(out_path)
        print(f"  saved {out_path}")


if __name__ == "__main__":
    main()
