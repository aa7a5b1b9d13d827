#!/usr/bin/env python
"""Webcam demo (reference ``demo/webcam.py``): live detection overlay."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(description="SCAN-TPU webcam demo")
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("--camera", type=int, default=0)
    args = parser.parse_args()

    import cv2

    from scan_tpu.config import get_default_cfg
    from scan_tpu.demo import Predictor

    cfg = get_default_cfg()
    cfg.merge_from_file(args.config_file)
    predictor = Predictor(
        cfg, args.weights, confidence_threshold=args.confidence_threshold
    )
    cam = cv2.VideoCapture(args.camera)
    if not cam.isOpened():
        raise SystemExit(f"cannot open camera {args.camera}")
    while True:
        ok, frame_bgr = cam.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        overlay = predictor.run_on_image(rgb)
        cv2.imshow("scan-tpu", cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
        if cv2.waitKey(1) == 27:  # ESC
            break
    cam.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
