"""`scan-tpu` command-line interface.

Parity target: the reference's installable ``fcos`` CLI
(reference ``fcos/bin/fcos:26-58``): detect objects in images from the
shell, plus train/test subcommands wrapping the tools.
"""

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="scan-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    d = sub.add_parser("detect", help="run detection on image files")
    d.add_argument("--config-file", required=True)
    d.add_argument("--weights", default=None)
    d.add_argument("--confidence-threshold", type=float, default=0.5)
    d.add_argument("--output", default=None, help="write JSON here")
    d.add_argument("images", nargs="+")

    for name in ("train", "train-da", "test"):
        p = sub.add_parser(name)
        p.add_argument("--config-file", required=True)
        p.add_argument("opts", nargs=argparse.REMAINDER, default=None)

    args = parser.parse_args(argv)

    if args.command == "detect":
        import numpy as np
        from PIL import Image

        from .demo import SCAN

        model = SCAN(
            args.config_file, args.weights,
            confidence_threshold=args.confidence_threshold,
        )
        results = {}
        for path in args.images:
            with Image.open(path) as im:
                dets = model.detect(np.asarray(im.convert("RGB")))
            results[path] = dets
            print(f"{path}: {len(dets)} detections")
            for det in dets:
                print(f"  {det['label_name']:12s} {det['score']:.3f} {det['box']}")
        if args.output:
            with open(args.output, "w") as f:
                json.dump(results, f, indent=2)
        return 0

    # defer to the tools with the same argv convention
    import runpy
    import os

    tool = {
        "train": "train_net",
        "train-da": "train_net_da",
        "test": "test_net",
    }[args.command]
    tool_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", f"{tool}.py",
    )
    sys.argv = [tool_path, "--config-file", args.config_file] + (args.opts or [])
    runpy.run_path(tool_path, run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
