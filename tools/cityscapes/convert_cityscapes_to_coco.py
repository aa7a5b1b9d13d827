#!/usr/bin/env python
"""Convert Cityscapes gtFine polygon annotations to COCO-style detection json.

Parity target: reference ``tools/cityscapes/convert_cityscapes_to_coco.py``
(the 8 instance classes used by the DA benchmarks; optional car-only mode
for the Sim10k/KITTI suites).

Usage:
  python tools/cityscapes/convert_cityscapes_to_coco.py \
      --gt-dir /data/Cityscapes/gtFine/train \
      --img-dir leftImg8bit/train \
      --out cityscapes_train_cocostyle.json [--car-only]
"""

import argparse
import glob
import json
import os

INSTANCE_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


def polygon_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    x1, y1 = min(xs), min(ys)
    x2, y2 = max(xs), max(ys)
    return [x1, y1, x2 - x1, y2 - y1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-dir", required=True,
                        help="gtFine split dir containing city subdirs")
    parser.add_argument("--img-dir", default="",
                        help="file_name prefix (relative image dir)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--car-only", action="store_true")
    parser.add_argument("--img-suffix", default="_leftImg8bit.png")
    args = parser.parse_args()

    classes = ["car"] if args.car_only else INSTANCE_CLASSES
    cat_map = {name: i + 1 for i, name in enumerate(classes)}

    images, annotations = [], []
    ann_id = 1
    files = sorted(
        glob.glob(os.path.join(args.gt_dir, "*", "*_gtFine_polygons.json"))
    )
    for img_id, path in enumerate(files, 1):
        with open(path) as f:
            gt = json.load(f)
        city = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path).replace("_gtFine_polygons.json", "")
        file_name = os.path.join(city, stem + args.img_suffix)
        if args.img_dir:
            file_name = os.path.join(args.img_dir, file_name)
        images.append(
            dict(id=img_id, file_name=file_name,
                 height=gt["imgHeight"], width=gt["imgWidth"])
        )
        for obj in gt["objects"]:
            label = obj["label"]
            crowd = 0
            if label.endswith("group"):
                label = label[: -len("group")]
                crowd = 1
            if label not in cat_map:
                continue
            bbox = polygon_bbox(obj["polygon"])
            annotations.append(
                dict(
                    id=ann_id, image_id=img_id, category_id=cat_map[label],
                    bbox=bbox, area=bbox[2] * bbox[3], iscrowd=crowd,
                    segmentation=[
                        [c for p in obj["polygon"] for c in p]
                    ],
                )
            )
            ann_id += 1

    categories = [dict(id=i, name=n) for n, i in cat_map.items()]
    with open(args.out, "w") as f:
        json.dump(
            dict(images=images, annotations=annotations, categories=categories),
            f,
        )
    print(
        f"wrote {args.out}: {len(images)} images, {len(annotations)} boxes, "
        f"{len(categories)} classes"
    )


if __name__ == "__main__":
    main()
