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
import sys

INSTANCE_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]


def polygon_bbox(polygon):
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    x1, y1 = min(xs), min(ys)
    x2, y2 = max(xs), max(ys)
    return [x1, y1, x2 - x1, y2 - y1]


def convert_instance_ids(files, args, cat_map):
    """Ingest ``*_gtFine_instanceIds.png`` masks instead of the polygon
    JSONs (reference ``tools/cityscapes/instances2dict_with_polygons.py`` +
    ``convert_cityscapes_to_coco.py`` Detectron-style path). Boundary
    polygons are traced from the masks; bbox from the trace, area from
    the pixel count."""
    from instances2dict_with_polygons import instances2dict_with_polygons

    from PIL import Image

    images, annotations = [], []
    ann_id = 1
    for img_id, path in enumerate(files, 1):
        city = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path).replace("_gtFine_instanceIds.png", "")
        file_name = os.path.join(city, stem + args.img_suffix)
        if args.img_dir:
            file_name = os.path.join(args.img_dir, file_name)
        w, h = Image.open(path).size
        images.append(dict(id=img_id, file_name=file_name, height=h, width=w))
        inst = instances2dict_with_polygons(path)[os.path.abspath(path)]
        for label, objs in inst.items():
            if label not in cat_map:
                continue
            for obj in objs:
                polys = [p for p in obj.get("contours", []) if len(p) >= 6]
                if not polys:
                    continue
                xs = [v for p in polys for v in p[0::2]]
                ys = [v for p in polys for v in p[1::2]]
                bbox = [min(xs), min(ys), max(xs) - min(xs), max(ys) - min(ys)]
                annotations.append(dict(
                    id=ann_id, image_id=img_id, category_id=cat_map[label],
                    bbox=bbox, area=obj["pixelCount"], iscrowd=0,
                    segmentation=polys,
                ))
                ann_id += 1
    return images, annotations


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gt-dir", required=True,
                        help="gtFine split dir containing city subdirs")
    parser.add_argument("--img-dir", default="",
                        help="file_name prefix (relative image dir)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--car-only", action="store_true")
    parser.add_argument("--img-suffix", default="_leftImg8bit.png")
    parser.add_argument("--from-instance-ids", action="store_true",
                        help="read *_gtFine_instanceIds.png masks instead "
                             "of the gtFine polygon JSONs")
    args = parser.parse_args()

    classes = ["car"] if args.car_only else INSTANCE_CLASSES
    cat_map = {name: i + 1 for i, name in enumerate(classes)}

    if args.from_instance_ids:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        files = sorted(glob.glob(
            os.path.join(args.gt_dir, "*", "*_gtFine_instanceIds.png")
        ))
        images, annotations = convert_instance_ids(files, args, cat_map)
        categories = [dict(id=i, name=n) for n, i in cat_map.items()]
        with open(args.out, "w") as f:
            json.dump(dict(images=images, annotations=annotations,
                           categories=categories), f)
        print(f"wrote {args.out}: {len(images)} images, "
              f"{len(annotations)} boxes, {len(categories)} classes")
        return

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
