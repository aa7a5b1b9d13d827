"""Cityscapes ``*_instanceIds.png`` -> per-image instance dictionaries
with boundary polygons.

Parity target: reference ``tools/cityscapes/instances2dict_with_polygons.py:1-81``
(which shells out to cityscapesscripts + cv2.findContours). This
implementation is self-contained: the Cityscapes label table subset is
embedded and the external contour is extracted with a pure-numpy
Moore-neighbour boundary trace (equivalent to cv2 RETR_EXTERNAL +
CHAIN_APPROX_NONE: every boundary pixel, outer contour only, one contour
per connected component).

Output schema per image (matches the reference's dict so downstream
converters can swap in):

    {abs_image_path: {label_name: [
        {"instID": int, "labelID": int, "pixelCount": int,
         "contours": [[x0, y0, x1, y1, ...], ...]}, ...]}}
"""

import os
import sys

import numpy as np
from PIL import Image

# Cityscapes label ids (cityscapesscripts/helpers/labels.py is the public
# definition): id -> (name, hasInstances)
CITYSCAPES_LABELS = {
    0: ("unlabeled", False), 1: ("ego vehicle", False),
    2: ("rectification border", False), 3: ("out of roi", False),
    4: ("static", False), 5: ("dynamic", False), 6: ("ground", False),
    7: ("road", False), 8: ("sidewalk", False), 9: ("parking", False),
    10: ("rail track", False), 11: ("building", False), 12: ("wall", False),
    13: ("fence", False), 14: ("guard rail", False), 15: ("bridge", False),
    16: ("tunnel", False), 17: ("pole", False), 18: ("polegroup", False),
    19: ("traffic light", False), 20: ("traffic sign", False),
    21: ("vegetation", False), 22: ("terrain", False), 23: ("sky", False),
    24: ("person", True), 25: ("rider", True), 26: ("car", True),
    27: ("truck", True), 28: ("bus", True), 29: ("caravan", True),
    30: ("trailer", True), 31: ("train", True), 32: ("motorcycle", True),
    33: ("bicycle", True),
}

# Moore neighbourhood, clockwise starting east: (dy, dx)
_MOORE = [(0, 1), (1, 1), (1, 0), (1, -1),
          (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def trace_external_contour(mask, start):
    """All boundary pixels of the connected component containing
    ``start`` (a boundary pixel), as an (N, 2) array of (x, y) —
    Moore-neighbour tracing with Jacob's stopping criterion."""
    h, w = mask.shape
    sy, sx = start
    contour = [(sx, sy)]
    # entry direction: we scanned left-to-right, so we came from the west
    prev_dir = 4  # west
    cy, cx = sy, sx
    first_step = None
    for _ in range(4 * mask.size):
        found = False
        # start the scan just after the direction we entered from
        for k in range(1, 9):
            d = (prev_dir + k) % 8
            dy, dx = _MOORE[d]
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx]:
                step = (cy, cx, d)
                if first_step is None:
                    first_step = step
                elif step == first_step:
                    return np.asarray(contour[:-1], np.int64)
                contour.append((nx, ny))
                cy, cx = ny, nx
                prev_dir = (d + 4) % 8  # direction back to previous pixel
                found = True
                break
        if not found:  # isolated pixel
            return np.asarray(contour, np.int64)
    return np.asarray(contour, np.int64)  # safety cap


def external_contours(mask):
    """Outer contour per 4-connected component (x, y pixel coords)."""
    mask = np.ascontiguousarray(mask.astype(bool))
    if not mask.any():
        return []
    # label 4-connected components with a simple BFS flood fill
    labels = np.zeros(mask.shape, np.int32)
    h, w = mask.shape
    contours = []
    comp = 0
    for y, x in zip(*np.nonzero(mask)):
        if labels[y, x]:
            continue
        comp += 1
        # flood fill
        stack = [(y, x)]
        labels[y, x] = comp
        while stack:
            cy, cx = stack.pop()
            for dy, dx in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                ny, nx = cy + dy, cx + dx
                if (0 <= ny < h and 0 <= nx < w and mask[ny, nx]
                        and not labels[ny, nx]):
                    labels[ny, nx] = comp
                    stack.append((ny, nx))
        # first pixel in scan order within this component is a boundary px
        contours.append(trace_external_contour(labels == comp, (y, x)))
    return contours


def instances2dict_with_polygons(image_file_list, verbose=False):
    if not isinstance(image_file_list, list):
        image_file_list = [image_file_list]
    out = {}
    for n, path in enumerate(image_file_list, 1):
        img = np.array(Image.open(path))
        instances = {name: [] for name, _ in CITYSCAPES_LABELS.values()}
        for inst_id in np.unique(img):
            if inst_id < 1000:  # semantic-only pixels carry the label id
                continue
            label_id = int(inst_id) // 1000
            name, has_inst = CITYSCAPES_LABELS.get(
                label_id, (str(label_id), False)
            )
            mask = img == inst_id
            rec = {
                "instID": int(inst_id),
                "labelID": label_id,
                "pixelCount": int(mask.sum()),
            }
            if has_inst:
                rec["contours"] = [
                    c.reshape(-1).tolist() for c in external_contours(mask)
                ]
            instances.setdefault(name, []).append(rec)
        out[os.path.abspath(path)] = instances
        if verbose:
            print(f"\rImages Processed: {n}", end=" ", flush=True)
    if verbose:
        print()
    return out


def main(argv):
    files = [a for a in argv if a.endswith(".png")]
    instances2dict_with_polygons(files, True)


if __name__ == "__main__":
    main(sys.argv[1:])
