"""Segmentation masks and person keypoints (padded, mask-aware).

Parity targets: reference ``fcos_core/structures/segmentation_mask.py``
(polygon instances with resize/transpose/crop and polygon->bitmask
rasterisation) and ``structures/keypoint.py`` (PersonKeypoints with the
flip permutation). The SCAN detection path never consumes these (masks are
commented out of the reference COCODataset, coco.py:82-84); they complete
the structures layer for mask/keypoint-capable heads.
"""

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

FLIP_LEFT_RIGHT = 0
FLIP_TOP_BOTTOM = 1


@dataclasses.dataclass
class PolygonInstance:
    """One instance: list of polygons [x0, y0, x1, y1, ...]."""

    polygons: List[np.ndarray]
    size: Tuple[int, int]  # (w, h)

    def resize(self, new_size):
        w, h = self.size
        nw, nh = new_size
        rw, rh = nw / w, nh / h
        polys = []
        for p in self.polygons:
            q = p.astype(np.float64).copy()
            q[0::2] *= rw
            q[1::2] *= rh
            polys.append(q)
        return PolygonInstance(polys, (nw, nh))

    def transpose(self, method=FLIP_LEFT_RIGHT):
        w, h = self.size
        polys = []
        for p in self.polygons:
            q = p.astype(np.float64).copy()
            if method == FLIP_LEFT_RIGHT:
                q[0::2] = w - q[0::2] - 1
            else:
                q[1::2] = h - q[1::2] - 1
            polys.append(q)
        return PolygonInstance(polys, self.size)

    def crop(self, box):
        x1, y1, x2, y2 = box
        polys = []
        for p in self.polygons:
            q = p.astype(np.float64).copy()
            q[0::2] = np.clip(q[0::2] - x1, 0, x2 - x1)
            q[1::2] = np.clip(q[1::2] - y1, 0, y2 - y1)
            polys.append(q)
        return PolygonInstance(polys, (int(x2 - x1), int(y2 - y1)))

    def rasterize(self) -> np.ndarray:
        """Polygon -> bool bitmask via even-odd scanline fill."""
        w, h = self.size
        mask = np.zeros((h, w), bool)
        for p in self.polygons:
            xs = p[0::2]
            ys = p[1::2]
            n = len(xs)
            if n < 3:
                continue
            yy, xx = np.mgrid[0:h, 0:w]
            inside = np.zeros((h, w), bool)
            j = n - 1
            for i in range(n):
                cond = ((ys[i] > yy) != (ys[j] > yy)) & (
                    xx
                    < (xs[j] - xs[i]) * (yy - ys[i]) / (ys[j] - ys[i] + 1e-12)
                    + xs[i]
                )
                inside ^= cond
                j = i
            mask |= inside
        return mask


class SegmentationMask:
    """List of PolygonInstance with BoxList-style transforms."""

    def __init__(self, instances: Sequence, size: Tuple[int, int], mode="poly"):
        self.size = tuple(size)
        self.mode = mode
        self.instances = [
            inst
            if isinstance(inst, PolygonInstance)
            else PolygonInstance(
                [np.asarray(p, np.float64) for p in inst], self.size
            )
            for inst in instances
        ]

    def __len__(self):
        return len(self.instances)

    def __getitem__(self, idx):
        return self.instances[idx]

    def resize(self, new_size):
        return SegmentationMask(
            [i.resize(new_size) for i in self.instances], new_size, self.mode
        )

    def transpose(self, method=FLIP_LEFT_RIGHT):
        return SegmentationMask(
            [i.transpose(method) for i in self.instances], self.size, self.mode
        )

    def crop(self, box):
        new_size = (int(box[2] - box[0]), int(box[3] - box[1]))
        return SegmentationMask(
            [i.crop(box) for i in self.instances], new_size, self.mode
        )

    def to_bitmask_array(self) -> np.ndarray:
        return np.stack([i.rasterize() for i in self.instances]) if self.instances else np.zeros((0,) + self.size[::-1], bool)


PERSON_KEYPOINT_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip", "left_knee",
    "right_knee", "left_ankle", "right_ankle",
)
_FLIP_MAP = {
    "left_eye": "right_eye", "left_ear": "right_ear",
    "left_shoulder": "right_shoulder", "left_elbow": "right_elbow",
    "left_wrist": "right_wrist", "left_hip": "right_hip",
    "left_knee": "right_knee", "left_ankle": "right_ankle",
}


def _flip_inds():
    full = dict(_FLIP_MAP, **{v: k for k, v in _FLIP_MAP.items()})
    return [
        PERSON_KEYPOINT_NAMES.index(full.get(n, n))
        for n in PERSON_KEYPOINT_NAMES
    ]


class PersonKeypoints:
    """(N, 17, 3) keypoints [x, y, visibility] with resize/flip."""

    NAMES = PERSON_KEYPOINT_NAMES

    def __init__(self, keypoints, size):
        kp = np.asarray(keypoints, np.float64).reshape(-1, 17, 3)
        self.keypoints = kp
        self.size = tuple(size)

    def __len__(self):
        return len(self.keypoints)

    def resize(self, new_size):
        w, h = self.size
        nw, nh = new_size
        kp = self.keypoints.copy()
        kp[..., 0] *= nw / w
        kp[..., 1] *= nh / h
        return PersonKeypoints(kp, new_size)

    def transpose(self, method=FLIP_LEFT_RIGHT):
        """Horizontal flip swaps left/right keypoints and mirrors x
        (reference keypoint.py:40-58). Vertical flip mirrors y without a
        name swap — the reference raises NotImplementedError there
        (keypoint.py:42); supported here for transform completeness."""
        if method == FLIP_LEFT_RIGHT:
            w = self.size[0]
            kp = self.keypoints[:, _flip_inds()].copy()
            kp[..., 0] = w - kp[..., 0] - 1
        elif method == FLIP_TOP_BOTTOM:
            h = self.size[1]
            kp = self.keypoints.copy()
            kp[..., 1] = h - kp[..., 1] - 1
        else:
            raise NotImplementedError(f"unknown transpose method {method}")
        # COCO convention: visibility == 0 -> the whole keypoint is 0
        # (reference keypoint.py:52-54 zeroes x, y AND visibility)
        kp *= (kp[..., 2:3] > 0)
        return PersonKeypoints(kp, self.size)
