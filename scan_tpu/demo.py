"""Single-image predictor + simple pip-style API.

Parity targets:
  * ``COCODemo`` (reference ``demo/predictor.py:100-436``): build model from
    cfg, min-side resize + BGR255 preprocessing, per-class confidence
    thresholds, top-prediction selection, box/label overlay;
  * the installable ``fcos.FCOS`` API (reference ``fcos/fcos.py:79-318``):
    ``detect(image)`` returning plain dicts.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import get_default_cfg
from .data.transforms import Preprocessor
from .modeling.detector import build_detector
from .utils.checkpoint import Checkpointer

CITYSCAPES_CATEGORIES = [
    "__background__", "person", "rider", "car", "truck",
    "bus", "train", "motorcycle", "bicycle",
]


class Predictor:
    """Runs the SCAN detector on numpy RGB images."""

    def __init__(self, cfg, weights: Optional[str] = None,
                 confidence_threshold: float = 0.5,
                 categories: Optional[List[str]] = None,
                 min_image_size: Optional[int] = None):
        self.cfg = cfg
        self.detector = build_detector(cfg)
        self.confidence_threshold = confidence_threshold
        self.categories = categories or CITYSCAPES_CATEGORIES
        self.min_size = min_image_size or cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST
        self.pre = Preprocessor(
            [self.min_size], self.max_size, cfg.INPUT.PIXEL_MEAN,
            cfg.INPUT.PIXEL_STD, cfg.INPUT.TO_BGR255,
        )
        h, w = 32 * ((self.min_size + 31) // 32), 32 * (
            (self.max_size + 31) // 32
        )
        sample = jnp.zeros((1, h, w, 3), jnp.float32)
        self.params, self.proto = self.detector.init_params(
            jax.random.PRNGKey(0), sample
        )
        if weights:
            ckpt = Checkpointer("/tmp/scan_tpu_demo_ckpt", self.detector)
            self.params, self.proto, _, _ = ckpt.load(
                weights, self.params, self.proto, None, load_dis=False
            )
        self._fwd = jax.jit(
            lambda p, s, im, sz: self.detector.forward_inference(p, s, im, sz)
        )
        self._bucket = (h, w)

    def detect(self, image: np.ndarray) -> List[Dict]:
        """image: (H, W, 3) uint8 RGB. Returns a list of detection dicts in
        original-image coordinates."""
        oh0, ow0 = image.shape[:2]
        img, _, (oh, ow) = self.pre(image, None)
        H, W = self._bucket
        if oh > H or ow > W:
            H = 32 * ((oh + 31) // 32)
            W = 32 * ((ow + 31) // 32)
            self._bucket = (H, W)
        batch = np.zeros((1, H, W, 3), np.float32)
        batch[0, :oh, :ow] = img
        out = self._fwd(
            self.params, self.proto, jnp.asarray(batch),
            jnp.asarray([[oh, ow]], jnp.int32),
        )
        out = jax.device_get(out)
        valid = out["valid"][0]
        boxes = out["boxes"][0][valid] * np.asarray(
            [ow0 / ow, oh0 / oh, ow0 / ow, oh0 / oh], np.float32
        )
        scores = out["scores"][0][valid]
        labels = out["labels"][0][valid]
        keep = scores >= self.confidence_threshold
        results = []
        for b, s, l in zip(boxes[keep], scores[keep], labels[keep]):
            name = (
                self.categories[int(l)]
                if int(l) < len(self.categories)
                else str(int(l))
            )
            results.append(
                dict(box=b.tolist(), score=float(s), label=int(l),
                     label_name=name)
            )
        return results

    def run_on_image(self, image: np.ndarray) -> np.ndarray:
        """Returns the image with detections drawn (COCODemo.run_on_opencv_image)."""
        dets = self.detect(image)
        return draw_detections(image, dets)


def draw_detections(image: np.ndarray, detections: List[Dict]) -> np.ndarray:
    """Overlay boxes + labels (pure numpy; no cv2 dependency required)."""
    out = image.copy()
    rng = np.random.RandomState(3)
    colors = {d["label"]: rng.randint(64, 255, 3) for d in detections}
    for d in detections:
        x1, y1, x2, y2 = (int(round(v)) for v in d["box"])
        c = colors[d["label"]]
        x1 = max(0, min(x1, out.shape[1] - 1))
        x2 = max(0, min(x2, out.shape[1] - 1))
        y1 = max(0, min(y1, out.shape[0] - 1))
        y2 = max(0, min(y2, out.shape[0] - 1))
        out[y1 : y1 + 2, x1:x2] = c
        out[max(y2 - 1, 0) : y2 + 1, x1:x2] = c
        out[y1:y2, x1 : x1 + 2] = c
        out[y1:y2, max(x2 - 1, 0) : x2 + 1] = c
    return out


class SCAN:
    """Simple pip-style API (reference fcos/fcos.py FCOS class)."""

    def __init__(self, config_path: str, weights: Optional[str] = None,
                 confidence_threshold: float = 0.5, **overrides):
        cfg = get_default_cfg()
        cfg.merge_from_file(config_path)
        for k, v in overrides.items():
            cfg.merge_from_list([k, str(v)])
        self.predictor = Predictor(
            cfg, weights, confidence_threshold=confidence_threshold
        )

    def detect(self, image: np.ndarray) -> List[Dict]:
        return self.predictor.detect(image)

    def show_bboxes(self, image: np.ndarray) -> np.ndarray:
        return self.predictor.run_on_image(image)
