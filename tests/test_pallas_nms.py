"""Pallas NMS kernel parity vs the XLA implementation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from scan_tpu.ops.nms import nms_keep_mask
from scan_tpu.ops.pallas.nms_kernel import nms_pallas_sorted


def _random_case(seed, n=128):
    rng = np.random.RandomState(seed)
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 50, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order = np.argsort(-scores)
    return boxes[order], scores[order]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thresh", [0.3, 0.5])
def test_pallas_nms_matches_xla(seed, thresh):
    boxes, scores = _random_case(seed)
    valid = jnp.ones((boxes.shape[0],), bool)
    # XLA reference on sorted boxes
    want = nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), valid, thresh)
    got = nms_pallas_sorted(
        jnp.asarray(boxes), valid, None, thresh, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_ml_nms_matches_xla():
    boxes, scores = _random_case(3, 96)
    labels = np.arange(96) % 4
    valid = np.ones(96, bool)
    valid[80:] = False
    want = nms_keep_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5,
        labels=jnp.asarray(labels),
    )
    got = nms_pallas_sorted(
        jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(labels), 0.5,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
