"""Train-time dropout in the condgraph MHA (PARITY #7).

Parity target: reference ``fcos_core/layers/transformer.py:36-91`` applies
dropout twice (attention weights after softmax; output after linear_final)
and ``condgraph.py:205`` instantiates MultiHeadAttention(256, 4, dropout=0.1)
— so the flagship C2F config (GLOBAL_GCN: True) trains with p=0.1.

Contract verified here:
  * the flagship config wires ATT_DROPOUT=0.1 into the module;
  * no 'dropout' rng  -> deterministic (torch eval() semantics), so all
    existing inference/parity paths are unchanged;
  * with an rng, draws are deterministic per key — fold_in(seed, iter)
    reproduces the same masks (resume-stable) and different iters differ.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.condgraph.module import CondGraphConfig
from scan_tpu.modeling.layers import MultiHeadSelfAttention

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)


def test_flagship_config_uses_dropout_01():
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    assert cfg.MODEL.MIDDLE_HEAD.ATT_DROPOUT == 0.1
    assert cfg.MODEL.MIDDLE_HEAD.GLOBAL_GCN is True
    cg = CondGraphConfig.from_cfg(cfg)
    assert cg.mha_dropout == 0.1


def _mha_setup():
    mha = MultiHeadSelfAttention(model_dim=256, num_heads=4, dropout=0.1)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 256), jnp.float32)
    params = mha.init(jax.random.PRNGKey(0), x)
    return mha, params, x


def test_no_rng_is_deterministic_and_matches_rate_zero():
    mha, params, x = _mha_setup()
    y1 = mha.apply(params, x)
    y2 = mha.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # identical module with rate 0 shares the param structure -> same output
    mha0 = MultiHeadSelfAttention(model_dim=256, num_heads=4, dropout=0.0)
    y0 = mha0.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=0, atol=0)


def test_rng_draws_deterministic_per_key():
    mha, params, x = _mha_setup()
    base = jax.random.PRNGKey(1234)
    k_it5 = jax.random.fold_in(base, 5)
    y_a = mha.apply(params, x, rngs={"dropout": k_it5})
    y_b = mha.apply(params, x, rngs={"dropout": k_it5})
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))

    y_it6 = mha.apply(params, x, rngs={"dropout": jax.random.fold_in(base, 6)})
    assert not np.array_equal(np.asarray(y_a), np.asarray(y_it6))

    y_det = mha.apply(params, x)
    assert not np.array_equal(np.asarray(y_a), np.asarray(y_det))


@pytest.mark.slow
def test_train_step_dropout_deterministic_per_seed_iter():
    """Full DA step: rng=fold_in(seed, iter) reproduces params exactly;
    a different iter gives a different loss (masks actually fire)."""
    from scan_tpu.engine.train_step import make_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.TPU.MAX_NODES = 64
    cfg.TPU.MAX_TARGET_POINTS = 64
    cfg.TPU.MAX_BOXES = 8
    # shrink towers: this test only exercises rng threading
    cfg.TPU.VGG_WIDTH_DIV = 4
    cfg.MODEL.FCOS.NUM_CONVS = 1
    cfg.MODEL.FCOS.NUM_CONVS_REG = 1
    cfg.MODEL.FCOS.NUM_CONVS_CLS = 1
    for lvl in "34567":
        setattr(cfg.MODEL.ADV, f"CON_NUM_SHARED_CONV_P{lvl}", 1)
    det = build_detector(cfg)

    rng = np.random.RandomState(0)
    b, h, w, g = 1, 64, 96, 8
    boxes = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    mask = np.zeros((b, g), bool)
    boxes[0, :2] = [[8, 8, 40, 48], [30, 20, 60, 60]]
    labels[0, :2] = [2, 7]
    mask[0, :2] = True
    batch_s = dict(
        images=jnp.asarray(rng.randn(b, h, w, 3) * 30 + 100, jnp.float32),
        sizes=jnp.asarray([[h, w]] * b, jnp.int32),
        boxes=jnp.asarray(boxes), labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )
    batch_t = dict(
        images=jnp.asarray(rng.randn(b, h, w, 3) * 30 + 100, jnp.float32)
    )

    params, proto = det.init_params(jax.random.PRNGKey(0), batch_s["images"])
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)

    base = jax.random.PRNGKey(1234)
    k = jax.random.fold_in(base, 0)
    p1, _, _, m1 = step(params, opt_state, proto, batch_s, batch_t,
                        forward_target=True, rng=k)
    p2, _, _, m2 = step(params, opt_state, proto, batch_s, batch_t,
                        forward_target=True, rng=k)
    l1 = jax.device_get(jax.tree_util.tree_leaves(p1))
    l2 = jax.device_get(jax.tree_util.tree_leaves(p2))
    for a, b_ in zip(l1, l2):
        np.testing.assert_array_equal(a, b_)
    assert np.isfinite(float(m1["loss_total"]))

    _, _, _, m3 = step(params, opt_state, proto, batch_s, batch_t,
                       forward_target=True,
                       rng=jax.random.fold_in(base, 1))
    assert float(m1["loss_total"]) != float(m3["loss_total"])
