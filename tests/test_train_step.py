"""End-to-end DA train step on tiny shapes with the real C2F config."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.detector import build_detector
from scan_tpu.engine.train_step import make_da_train_step
from scan_tpu.solver.build import make_optimizer

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)

pytestmark = pytest.mark.slow  # full DA-step compiles dominate


def tiny_cfg():
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.TPU.MAX_NODES = 64
    cfg.TPU.MAX_TARGET_POINTS = 64
    cfg.TPU.MAX_BOXES = 8
    return cfg


def make_batches(rng, b=1, h=64, w=96, g=8):
    imgs_s = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    imgs_t = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    boxes = np.zeros((b, g, 4), np.float32)
    labels = np.zeros((b, g), np.int32)
    mask = np.zeros((b, g), bool)
    boxes[0, 0] = [8, 8, 40, 48]
    labels[0, 0] = 2
    mask[0, 0] = True
    boxes[0, 1] = [30, 20, 60, 60]
    labels[0, 1] = 7
    mask[0, 1] = True
    batch_s = dict(
        images=imgs_s,
        sizes=jnp.asarray([[h, w]] * b, jnp.int32),
        boxes=jnp.asarray(boxes),
        labels=jnp.asarray(labels),
        mask=jnp.asarray(mask),
    )
    batch_t = dict(images=imgs_t)
    return batch_s, batch_t


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    det = build_detector(cfg)
    rng = np.random.RandomState(0)
    batch_s, batch_t = make_batches(rng)
    params, proto = det.init_params(jax.random.PRNGKey(0), batch_s["images"])
    return cfg, det, params, proto, batch_s, batch_t


def test_model_dict_keys(setup):
    cfg, det, params, proto, *_ = setup
    assert set(params) == {
        "backbone", "middle_head", "fcos",
        "dis_P3_CON", "dis_P4_CON", "dis_P5_CON", "dis_P6_CON", "dis_P7_CON",
    }
    assert proto.prototype.shape == (9, 256, 3)


def test_da_train_step_runs_and_updates(setup):
    cfg, det, params, proto, batch_s, batch_t = setup
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)

    p1, os1, proto1, metrics = step(params, opt_state, proto, batch_s, batch_t,
                                    forward_target=False)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # G losses present
    for k in ("loss_cls_gs", "loss_reg_gs", "loss_centerness_gs",
              "node_loss_gs", "act_loss_gs"):
        assert k in metrics, sorted(metrics)
    # CKA discriminator losses present for both domains
    assert "loss_adv_P3_CON_ds" in metrics
    assert "loss_adv_P7_CON_dt" in metrics
    # params changed
    old = params["fcos"]["params"]["cls_logits"]["Conv_0"]["kernel"]
    new = p1["fcos"]["params"]["cls_logits"]["Conv_0"]["kernel"]
    assert float(jnp.abs(old - new).max()) > 0
    # prototype EMA advanced
    assert int(proto1.counter) == 0
    assert float(jnp.abs(proto1.prototype - proto.prototype).max()) > 0


def test_da_train_step_forward_target(setup):
    cfg, det, params, proto, batch_s, batch_t = setup
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)
    p1, os1, proto1, metrics = step(params, opt_state, proto, batch_s, batch_t,
                                    forward_target=True)
    assert "transfer_loss_gt" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_frozen_vgg_stages_receive_no_grad(setup):
    cfg, det, params, proto, batch_s, batch_t = setup
    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)
    p1, *_ = step(params, opt_state, proto, batch_s, batch_t, False)
    # conv0..conv3 are in the two frozen stages
    for name in ("conv0", "conv3"):
        old = params["backbone"]["params"]["body"][name]["Conv_0"]["kernel"]
        new = p1["backbone"]["params"]["body"][name]["Conv_0"]["kernel"]
        assert float(jnp.abs(old - new).max()) == 0.0, name
    # conv4 (stage 3) must train
    old = params["backbone"]["params"]["body"]["conv4"]["Conv_0"]["kernel"]
    new = p1["backbone"]["params"]["body"]["conv4"]["Conv_0"]["kernel"]
    assert float(jnp.abs(old - new).max()) > 0


def test_inference_path(setup):
    cfg, det, params, proto, batch_s, batch_t = setup
    out = det.forward_inference(
        params, proto, batch_s["images"], batch_s["sizes"]
    )
    assert out["boxes"].shape == (1, 100, 4)
    assert out["scores"].shape == (1, 100)
    assert np.all(np.isfinite(np.asarray(out["scores"])))
