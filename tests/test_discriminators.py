"""Discriminator family unit tests: GA / CA / OUT / CON forward semantics
and gradient-reversal behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.modeling.discriminator.discriminators import (
    FCOSDiscriminator,
    FCOSDiscriminatorCA,
    FCOSDiscriminatorCon,
    FCOSDiscriminatorOut,
)
from scan_tpu.modeling.discriminator.grl import gradient_reversal


def test_grl_forward_identity_backward_negates():
    x = jnp.asarray([1.0, -2.0, 3.0])
    y = gradient_reversal(x, 0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    g = jax.grad(lambda t: jnp.sum(gradient_reversal(t, 0.5) ** 2))(x)
    # d/dt sum(grl(t)^2) = grl_bwd(2*t) = -0.5 * 2t
    np.testing.assert_allclose(np.asarray(g), -0.5 * 2 * np.asarray(x))


@pytest.fixture(scope="module")
def feat():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(2, 8, 10, 64), jnp.float32)


def _score_maps(rng, b=2, h=8, w=10, c=8):
    return {
        "box_cls": jnp.asarray(rng.randn(b, h, w, c), jnp.float32),
        "box_regression": jnp.asarray(
            np.abs(rng.randn(b, h, w, 4)), jnp.float32
        ),
        "centerness": jnp.asarray(rng.randn(b, h, w, 1), jnp.float32),
    }


def test_ga_discriminator_loss_and_domain_separation(feat):
    m = FCOSDiscriminator(num_convs=2, in_channels=64, grl_lambda=0.1)
    params = m.init(jax.random.PRNGKey(0), feat, 1.0)
    l_src = float(m.apply(params, feat, 1.0, "source"))
    l_tgt = float(m.apply(params, feat, 0.0, "target"))
    assert np.isfinite(l_src) and np.isfinite(l_tgt)
    # at init logits ~ 0 -> BCE ~ ln 2 for both labels
    assert abs(l_src - np.log(2)) < 0.2
    # GRL: gradient on the feature is reversed (loss DECREASES along grad)
    g = jax.grad(lambda f: m.apply(params, f, 1.0, "source"))(feat)
    l_step = float(m.apply(params, feat + 1e-2 * g, 1.0, "source"))
    assert l_step <= l_src + 1e-6


@pytest.mark.parametrize("ca_type", ["ca_loss", "ca_feature", "focal"])
def test_ca_discriminator_types(feat, ca_type):
    rng = np.random.RandomState(1)
    sm = _score_maps(rng)
    m = FCOSDiscriminatorCA(
        num_convs=2, in_channels=64, grl_lambda=0.1,
        center_aware_weight=20.0, center_aware_type=ca_type,
    )
    params = m.init(jax.random.PRNGKey(0), feat, 1.0, sm)
    loss = float(m.apply(params, feat, 1.0, sm, "source"))
    assert np.isfinite(loss) and loss >= 0


@pytest.mark.parametrize("outmap_op", ["sigmoid", "maxpool", "attreg", "none"])
@pytest.mark.parametrize("out_loss", ["ce", "focal"])
def test_out_discriminator(outmap_op, out_loss):
    rng = np.random.RandomState(2)
    sm = _score_maps(rng)
    m = FCOSDiscriminatorOut(
        num_convs=2, grl_lambda=0.1, out_weight=0.5, out_loss=out_loss,
        outmap_op=outmap_op, num_classes=9,
    )
    params = m.init(jax.random.PRNGKey(0), sm, 1.0)
    loss = float(m.apply(params, sm, 0.0, "target"))
    assert np.isfinite(loss) and loss >= 0


@pytest.mark.parametrize("fusion", ["concat", "mul", "mul_detached"])
def test_con_discriminator_fusions(feat, fusion):
    rng = np.random.RandomState(3)
    act = jnp.asarray(
        jax.nn.softmax(rng.randn(2, 8, 10, 9), -1), jnp.float32
    )
    m = FCOSDiscriminatorCon(
        num_convs=2, in_channels=64, num_classes=9, fusion_cfg=fusion,
        grl_lambda=0.02,
    )
    params = m.init(jax.random.PRNGKey(0), feat, 1.0, act)
    loss = float(m.apply(params, feat, 1.0, act, "source"))
    assert np.isfinite(loss) and loss >= 0
    # gradients flow into BOTH feature and act maps (GRL on both)
    gf, ga = jax.grad(
        lambda f, a: m.apply(params, f, 1.0, a, "source"), argnums=(0, 1)
    )(feat, act)
    assert float(jnp.abs(gf).max()) > 0
    if fusion != "mul_detached":
        assert float(jnp.abs(ga).max()) > 0


def test_con_single_class_uses_plain_bce(feat):
    act = jnp.asarray(np.random.RandomState(4).rand(2, 8, 10, 2), jnp.float32)
    m = FCOSDiscriminatorCon(
        num_convs=2, in_channels=64, num_classes=2, grl_lambda=0.02,
    )
    params = m.init(jax.random.PRNGKey(0), feat, 1.0, act)
    loss = float(m.apply(params, feat, 1.0, act, "source"))
    assert abs(loss - np.log(2)) < 0.3


@pytest.mark.slow
def test_epm_ga_ca_config_da_step():
    """EPM GA+CA config (da_ga_ca_cityscapes_VGG_16_FPN_4x.yaml): full DA
    step with global + center-aware discriminators on both domains."""
    import os

    from scan_tpu.config import get_default_cfg
    from scan_tpu.engine.train_step import make_da_train_step
    from scan_tpu.modeling.detector import build_detector
    from scan_tpu.solver.build import make_optimizer

    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "epm",
                     "da_ga_ca_cityscapes_VGG_16_FPN_4x.yaml")
    )
    cfg.TPU.MAX_BOXES = 8
    det = build_detector(cfg)
    assert any(k.endswith("_CA") for k in det.dis_modules)
    assert any(not k.endswith("_CA") for k in det.dis_modules)

    rng = np.random.RandomState(0)
    b, h, w, g = 1, 64, 96, 8
    batch_s = dict(
        images=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        sizes=jnp.asarray([[h, w]], jnp.int32),
        boxes=jnp.zeros((b, g, 4)).at[0, 0].set(jnp.asarray([8.0, 8, 60, 56])),
        labels=jnp.zeros((b, g), jnp.int32).at[0, 0].set(1),
        mask=jnp.zeros((b, g), bool).at[0, 0].set(True),
    )
    batch_t = dict(images=jnp.asarray(rng.randn(b, h, w, 3), jnp.float32))
    params, proto = det.init_params(jax.random.PRNGKey(0), batch_s["images"])
    opt = make_optimizer(cfg, params)
    step = make_da_train_step(det, opt)
    _, _, _, metrics = step(params, opt.init(params), proto, batch_s, batch_t,
                            forward_target=False)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert "loss_adv_P3_GA_ds" in metrics
    assert "loss_adv_P3_CA_dt" in metrics
