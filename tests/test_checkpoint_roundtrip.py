"""Full reference-checkpoint loading path: a synthetic torch .pth in the
reference DetectronCheckpointer layout (model_backbone / model_fcos /
middle_head / model_dis_P*_CON) loads into the detector with values landing
at the right leaves."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.detector import build_detector
from scan_tpu.utils.checkpoint import Checkpointer

C2F = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)

VGG_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG_CH = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]


def _make_reference_ckpt(path):
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.01

    backbone = {}
    in_ch = 3
    for idx, ch in zip(VGG_CONV_IDX, VGG_CH):
        backbone[f"body.features.{idx}.weight"] = t(ch, in_ch, 3, 3)
        backbone[f"body.features.{idx}.bias"] = t(ch)
        in_ch = ch
    # FPN: reference names fpn_inner3..5 / fpn_layer3..5 (VGG skips C1, C2)
    for ref_i, cin in zip((3, 4, 5), (256, 512, 512)):
        backbone[f"fpn.fpn_inner{ref_i}.weight"] = t(256, cin, 1, 1)
        backbone[f"fpn.fpn_inner{ref_i}.bias"] = t(256)
        backbone[f"fpn.fpn_layer{ref_i}.weight"] = t(256, 256, 3, 3)
        backbone[f"fpn.fpn_layer{ref_i}.bias"] = t(256)
    backbone["fpn.top_blocks.p6.weight"] = t(256, 256, 3, 3)
    backbone["fpn.top_blocks.p6.bias"] = t(256)
    backbone["fpn.top_blocks.p7.weight"] = t(256, 256, 3, 3)
    backbone["fpn.top_blocks.p7.bias"] = t(256)

    fcos = {}
    for tower in ("cls_tower", "bbox_tower"):
        for i in range(4):
            fcos[f"head.{tower}.{i * 3}.weight"] = t(256, 256, 3, 3)
            fcos[f"head.{tower}.{i * 3}.bias"] = t(256)
            fcos[f"head.{tower}.{i * 3 + 1}.weight"] = t(256)
            fcos[f"head.{tower}.{i * 3 + 1}.bias"] = t(256)
    fcos["head.cls_logits.weight"] = t(8, 256, 3, 3)
    fcos["head.cls_logits.bias"] = t(8)
    fcos["head.bbox_pred.weight"] = t(4, 256, 3, 3)
    fcos["head.bbox_pred.bias"] = t(4)
    fcos["head.centerness.weight"] = t(1, 256, 3, 3)
    fcos["head.centerness.bias"] = t(1)
    for l in range(5):
        fcos[f"head.scales.{l}.scale"] = torch.ones(1)

    mh = {}
    for i in range(2):  # NUM_CONVS_IN = 2
        mh[f"head_in.middle_tower.{i * 3}.weight"] = t(256, 256, 3, 3)
        mh[f"head_in.middle_tower.{i * 3}.bias"] = t(256)
        mh[f"head_in.middle_tower.{i * 3 + 1}.weight"] = t(256)
        mh[f"head_in.middle_tower.{i * 3 + 1}.bias"] = t(256)
    mh["head_out.middle_tower.0.weight"] = t(256, 265, 3, 3)
    mh["head_out.middle_tower.0.bias"] = t(256)
    mh["prototype"] = t(9, 256, 3)
    mh["proto_cls_hidden.weight"] = t(512, 256)
    mh["proto_cls_hidden.bias"] = t(512)
    mh["proto_cls.weight"] = t(9, 512)
    mh["proto_cls.bias"] = t(9)
    for lin in ("linear_q", "linear_k", "linear_v", "linear_final"):
        mh[f"multihead_attn.{lin}.weight"] = t(256, 256)
        mh[f"multihead_attn.{lin}.bias"] = t(256)
    mh["multihead_attn.layer_norm.weight"] = t(256)
    mh["multihead_attn.layer_norm.bias"] = t(256)
    for layer in range(2):
        in_sz = 256 if layer == 0 else 512
        mh[f"cond_rnn.weight_ih_l{layer}"] = t(512, in_sz)
        mh[f"cond_rnn.weight_hh_l{layer}"] = t(512, 512)
        mh[f"cond_rnn.bias_ih_l{layer}"] = t(512)
        mh[f"cond_rnn.bias_hh_l{layer}"] = t(512)
    mh["cond_nx1.weight"] = t(256, 512, 3, 1)
    mh["cond_nx1.bias"] = t(256)
    mh["cond_2.weight"] = t(256, 512)
    mh["cond_2.bias"] = t(256)

    ckpt = {
        "model_backbone": backbone,
        "model_fcos": fcos,
        "middle_head": mh,
    }
    for layer in ("P3", "P4", "P5", "P6", "P7"):
        dis = {}
        for i in range(4):
            dis[f"dis_tower.{i * 3}.weight"] = t(256, 256, 3, 3)
            dis[f"dis_tower.{i * 3}.bias"] = t(256)
            dis[f"dis_tower.{i * 3 + 1}.weight"] = t(256)
            dis[f"dis_tower.{i * 3 + 1}.bias"] = t(256)
        for c in range(8):
            dis[f"classifier_cls_{c}.0.weight"] = t(128, 257, 3, 3)
            dis[f"classifier_cls_{c}.0.bias"] = t(128)
            dis[f"classifier_cls_{c}.2.weight"] = t(1, 128, 3, 3)
            dis[f"classifier_cls_{c}.2.bias"] = t(1)
        ckpt[f"model_dis_{layer}_CON"] = dis
    torch.save(ckpt, path)
    return ckpt


@pytest.mark.slow
def test_full_reference_checkpoint_loads(tmp_path):
    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.TPU.MAX_NODES = 32
    det = build_detector(cfg)
    params, proto = det.init_params(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3))
    )
    ckpt_path = str(tmp_path / "ref.pth")
    ref = _make_reference_ckpt(ckpt_path)

    ckptr = Checkpointer(str(tmp_path / "ck"), det)
    new_params, new_proto, _, _ = ckptr.load(
        ckpt_path, params, proto, None, load_dis=True
    )

    # spot checks: values land at the right leaves with correct transposes
    w = ref["model_backbone"]["body.features.0.weight"].numpy()
    got = np.asarray(
        new_params["backbone"]["params"]["body"]["conv0"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0), atol=1e-6)

    w = ref["model_backbone"]["fpn.fpn_inner3.weight"].numpy()
    got = np.asarray(
        new_params["backbone"]["params"]["fpn"]["fpn_inner1"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0), atol=1e-6)

    w = ref["model_fcos"]["head.cls_tower.3.weight"].numpy()  # 2nd conv
    got = np.asarray(
        new_params["fcos"]["params"]["cls_tower"]["conv1"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0), atol=1e-6)

    gn = ref["model_fcos"]["head.cls_tower.4.weight"].numpy()  # 2nd GN scale
    got = np.asarray(
        new_params["fcos"]["params"]["cls_tower"]["gn1"]["GroupNorm_0"]["scale"]
    )
    np.testing.assert_allclose(got, gn, atol=1e-6)

    # prototype buffer restored (and counter preserved)
    np.testing.assert_allclose(
        np.asarray(new_proto.prototype),
        ref["middle_head"]["prototype"].numpy(), atol=1e-6,
    )

    # discriminator per-class heads land correctly
    w = ref["model_dis_P3_CON"]["classifier_cls_2.0.weight"].numpy()
    got = np.asarray(
        new_params["dis_P3_CON"]["params"]["classifier_cls_2_0"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0), atol=1e-6)

    # load_dis=False keeps discriminators at init
    p2, _, _, _ = Checkpointer(str(tmp_path / "ck2"), det).load(
        ckpt_path, params, proto, None, load_dis=False
    )
    a = np.asarray(params["dis_P3_CON"]["params"]["classifier_cls_2_0"]["Conv_0"]["kernel"])
    b = np.asarray(p2["dis_P3_CON"]["params"]["classifier_cls_2_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(a, b)

    # the loaded model still runs inference
    out = det.forward_inference(
        new_params, new_proto, jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64, 96]], jnp.int32),
    )
    assert np.all(np.isfinite(np.asarray(out["scores"])))


@pytest.mark.slow
def test_eval_partial_restore_of_training_checkpoint(tmp_path):
    """A training checkpoint (with opt_state) restores for evaluation,
    where no optimizer target exists — the extra on-disk state is dropped
    (reference remove_solver_states workflow; tools/test_net.py)."""
    import optax

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F)
    cfg.TPU.MAX_NODES = 32
    cfg.TPU.MAX_TARGET_POINTS = 32
    det = build_detector(cfg)
    params, proto = det.init_params(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3))
    )
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)
    ck = Checkpointer(str(tmp_path / "train"), det)
    path = ck.save("model_x", params, proto, opt_state, iteration=7)

    # fresh eval-side checkpointer: no optimizer, different init
    det2 = build_detector(cfg)
    p2, pr2 = det2.init_params(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 96, 3))
    )
    ck2 = Checkpointer(str(tmp_path / "eval"), det2)
    p3, pr3, _, it = ck2.load(path, p2, pr2, None, load_dis=False)
    assert it == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p3)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(proto.prototype), np.asarray(pr3.prototype)
    )


def test_incompatible_checkpoint_refused(tmp_path):
    """A checkpoint missing target params must NOT silently 'load' with the
    target keeping its random init (advisor r2: the transforms={} fallback
    made any structure mismatch a silent partial restore)."""
    ck = Checkpointer(str(tmp_path / "a"))
    params = {"m": {"w": np.ones((2, 2), np.float32)}}
    path = ck.save("model_x", params, None, None, iteration=1)

    ck2 = Checkpointer(str(tmp_path / "b"))
    bad_target = {
        "m": {"w": np.zeros((2, 2), np.float32)},
        "extra_module": {"w2": np.zeros(3, np.float32)},
    }
    with pytest.raises(ValueError, match="extra_module"):
        ck2.load(path, bad_target, None, None)


def test_partial_restore_drops_only_known_extras(tmp_path):
    """Restoring a training checkpoint (with opt_state) into an eval target
    (without) stays allowed — toy-scale version of the slow e2e test."""
    import optax

    ck = Checkpointer(str(tmp_path / "a"))
    params = {"m": {"w": np.ones((2, 2), np.float32)}}
    opt_state = optax.sgd(0.1).init(params)
    path = ck.save("model_x", params, None, opt_state, iteration=3)

    ck2 = Checkpointer(str(tmp_path / "b"))
    target = {"m": {"w": np.zeros((2, 2), np.float32)}}
    p, _, _, it = ck2.load(path, target, None, None)
    assert it == 3
    np.testing.assert_allclose(np.asarray(p["m"]["w"]), params["m"]["w"])
