"""Numeric parity against the actual torch reference, run side-by-side on CPU.

The strongest available stand-in for the published 42.3 mAP@50 target
(reference README.md:71) without datasets or released weights: build the
reference model (pure PyTorch via ``reference_harness``), convert its live
weights through this repo's checkpoint converter, push identical inputs
through both stacks, and assert stage-by-stage agreement:

  * VGG16+FPN feature maps        (fcos_core/modeling/backbone/{vgg16,fpn}.py)
  * condgraph inference: conded kernels, act maps, post-processed features
                                  (fcos_core/modeling/rpn/fcos/condgraph.py)
  * FCOS head outputs             (fcos_core/modeling/rpn/fcos/fcos.py:90-114)
  * decoded boxes under all three TEST.MODEs
                                  (fcos_core/modeling/rpn/fcos/inference.py)
  * source-pass losses + prototype EMA
                                  (condgraph.py:423-463, loss.py:151-236)
"""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_harness import (
    build_ref_modules,
    checkpoint_dict,
    make_boxlist,
    ref_cfg,
    to_image_list,
)
from scan_tpu.config import get_default_cfg
from scan_tpu.modeling.detector import build_detector
from scan_tpu.utils.checkpoint import Checkpointer

C2F_YAML = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)
REF_YAML = "/root/reference/configs/scan/scan_vgg16_cityscapace_to_foggy.yaml"

H, W = 128, 160
BATCH = 2

pytestmark = pytest.mark.slow


def _disable_dropout(modules):
    for m in modules.values():
        for sub in m.modules():
            if isinstance(sub, torch.nn.Dropout):
                sub.p = 0.0


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    """(ref modules, my detector, my params, my proto_state, images)."""
    tmp = tmp_path_factory.mktemp("parity")
    cfg_ref = ref_cfg(REF_YAML)
    mods = build_ref_modules(cfg_ref, seed=0)
    _disable_dropout(mods)
    # non-trivial prototype so conded kernels/act maps are informative
    g = torch.Generator().manual_seed(7)
    mh = mods["middle_head"]
    mh.prototype.data = torch.randn(mh.prototype.shape, generator=g) * 0.5
    # At LayerNorm init (bias 0) the per-class node means sum to ~1e-7, so
    # the reference's `prototype_batch.sum(-1).bool()` exist gate
    # (condgraph.py:560) is a coin flip of summation order. A trained
    # checkpoint has non-zero LN bias; emulate that so both stacks agree
    # on which classes exist.
    mh.multihead_attn.layer_norm.bias.data = (
        torch.randn(256, generator=g) * 0.05
    )

    ckpt_path = str(tmp / "ref_weights.pth")
    torch.save(checkpoint_dict(mods), ckpt_path)

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F_YAML)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_BOXES = 8
    det = build_detector(cfg)

    import jax

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    params, proto_state = det.init_params(rng, sample)
    ckptr = Checkpointer(str(tmp / "ckpt"), det)
    params, proto_state = ckptr._load_torch(ckpt_path, params, proto_state, True)

    rs = np.random.RandomState(3)
    images = rs.randn(BATCH, H, W, 3).astype(np.float32) * 20.0
    return mods, det, params, proto_state, images


def _t_images(images):
    return torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))


def _close(mine, ref_nchw, tol, what):
    """mine: jax NHWC; ref: torch NCHW."""
    a = np.asarray(mine)
    b = ref_nchw.detach().numpy().transpose(0, 2, 3, 1)
    scale = max(np.abs(b).max(), 1e-3)
    diff = np.abs(a - b).max() / scale
    assert diff < tol, f"{what}: rel diff {diff:.2e} (tol {tol:.0e})"


def test_backbone_fpn_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
    my_feats = det.backbone.apply(params["backbone"], jnp.asarray(images))
    assert len(my_feats) == len(ref_feats) == 5
    for lvl, (a, b) in enumerate(zip(my_feats, ref_feats)):
        _close(a, b, 2e-4, f"FPN P{lvl + 3}")


def test_condgraph_inference_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
    my_feats = list(det.backbone.apply(params["backbone"], jnp.asarray(images)))
    my_out, _, my_maps, _ = det.middle_head.apply(
        params["middle_head"], my_feats, proto_state, "inference"
    )
    for lvl, (a, b) in enumerate(zip(my_maps, ref_maps)):
        _close(a, b, 1e-4, f"act map P{lvl + 3}")
    for lvl, (a, b) in enumerate(zip(my_out, ref_out)):
        _close(a, b, 5e-4, f"condgraph features P{lvl + 3}")


def test_fcos_head_parity(stacks):
    mods, det, params, proto_state, images = stacks
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
        mods["fcos"].head.mode = "common"  # compute the cls tower
        logits_r, reg_r, ctr_r = mods["fcos"].head(ref_out)
    my_feats = list(det.backbone.apply(params["backbone"], jnp.asarray(images)))
    my_out, _, my_maps, _ = det.middle_head.apply(
        params["middle_head"], my_feats, proto_state, "inference"
    )
    logits, reg, ctr = det.fcos_head.apply(params["fcos"], my_out, True)
    for lvl in range(5):
        _close(logits[lvl], logits_r[lvl], 5e-4, f"cls logits P{lvl + 3}")
        _close(reg[lvl], reg_r[lvl], 5e-3, f"bbox reg P{lvl + 3}")
        _close(ctr[lvl], ctr_r[lvl], 5e-4, f"centerness P{lvl + 3}")


@pytest.mark.parametrize("mode", ["common", "precision", "light"])
def test_boxes_parity(stacks, mode):
    """Final decoded boxes match under every TEST.MODE
    (reference fcos.py:163-172 mixing + inference.py decode/NMS)."""
    import dataclasses

    mods, det, params, proto_state, images = stacks
    mods["fcos"].mode = mode
    mods["fcos"].head.mode = mode
    with torch.no_grad():
        ref_feats = mods["backbone"](_t_images(images))
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        ref_out, _, _, ref_maps = mods["middle_head"](
            il, ref_feats, mode="inference"
        )
        ref_boxes, _, _ = mods["fcos"](il, ref_out, act_maps=ref_maps)

    det.test_mode = mode
    sizes = jnp.asarray([[H, W]] * BATCH, jnp.int32)
    out = det.forward_inference(
        params, proto_state, jnp.asarray(images), sizes
    )

    for b in range(BATCH):
        rb = ref_boxes[b]
        r_boxes = rb.bbox.numpy()
        r_scores = rb.get_field("scores").numpy()
        r_labels = rb.get_field("labels").numpy()
        valid = np.asarray(out["valid"][b])
        m_boxes = np.asarray(out["boxes"][b])[valid]
        m_scores = np.asarray(out["scores"][b])[valid]
        m_labels = np.asarray(out["labels"][b])[valid]
        assert len(m_boxes) == len(r_boxes), (
            f"mode={mode} img{b}: {len(m_boxes)} boxes vs ref {len(r_boxes)}"
        )
        # order-insensitive match: greedily pair each ref det to a mine det
        used = np.zeros(len(m_boxes), bool)
        for i in range(len(r_boxes)):
            d_box = np.abs(m_boxes - r_boxes[i]).max(axis=1)
            d_scr = np.abs(m_scores - r_scores[i])
            ok = (d_box < 1e-2) & (d_scr < 1e-3) & (m_labels == r_labels[i]) & ~used
            j = int(np.argmax(ok))
            assert ok.any(), (
                f"mode={mode} img{b}: no match for ref det {i} "
                f"(box {r_boxes[i]}, score {r_scores[i]:.4f}, "
                f"label {r_labels[i]})"
            )
            used[j] = True


# --------------------------------------------------------------------- #
# training-pass parity
# --------------------------------------------------------------------- #

BOXES = [
    np.array([[12.0, 10.0, 60.0, 52.0], [70.0, 30.0, 130.0, 100.0],
              [20.0, 70.0, 100.0, 118.0]]),
    np.array([[8.0, 8.0, 40.0, 44.0], [60.0, 20.0, 150.0, 90.0]]),
]
LABELS = [np.array([1, 3, 5]), np.array([2, 7])]


def _targets_ref():
    return [
        make_boxlist(BOXES[i], LABELS[i], (W, H)) for i in range(BATCH)
    ]


def _targets_mine(max_boxes=8):
    b = np.zeros((BATCH, max_boxes, 4), np.float32)
    l = np.zeros((BATCH, max_boxes), np.int32)
    m = np.zeros((BATCH, max_boxes), bool)
    for i in range(BATCH):
        n = len(LABELS[i])
        b[i, :n] = BOXES[i]
        l[i, :n] = LABELS[i]
        m[i, :n] = True
    return {
        "boxes": jnp.asarray(b),
        "labels": jnp.asarray(l),
        "mask": jnp.asarray(m),
    }


def _scalar(x):
    return float(np.asarray(x))


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-6)


def _count_source_nodes(mods, images):
    """Ref node count for this batch (loss.py:425-466): all positives plus
    an equal number of balanced-BG points per level."""
    mh = mods["middle_head"]
    with torch.no_grad():
        feats = mods["backbone"](_t_images(images))
        f_in = mh.head_in(list(feats))
        locs = mh.compute_locations(f_in)
        pts, labs, _ = mh.prototype_evaluator(locs, f_in, _targets_ref())
    return int(pts.shape[0])


def test_source_pass_parity(stacks):
    """Same batch through both source training passes: node/act/fcos losses
    and the post-EMA prototype agree (condgraph.py:423-463, loss.py:151-236).

    The reference MHA's raw-view head split makes aggregation depend on the
    total node count, so my fixed capacity is pinned to the reference's
    actual count for this batch (production pads; see PARITY.md).
    """
    mods, det, params, proto_state, images = stacks
    n_nodes = _count_source_nodes(mods, images)
    assert n_nodes > 8

    mh = mods["middle_head"]
    snap_proto = mh.prototype.data.clone()
    snap_cnt = mh.counter_rnn.counter if hasattr(mh, "counter_rnn") else None
    try:
        for m in mods.values():
            m.train()
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        feats = mods["backbone"](_t_images(images))
        ref_out, (node_loss_r, _), act_loss_r, ref_maps = mh(
            il, feats, targets=_targets_ref(), mode="source"
        )
        _, fl_r, _ = mods["fcos"](
            il, ref_out, targets=_targets_ref(), return_maps=True,
            act_maps=ref_maps,
        )
        proto_after_r = mh.prototype.data.clone()
    finally:
        mh.prototype.data = snap_proto
        if snap_cnt is not None:
            mh.counter_rnn.counter = snap_cnt
        for m in mods.values():
            m.eval()

    cfg2 = get_default_cfg()
    cfg2.merge_from_file(C2F_YAML)
    cfg2.TPU.COMPUTE_DTYPE = "float32"
    cfg2.TPU.MAX_BOXES = 8
    cfg2.TPU.MAX_NODES = n_nodes
    det2 = build_detector(cfg2)
    losses, _, _, _, new_state = det2.forward_train(
        params, proto_state, jnp.asarray(images), _targets_mine(), "source"
    )

    for mine_key, ref_val in (
        ("node_loss", node_loss_r),
        ("act_loss", act_loss_r),
        ("loss_cls", fl_r["loss_cls"]),
        ("loss_reg", fl_r["loss_reg"]),
        ("loss_centerness", fl_r["loss_centerness"]),
    ):
        a = _scalar(losses[mine_key])
        b = float(ref_val.detach())
        assert _rel(a, b) < 1e-3, f"{mine_key}: {a} vs ref {b}"

    d = np.abs(np.asarray(new_state.prototype) - proto_after_r.numpy()).max()
    assert d < 1e-3, f"prototype EMA diverged: max abs {d}"


@pytest.fixture(scope="module")
def stacks_st(tmp_path_factory):
    """Second stack pair with score_threshold target sampling — the one
    deterministic target sampler, so the GST transfer loss is comparable
    exactly (dbscan deviates by design, PARITY.md #3-4)."""
    tmp = tmp_path_factory.mktemp("parity_st")
    opts = [
        "MODEL.MIDDLE_HEAD.TARGET_SAMPLING_CFG", "score_threshold",
        "SOLVER.MIDDLE_HEAD.PLABEL_TH", "(0.45, 1.0)",
    ]
    cfg_ref = ref_cfg(REF_YAML, opts)
    mods = build_ref_modules(cfg_ref, seed=1)
    _disable_dropout(mods)
    g = torch.Generator().manual_seed(11)
    mh = mods["middle_head"]
    mh.prototype.data = torch.randn(mh.prototype.shape, generator=g) * 0.8
    mh.multihead_attn.layer_norm.bias.data = (
        torch.randn(256, generator=g) * 0.05
    )  # see stacks fixture: keeps the exist gate off the float knife edge

    ckpt_path = str(tmp / "ref_weights.pth")
    torch.save(checkpoint_dict(mods), ckpt_path)

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F_YAML)
    cfg.merge_from_list(opts)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_BOXES = 8
    det = build_detector(cfg)

    import jax

    rng = jax.random.PRNGKey(1)
    sample = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    params, proto_state = det.init_params(rng, sample)
    ckptr = Checkpointer(str(tmp / "ckpt"), det)
    params, proto_state = ckptr._load_torch(ckpt_path, params, proto_state, True)

    rs = np.random.RandomState(5)
    images = rs.randn(BATCH, H, W, 3).astype(np.float32) * 20.0
    return mods, det, params, proto_state, images, cfg


def test_target_pass_parity(stacks_st):
    """GST target pass under score_threshold sampling: pseudo-label nodes
    and the NODES+ADJ transfer loss agree (condgraph.py:500-534)."""
    mods, det, params, proto_state, images, cfg = stacks_st
    mh = mods["middle_head"]

    # ref candidate count for capacity pinning
    with torch.no_grad():
        feats = mods["backbone"](_t_images(images))
        f_in = mh.head_in(list(feats))
        conded = mh.get_conded_weight()
        act_maps = [
            mh.dynamic_conv(f, conded).softmax(dim=1) for f in f_in
        ]
        pts, labs, _ = mh.prototype_evaluator(None, f_in, act_maps)
    assert pts is not None and pts.shape[0] > 4, "no target candidates"
    n_nodes = int(pts.shape[0])

    snap_proto = mh.prototype.data.clone()
    try:
        for m in mods.values():
            m.train()
        il = to_image_list(list(torch.zeros(BATCH, 3, H, W)))
        feats = mods["backbone"](_t_images(images))
        ref_out, ref_losses, _, ref_maps = mh(
            il, feats, targets=None, mode="target", forward_target=True
        )
        assert ref_losses is not None
        _, transfer_r = ref_losses
    finally:
        mh.prototype.data = snap_proto
        for m in mods.values():
            m.eval()

    cfg2 = cfg.clone()
    cfg2.TPU.MAX_NODES = n_nodes
    det2 = build_detector(cfg2)
    losses, _, _, _, _ = det2.forward_train(
        params, proto_state, jnp.asarray(images), None, "target",
        forward_target=True,
    )
    a = _scalar(losses["transfer_loss"])
    b = float(transfer_r.detach())
    assert _rel(a, b) < 1e-3, f"transfer loss {a} vs ref {b}"


def test_con_discriminator_parity(stacks):
    """CKA discriminator (fcos_head_discriminator_con.py): loss value and
    input gradient (GRL direction/scale) agree."""
    from fcos_core.modeling.discriminator import FCOSDiscriminator_con

    from scan_tpu.modeling.discriminator.discriminators import (
        FCOSDiscriminatorCon,
    )
    from scan_tpu.utils.torch_weights import convert_con_discriminator

    import jax

    torch.manual_seed(42)
    ref = FCOSDiscriminator_con(
        fusion_cfg="concat", num_convs=4, num_classes=9,
        grad_reverse_lambda=0.02, grl_applied_domain="both",
    ).float()
    _disable_dropout({"d": ref})
    mine = FCOSDiscriminatorCon(
        num_convs=4, num_classes=9, fusion_cfg="concat", grl_lambda=0.02,
        grl_applied_domain="both", with_ga=False,
    )
    converted = convert_con_discriminator(ref.state_dict(), num_convs=4, num_fg=8)

    rs = np.random.RandomState(9)
    feat = rs.randn(BATCH, 16, 20, 256).astype(np.float32)
    act = jax.nn.softmax(
        jnp.asarray(rs.randn(BATCH, 16, 20, 9).astype(np.float32)), axis=-1
    )
    feat_t = torch.from_numpy(feat.transpose(0, 3, 1, 2)).requires_grad_(True)
    act_t = torch.from_numpy(np.asarray(act).transpose(0, 3, 1, 2))

    loss_r = ref(feat_t, 1, act_maps=act_t, domain="source")
    loss_r.backward()
    grad_r = feat_t.grad.detach().numpy().transpose(0, 2, 3, 1)

    def loss_fn(f):
        return mine.apply(converted, f, 1.0, act, "source")

    loss_m, grad_m = jax.value_and_grad(loss_fn)(jnp.asarray(feat))
    assert _rel(_scalar(loss_m), float(loss_r.detach())) < 1e-4, (
        f"CON loss {float(loss_m)} vs ref {float(loss_r)}"
    )
    gd = np.abs(np.asarray(grad_m) - grad_r).max()
    gs = max(np.abs(grad_r).max(), 1e-9)
    # grads are ~1e-7 (lambda 0.02 x near-prior logits): allow f32 noise
    assert gd < 1e-8 + 2e-2 * gs, f"CON input grad diff {gd:.2e} (scale {gs:.2e})"
