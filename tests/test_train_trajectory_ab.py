"""Training-TRAJECTORY A/B against the torch reference (VERDICT r4 #6).

The strongest checkpoint-parity proxy available without datasets or
released weights: start BOTH stacks from identical converted weights,
feed identical synthetic batches, and run the full DA optimization for
dozens of steps in each — the reference's three-``backward()`` loop with
one SGD optimizer per module (reference ``fcos_core/engine/trainer.py:
241-424``, ``tools/train_net_da.py:53-66,305-344``) vs this repo's single
fused ``value_and_grad`` step + one ``optax.multi_transform``
(``scan_tpu/engine/train_step.py``, ``solver/build.py``). Per-step
loss trajectories must agree within a drift tolerance that accounts for
f32 reduction-order divergence compounding through SGD momentum.

Scope notes:
  * ``forward_target=False`` for the whole trajectory: the target GST
    pass's density clustering is this repo's one documented numerical
    deviation (PARITY.md #3-4, on-device fixed-iteration vs CPU
    sklearn), so including it would A/B the deviation, not the step.
    The exercised surface is still the full fused claim: source G pass
    (backbone+condgraph+FCOS losses+prototype EMA) + CKA discriminators
    on BOTH domains through the GRL, + per-module LR/momentum/WD/warmup.
  * Box geometry is FIXED across steps (image content varies) so the
    reference's source node count — and therefore this repo's pinned
    ``TPU.MAX_NODES`` capacity — is one constant (the reference MHA's
    raw-view head split makes aggregation depend on the node count, see
    test_reference_parity.py).
  * Dropout off in both stacks (the only train-time stochasticity).

Run standalone for the drift profile:  python tests/test_train_trajectory_ab.py
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import (
    build_ref_modules,
    checkpoint_dict,
    make_boxlist,
    ref_cfg,
    setup_reference,
)
from scan_tpu.config import get_default_cfg
from scan_tpu.engine.train_step import make_da_train_step
from scan_tpu.modeling.detector import build_detector
from scan_tpu.solver.build import make_optimizer
from scan_tpu.utils.checkpoint import Checkpointer

C2F_YAML = os.path.join(
    os.path.dirname(__file__), "..", "configs", "scan",
    "scan_vgg16_cityscapace_to_foggy.yaml",
)
REF_YAML = "/root/reference/configs/scan/scan_vgg16_cityscapace_to_foggy.yaml"

H, W = 128, 160
BATCH = 2
N_STEPS = 50
LAYERS = ["P7", "P6", "P5", "P4", "P3"]  # reference registration order

# fixed per-slot geometry -> constant source node count across steps
BOXES = [
    np.array([[12.0, 10.0, 60.0, 52.0], [70.0, 30.0, 130.0, 100.0],
              [20.0, 70.0, 100.0, 118.0]]),
    np.array([[8.0, 8.0, 40.0, 44.0], [60.0, 20.0, 150.0, 90.0]]),
]
LABELS = [np.array([1, 3, 5]), np.array([2, 7])]

pytestmark = pytest.mark.slow


def _images(step, domain):
    rs = np.random.RandomState(1000 * (1 if domain == "source" else 2) + step)
    return (rs.randn(BATCH, H, W, 3).astype(np.float32) * 20.0
            + (10.0 if domain == "target" else 0.0))


def _targets_ref():
    return [make_boxlist(BOXES[i], LABELS[i], (W, H)) for i in range(BATCH)]


def _targets_mine(max_boxes=8):
    b = np.zeros((BATCH, max_boxes, 4), np.float32)
    l = np.zeros((BATCH, max_boxes), np.int32)
    m = np.zeros((BATCH, max_boxes), bool)
    for i in range(BATCH):
        n = len(LABELS[i])
        b[i, :n] = BOXES[i]
        l[i, :n] = LABELS[i]
        m[i, :n] = True
    return {"boxes": jnp.asarray(b), "labels": jnp.asarray(l),
            "mask": jnp.asarray(m)}


def _disable_dropout(modules):
    for m in modules.values():
        for sub in m.modules():
            if isinstance(sub, torch.nn.Dropout):
                sub.p = 0.0


def _build_ref_stack(cfg_ref, seed=0):
    """Full reference MODEL dict + per-module optimizers/schedulers
    (reference tools/train_net_da.py:43-66, 225-344)."""
    setup_reference()
    from fcos_core.modeling.discriminator import FCOSDiscriminator_con
    from fcos_core.solver import make_lr_scheduler
    from fcos_core.solver import make_optimizer as ref_make_optimizer

    mods = build_ref_modules(cfg_ref, seed=seed)
    torch.manual_seed(seed + 100)
    for layer in LAYERS:
        mods[f"dis_{layer}_CON"] = FCOSDiscriminator_con(
            with_GA=cfg_ref.MODEL.ADV.CON_WITH_GA,
            fusion_cfg=cfg_ref.MODEL.ADV.CON_FUSUIN_CFG,
            num_convs=getattr(
                cfg_ref.MODEL.ADV, f"CON_NUM_SHARED_CONV_{layer}"
            ),
            grad_reverse_lambda=getattr(
                cfg_ref.MODEL.ADV, f"GRL_WEIGHT_{layer}"
            ),
            grl_applied_domain=cfg_ref.MODEL.ADV.GRL_APPLIED_DOMAIN,
            num_classes=cfg_ref.MODEL.FCOS.NUM_CLASSES,
            cfg=cfg_ref,
        ).float()
    _disable_dropout(mods)

    optims, scheds = {}, {}
    for name, m in mods.items():
        group = "discriminator" if name.startswith("dis_") else name
        optims[name] = ref_make_optimizer(cfg_ref, m, name=group)
        scheds[name] = make_lr_scheduler(cfg_ref, optims[name], name=group)
    return mods, optims, scheds


def _count_source_nodes(mods, images):
    mh = mods["middle_head"]
    with torch.no_grad():
        feats = mods["backbone"](_t_images(images))
        f_in = mh.head_in(list(feats))
        locs = mh.compute_locations(f_in)
        pts, _, _ = mh.prototype_evaluator(locs, f_in, _targets_ref())
    return int(pts.shape[0])


def _t_images(images):
    return torch.from_numpy(np.ascontiguousarray(images.transpose(0, 3, 1, 2)))


def _ref_step(cfg_ref, mods, optims, scheds, images_s, images_t, con_lambda):
    """One reference DA iteration (trainer.py:266-424), CON-only config."""
    from fcos_core.engine.trainer import foward_detector

    for m in mods.values():
        m.train()
    for k in optims:
        optims[k].zero_grad()
    rec = {}

    # ---- (1) G on source ----
    loss_dict, feats_s, maps_s = foward_detector(
        cfg_ref, mods, _t_images(images_s), targets=_targets_ref(),
        return_maps=True, mode="source",
    )
    loss_dict = {k + "_gs": v for k, v in loss_dict.items()}
    rec.update({k: float(v.detach()) for k, v in loss_dict.items()})
    sum(loss_dict.values()).backward(retain_graph=True)

    # ---- (2) D on source ----
    loss_dict2 = {"zeros": 0 * loss_dict["node_loss_gs"]}
    for layer in LAYERS:
        loss_dict2[f"loss_adv_{layer}_CON_ds"] = con_lambda * mods[
            f"dis_{layer}_CON"
        ](feats_s[layer], 1.0, maps_s[layer], domain="source")
    rec.update({k: float(v.detach()) for k, v in loss_dict2.items()})
    sum(loss_dict2.values()).backward()

    # ---- (3) D on target (forward_target=False: no GST) ----
    loss_dict3, feats_t, maps_t = foward_detector(
        cfg_ref, mods, _t_images(images_t), targets=None,
        return_maps=True, mode="target", forward_target=False,
    )
    loss_dict3 = {k + "_gt": v for k, v in loss_dict3.items()}
    for layer in LAYERS:
        loss_dict3[f"loss_adv_{layer}_CON_dt"] = con_lambda * mods[
            f"dis_{layer}_CON"
        ](feats_t[layer], 0.0, maps_t[layer], domain="target")
    rec.update({k: float(v.detach()) for k, v in loss_dict3.items()})
    sum(loss_dict3.values()).backward()

    for k in optims:
        optims[k].step()
    for k in scheds:
        scheds[k].step()
    for m in mods.values():
        m.eval()
    rec["loss_total"] = sum(
        v for k, v in rec.items() if k not in ("zeros",)
    )
    return rec


def run_trajectory(n_steps=N_STEPS, seed=0):
    """Returns (ref_records, my_records): per-step loss dicts."""
    cfg_ref = ref_cfg(REF_YAML)
    mods, optims, scheds = _build_ref_stack(cfg_ref, seed=seed)
    mh = mods["middle_head"]
    g = torch.Generator().manual_seed(7)
    mh.prototype.data = torch.randn(mh.prototype.shape, generator=g) * 0.5
    mh.multihead_attn.layer_norm.bias.data = (
        torch.randn(256, generator=g) * 0.05
    )  # keep the class-exist gate off the float knife edge (see parity test)

    n_nodes = _count_source_nodes(mods, _images(0, "source"))
    assert n_nodes > 8

    import tempfile

    tmp = tempfile.mkdtemp(prefix="traj_ab_")
    ckpt_path = os.path.join(tmp, "ref_weights.pth")
    torch.save(checkpoint_dict(mods), ckpt_path)
    # discriminators use the reference checkpoint key layout model_dis_*_CON
    ck = torch.load(ckpt_path, weights_only=False)
    for layer in LAYERS:
        ck[f"model_dis_{layer}_CON"] = {
            k: v.detach().clone()
            for k, v in mods[f"dis_{layer}_CON"].state_dict().items()
        }
    torch.save(ck, ckpt_path)

    cfg = get_default_cfg()
    cfg.merge_from_file(C2F_YAML)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MAX_BOXES = 8
    cfg.TPU.MAX_NODES = n_nodes
    cfg.MODEL.MIDDLE_HEAD.ATT_DROPOUT = 0.0
    det = build_detector(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    params, proto_state = det.init_params(rng, sample)
    ckptr = Checkpointer(os.path.join(tmp, "ckpt"), det)
    params, proto_state = ckptr._load_torch(ckpt_path, params, proto_state,
                                            True)

    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    step = make_da_train_step(det, opt)

    con_lambda = cfg_ref.MODEL.ADV.CON_DIS_LAMBDA
    ref_recs, my_recs = [], []
    tm = _targets_mine()
    for it in range(n_steps):
        images_s = _images(it, "source")
        images_t = _images(it, "target")
        ref_recs.append(
            _ref_step(cfg_ref, mods, optims, scheds, images_s, images_t,
                      con_lambda)
        )
        batch_s = dict(images=jnp.asarray(images_s), **tm)
        batch_t = {"images": jnp.asarray(images_t)}
        params, opt_state, proto_state, metrics = step(
            params, opt_state, proto_state, batch_s, batch_t,
            forward_target=False,
        )
        my_recs.append({k: float(v) for k, v in metrics.items()})
    return ref_recs, my_recs


def _drift(ref_recs, my_recs, key_map):
    rows = []
    for it, (r, m) in enumerate(zip(ref_recs, my_recs)):
        row = {}
        for rk, mk in key_map.items():
            a, b = m[mk], r[rk]
            row[rk] = abs(a - b) / max(abs(b), 1e-6)
        rows.append(row)
    return rows


# reference key -> my metric key (zero_gt / zeros are identically 0)
KEY_MAP = {
    "loss_total": "loss_total",
    "loss_cls_gs": "loss_cls_gs",
    "loss_reg_gs": "loss_reg_gs",
    "loss_centerness_gs": "loss_centerness_gs",
    "node_loss_gs": "node_loss_gs",
    "act_loss_gs": "act_loss_gs",
    "loss_adv_P3_CON_ds": "loss_adv_P3_CON_ds",
    "loss_adv_P7_CON_dt": "loss_adv_P7_CON_dt",
}


def test_training_trajectory_matches_reference():
    """Per-step loss trajectories of the fused step match the reference's
    three-backward loop over a real optimization trajectory.

    Tolerances: f32 reduction-order noise (~1e-6 rel per op) is amplified
    by SGD+momentum feedback; empirically the divergence grows smoothly
    (see __main__ profile, docs/parity/trajectory_ab.md) — early steps
    agree to ~1e-3 and the envelope stays within a few percent over 50
    steps. A systematic step mismatch (wrong LR group, wrong GRL sign,
    missing loss term) shows up as an immediate or rapidly-diverging gap."""
    ref_recs, my_recs = run_trajectory(N_STEPS)
    rows = _drift(ref_recs, my_recs, KEY_MAP)

    # 1) immediate parity: the first step is pre-divergence — tight.
    for rk, d in rows[0].items():
        assert d < 2e-3, f"step 1 {rk}: rel diff {d:.2e}"
    # 2) trajectory envelope: median + final drift bounded.
    tot = np.array([r["loss_total"] for r in rows])
    assert float(np.median(tot)) < 0.02, (
        f"median loss_total drift {np.median(tot):.3f}"
    )
    assert float(tot[-1]) < 0.08, f"final-step drift {tot[-1]:.3f}"
    # 3) the trajectory is a real optimization: loss decreased in BOTH.
    r0 = np.mean([r["loss_total"] for r in ref_recs[:5]])
    r1 = np.mean([r["loss_total"] for r in ref_recs[-5:]])
    m0 = np.mean([m["loss_total"] for m in my_recs[:5]])
    m1 = np.mean([m["loss_total"] for m in my_recs[-5:]])
    assert r1 < r0 and m1 < m0, (
        f"not optimizing: ref {r0:.3f}->{r1:.3f} mine {m0:.3f}->{m1:.3f}"
    )


if __name__ == "__main__":
    ref_recs, my_recs = run_trajectory(N_STEPS)
    rows = _drift(ref_recs, my_recs, KEY_MAP)
    print(f"{'step':>4} {'ref_total':>10} {'my_total':>10} {'rel':>9}  "
          f"worst-term")
    for it, (r, m, row) in enumerate(zip(ref_recs, my_recs, rows), 1):
        worst = max(row, key=row.get)
        print(f"{it:>4} {r['loss_total']:>10.4f} {m['loss_total']:>10.4f} "
              f"{row['loss_total']:>9.2e}  {worst}={row[worst]:.2e}")
