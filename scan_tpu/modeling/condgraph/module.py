"""The condgraph middle head (SCAN's core), TPU-native.

Parity target: reference ``fcos_core/modeling/rpn/fcos/condgraph.py:122-673``
(``GRAPHModule``). Pipeline per mode:

  source (train): head_in tower -> FCOS point labelling -> node sampling ->
    cross-image graph aggregation (global multi-head attention or per-class
    GCN) + node classification loss -> prototype EMA update -> kernel
    manifestation (RNN / (ITER,1)-conv / linear over the prototype) ->
    per-class dynamic 1x1 conv -> activation-map focal loss -> concat act
    maps onto features + head_out tower.

  target (train): manifested kernels -> act maps -> density-based node
    sampling -> graph aggregation -> Graph-based Semantic Transfer losses
    (NODES KL / PROTOTYPE KL / ADJ cosine between prototype similarity
    matrices, condgraph.py:457-498).

  inference: kernels -> act maps -> concat + head_out.

TPU-native design notes:
  * node sets are fixed-capacity masked tensors; per-class reductions are
    one-hot matmuls instead of boolean indexing;
  * the prototype buffer is explicit ``ProtoState`` threaded through the
    step (pmean-synced across data-parallel replicas by the trainer, fixing
    the reference's single-GPU limitation);
  * the dynamic conv is an einsum on the MXU (ops/dynamic_conv.py).
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...layers import safe_l2_norm
from ...ops.dynamic_conv import dynamic_conv
from ...ops.focal_loss import bce_focal_loss, softmax_focal_loss
from ...ops.locations import compute_locations
from ..layers import Conv, GroupNorm32, MultiHeadSelfAttention, normal_init
from .prototype import ProtoState, source_prototype_view, update_prototype
from .sampling import sample_source_nodes, sample_target_nodes

EPS = 1e-8


def sim_matrix(a, b, eps=EPS):
    """Cosine similarity matrix (reference condgraph.py:35-43).

    safe_l2_norm keeps the gradient finite on exactly-zero rows (empty
    prototype slots) — jnp.linalg.norm would backprop NaN there."""
    a_n = safe_l2_norm(a, axis=1, keepdims=True, eps=eps)
    b_n = safe_l2_norm(b, axis=1, keepdims=True, eps=eps)
    a = a / jnp.maximum(a_n, eps)
    b = b / jnp.maximum(b_n, eps)
    return a @ b.T


@dataclasses.dataclass(frozen=True)
class CondGraphConfig:
    num_classes: int = 9  # includes background
    in_channels: int = 256
    num_convs_in: int = 2
    num_convs_out: int = 1
    in_norm: str = "GN"
    cat_act_map: bool = True
    with_bg_proto: bool = True
    with_bias_dc: bool = False
    with_shortcut: bool = False
    global_gcn: bool = True
    gcn_edge_norm: str = "cosine_detached"
    gcn_out_activation: str = "relu"
    gcn1_out: int = 256
    gcn2_out: int = 256
    proto_channel: int = 256
    proto_iter: int = 3
    use_rnn: bool = True
    cosine_update: bool = True
    proto_momentum: float = 0.95
    cond_hidden: int = 512
    act_loss: Optional[str] = "softmaxFL"
    act_loss_weight: float = 1.0
    gcn_loss_weight: float = 1.0
    con_loss_weight: float = 1.0
    gcn_loss_weight_tg: float = 1.0
    transfer_cfg: tuple = ("NODES", "ADJ")
    self_training: bool = False
    target_sampling: str = "dbscan"
    plabel_th: float = 0.5
    dbscan_eps: float = 3.0
    dbscan_thr: float = 0.05
    max_nodes: int = 1024
    max_target_candidates: int = 512
    fpn_strides: tuple = (8, 16, 32, 64, 128)
    mha_dropout: float = 0.1

    @property
    def used_classes(self) -> int:
        return self.num_classes - 1 + int(self.with_bg_proto)

    @staticmethod
    def from_cfg(cfg):
        mh = cfg.MODEL.MIDDLE_HEAD
        return CondGraphConfig(
            num_classes=cfg.MODEL.FCOS.NUM_CLASSES,
            num_convs_in=mh.NUM_CONVS_IN,
            num_convs_out=mh.NUM_CONVS_OUT,
            in_norm=mh.IN_NORM,
            cat_act_map=mh.CAT_ACT_MAP,
            with_bg_proto=mh.PROTO_WITH_BG,
            with_bias_dc=mh.COND_WITH_BIAS,
            with_shortcut=mh.GCN_SHORTCUT,
            global_gcn=mh.GLOBAL_GCN,
            gcn_edge_norm=mh.GCN_EDGE_NORM,
            gcn_out_activation=mh.GCN_OUT_ACTIVATION,
            gcn1_out=mh.GCN1_OUT_CHANNEL,
            gcn2_out=mh.GCN2_OUT_CHANNEL,
            proto_channel=mh.PROTO_CHANNEL,
            proto_iter=mh.PROTO_ITER,
            use_rnn=bool(mh.USE_RNN),
            cosine_update=mh.COSINE_UPDATE_ON,
            proto_momentum=mh.PROTO_MOMENTUM,
            cond_hidden=mh.COND_HIDDEN_CHANNEL,
            act_loss=mh.ACT_LOSS,
            act_loss_weight=mh.ACT_LOSS_WEIGHT,
            gcn_loss_weight=mh.GCN_LOSS_WEIGHT,
            con_loss_weight=mh.CON_LOSS_WEIGHT,
            gcn_loss_weight_tg=mh.GCN_LOSS_WEIGHT_TG,
            transfer_cfg=tuple(
                t for t in (mh.TRANSFER_CFG if isinstance(mh.TRANSFER_CFG, (tuple, list)) else (mh.TRANSFER_CFG,))
            ),
            self_training=mh.GCN_SELF_TRAINING,
            target_sampling=mh.TARGET_SAMPLING_CFG,
            plabel_th=cfg.SOLVER.MIDDLE_HEAD.PLABEL_TH[0],
            dbscan_eps=float(mh.DBSCAN_EPS),
            dbscan_thr=float(mh.DBSCAN_THR),
            max_nodes=cfg.TPU.MAX_NODES,
            max_target_candidates=cfg.TPU.MAX_TARGET_POINTS,
            fpn_strides=tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            mha_dropout=float(mh.ATT_DROPOUT),
        )


class GraphTower(nn.Module):
    """Projection tower (reference GRAPHHead, condgraph.py:68-119)."""

    num_convs: int
    out_channels: int
    norm: Optional[str] = None  # 'GN' for the 'in' tower, None for 'out'
    dtype: Optional[Any] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = Conv(self.out_channels, 3, dtype=self.dtype,
                     quant=self.quant, name=f"conv{i}")(x)
            if self.norm == "GN":
                x = GroupNorm32(dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class TorchRNN(nn.Module):
    """2-layer Elman RNN with tanh (torch.nn.RNN(256, 512, 2)).

    Used by the kernel-manifestation branch (reference condgraph.py:222-223).
    Sequence length == PROTO_ITER (tiny, unrolled statically).
    """

    input_size: int = 256
    hidden_size: int = 512
    num_layers: int = 2

    @nn.compact
    def __call__(self, xs):  # xs: (T, B, input_size)
        t_len, b, _ = xs.shape
        h = self.hidden_size

        def uinit(bound):
            return lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        bound = 1.0 / jnp.sqrt(h)
        outs = xs
        for layer in range(self.num_layers):
            in_sz = self.input_size if layer == 0 else h
            w_ih = self.param(f"weight_ih_l{layer}", uinit(bound), (h, in_sz))
            w_hh = self.param(f"weight_hh_l{layer}", uinit(bound), (h, h))
            b_ih = self.param(f"bias_ih_l{layer}", uinit(bound), (h,))
            b_hh = self.param(f"bias_hh_l{layer}", uinit(bound), (h,))
            hidden = jnp.zeros((b, h))
            layer_outs = []
            for t in range(t_len):
                hidden = jnp.tanh(
                    outs[t] @ w_ih.T + b_ih + hidden @ w_hh.T + b_hh
                )
                layer_outs.append(hidden)
            outs = jnp.stack(layer_outs, axis=0)
        return outs


class CondGraph(nn.Module):
    """The SCAN middle head. See module docstring for mode semantics."""

    cfg: CondGraphConfig
    dtype: Optional[Any] = None
    quant: bool = False

    def setup(self):
        c = self.cfg
        self.head_in = GraphTower(
            c.num_convs_in, c.in_channels, norm=c.in_norm, dtype=self.dtype,
            quant=self.quant, name="head_in",
        )
        if c.cat_act_map:
            self.head_out = GraphTower(
                c.num_convs_out, c.in_channels, norm=None, dtype=self.dtype,
                quant=self.quant, name="head_out",
            )
        if c.global_gcn:
            self.multihead_attn = MultiHeadSelfAttention(
                model_dim=256, num_heads=4, dropout=c.mha_dropout,
                name="multihead_attn"
            )
        else:
            self.gcn_layer1 = nn.Dense(
                c.gcn1_out, kernel_init=normal_init(0.01), name="gcn_layer1"
            )
            self.gcn_layer2 = nn.Dense(
                c.gcn2_out, kernel_init=normal_init(0.01), name="gcn_layer2"
            )
            if c.gcn_edge_norm in ("softmax", "cosine"):
                self.edge_project_u = nn.Dense(256, name="edge_project_u")
                self.edge_project_v = nn.Dense(256, name="edge_project_v")
        self.proto_cls_hidden = nn.Dense(
            512, kernel_init=normal_init(0.01), name="proto_cls_hidden"
        )
        self.proto_cls = nn.Dense(
            c.used_classes, kernel_init=normal_init(0.01), name="proto_cls"
        )
        # kernel manifestation branch
        if c.use_rnn:
            self.cond_rnn = TorchRNN(c.proto_channel, 512, 2, name="cond_rnn")
            self.cond_nx1 = nn.Dense(256, name="cond_nx1")  # (512*ITER)->256
        elif c.proto_iter > 1:
            self.cond_nx1 = nn.Dense(
                c.cond_hidden, kernel_init=normal_init(1.0), name="cond_nx1"
            )  # (proto_channel*ITER)->hidden; reference init: Normal(std=1)
            self.cond_nx1_norm = nn.GroupNorm(
                num_groups=32, epsilon=1e-5, use_fast_variance=False,
                name="cond_nx1_norm"
            )
        else:
            self.cond_1 = nn.Dense(
                c.cond_hidden, kernel_init=normal_init(0.01), name="cond_1"
            )
        self.cond_2 = nn.Dense(
            256 + int(c.with_bias_dc), kernel_init=normal_init(0.01), name="cond_2"
        )

    # ------------------------------------------------------------------ #
    # building blocks
    # ------------------------------------------------------------------ #
    def get_conded_weight(self, prototype: jnp.ndarray) -> jnp.ndarray:
        """Manifest prototypes into per-class 1x1 kernels
        (reference condgraph.py:313-336)."""
        c = self.cfg
        if c.use_rnn:
            # prototype (C_used, ch, ITER) -> seq (ITER, C_used, ch)
            seq = jnp.transpose(prototype, (2, 0, 1))
            rnn_out = self.cond_rnn(seq)  # (ITER, C_used, 512)
            # torch Conv2d(512, 256, (ITER,1)) over (C,512,ITER,1) == dense
            # over the flattened (512*ITER) axis, iter-major per channel.
            flat = jnp.transpose(rnn_out, (1, 2, 0)).reshape(
                prototype.shape[0], -1
            )  # (C_used, 512*ITER)
            return self.cond_nx1(flat)
        if c.proto_iter > 1:
            flat = prototype.reshape(prototype.shape[0], -1)  # ch-major (ch, ITER)
            hidden = self.cond_nx1(flat)
            hidden = nn.relu(self.cond_nx1_norm(hidden))
            return self.cond_2(hidden)
        return self.cond_2(nn.relu(self.cond_1(prototype)))

    def _edge(self, nodes, pair_mask):
        """Adjacency over nodes restricted to pair_mask (i attends to j only
        where pair_mask[i, j]); dispatch per GCN_EDGE_NORM
        (reference get_edge, condgraph.py:284-302)."""
        c = self.cfg
        neg = -1e30
        if c.gcn_edge_norm == "cosine_detached":
            sim = sim_matrix(nodes, nodes)
            sim = jnp.where(pair_mask, sim, neg)
            return jax.lax.stop_gradient(jax.nn.softmax(sim, axis=-1))
        if c.gcn_edge_norm == "NO":
            sim = nodes @ nodes.T
            sim = jnp.where(pair_mask, sim, neg)
            return jax.lax.stop_gradient(jax.nn.softmax(sim, axis=-1))
        if c.gcn_edge_norm == "softmax":
            sim = self.edge_project_u(nodes) @ self.edge_project_v(nodes).T
            sim = jnp.where(pair_mask, sim, neg)
            return jax.nn.softmax(sim, axis=-1)
        if c.gcn_edge_norm == "cosine":
            proj = nn.relu(self.edge_project_v(nodes))
            sim = sim_matrix(proj, proj)
            sim = jnp.where(pair_mask, sim, 0.0)
            norm = jnp.sum(sim, axis=-1, keepdims=True)
            return sim / jnp.maximum(norm, EPS)
        raise KeyError(c.gcn_edge_norm)

    def _gcn_local(self, nodes, adj):
        c = self.cfg
        x = nn.relu(self.gcn_layer1(adj @ nodes))
        y = self.gcn_layer2(adj @ x)
        act = c.gcn_out_activation
        if act == "relu":
            y = nn.relu(y)
        elif act == "softmax":
            y = jax.nn.softmax(y, axis=-1)
        elif act == "sigmoid":
            y = jax.nn.sigmoid(y)
        elif act == "tanh":
            y = jnp.tanh(y)
        elif act != "NO":
            raise KeyError(act)
        if c.with_shortcut:
            y = y + nodes
        return y

    def forward_gcns(self, nodes, node_labels, node_valid):
        """Graph aggregation + node classification loss + per-class means.

        Parity target: reference _forward_gcns (condgraph.py:386-421).
        Returns (node_loss, prototype_batch (C_used, ch)).
        """
        c = self.cfg
        if c.global_gcn:
            out = self.multihead_attn(nodes, mask=node_valid)
            if c.with_shortcut:
                out = out + nodes  # reference GCNs_global 'x += x' is a no-op
                                   # shortcut bug; real residual is inside MHA
            nodes_out = out
        else:
            # per-class GCN == one GCN over a block-diagonal (same-class)
            # adjacency: mask edges across classes before row-normalising,
            # with the edge type dispatched per GCN_EDGE_NORM.
            same_class = node_labels[:, None] == node_labels[None, :]
            valid_pair = node_valid[:, None] & node_valid[None, :] & same_class
            adj = self._edge(nodes, valid_pair)
            nodes_out = self._gcn_local(nodes, adj)
            nodes_out = jnp.where(node_valid[:, None], nodes_out, nodes)

        # per-class means (prototype_batch); class index: with bg -> label,
        # else label-1 (reference condgraph.py:395-398).
        cls_index = node_labels if c.with_bg_proto else node_labels - 1
        one_hot = jax.nn.one_hot(cls_index, c.used_classes, dtype=nodes_out.dtype)
        one_hot = one_hot * node_valid[:, None].astype(nodes_out.dtype)
        sums = one_hot.T @ nodes_out  # (C_used, ch)
        counts = jnp.sum(one_hot, axis=0)  # (C_used,)
        proto_batch = sums / jnp.maximum(counts[:, None], 1.0)
        proto_batch = proto_batch * (counts[:, None] > 0)

        logits = self.proto_cls(nn.relu(self.proto_cls_hidden(nodes_out)))
        target = cls_index
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, target[:, None].astype(jnp.int32), axis=1)[:, 0]
        denom = jnp.maximum(jnp.sum(node_valid.astype(ce.dtype)), 1.0)
        node_loss = c.gcn_loss_weight * jnp.sum(ce * node_valid) / denom
        return node_loss, proto_batch

    def _act_maps(self, features, conded_weight):
        c = self.cfg
        maps_logits = [
            dynamic_conv(f, conded_weight, with_bias=c.with_bias_dc)
            for f in features
        ]
        if c.act_loss == "softmaxFL":
            maps = [jax.nn.softmax(m, axis=-1) for m in maps_logits]
        else:
            maps = [jax.nn.sigmoid(m) for m in maps_logits]
        return maps_logits, maps

    def get_act_loss(self, maps_logits, act_labels):
        """Activation-map loss (reference condgraph.py:338-370)."""
        c = self.cfg
        logits_flat = jnp.concatenate(
            [m.reshape(-1, c.used_classes) for m in maps_logits], axis=0
        )
        labels_flat = jnp.concatenate(
            [l.reshape(-1) for l in act_labels], axis=0
        )
        if c.act_loss == "softmaxFL":
            return c.act_loss_weight * softmax_focal_loss(logits_flat, labels_flat)
        if c.act_loss == "sigmoidFL":
            onehot = jax.nn.one_hot(jnp.clip(labels_flat, 0, 1), 2)
            return c.act_loss_weight * bce_focal_loss(logits_flat, onehot)
        return None

    def post_process(self, features, act_maps):
        """Concat act maps onto features + head_out (condgraph.py:379-384)."""
        if not self.cfg.cat_act_map:
            return list(features)
        out = []
        for f, a in zip(features, act_maps):
            out.append(self.head_out(jnp.concatenate([f, a.astype(f.dtype)], axis=-1)))
        return out

    def _class_exist(self, node_labels, node_valid):
        """Classes with at least one valid node this step — the intent
        behind the reference's ``prototype_batch.sum(-1).bool()`` gates
        (condgraph.py:560, 468), computed from counts so LayerNorm-init
        batch means summing to float-exact zero can't flip the gate."""
        c = self.cfg
        cls_index = node_labels if c.with_bg_proto else node_labels - 1
        oh = jax.nn.one_hot(cls_index, c.used_classes, dtype=jnp.float32)
        return jnp.sum(oh * node_valid[:, None], axis=0) > 0

    def get_transfer_loss(self, sr_prototype, tg_prototype, tg_nodes,
                          tg_labels, tg_valid, exist=None):
        """Graph-based Semantic Transfer (reference condgraph.py:457-498)."""
        c = self.cfg
        losses = []
        cfg_str = [t for t in c.transfer_cfg if t]

        if any(t in ("NODES", "NODE") for t in cfg_str):
            # KLDiv(log softmax(nodes), softmax(proto[label])), elementwise
            # mean over N*ch (torch KLDivLoss 'mean'); masked rows excluded.
            tgt = jax.nn.softmax(sr_prototype[tg_labels], axis=-1)
            logq = jax.nn.log_softmax(tg_nodes, axis=-1)
            kl = tgt * (jnp.log(jnp.maximum(tgt, 1e-12)) - logq)
            m = tg_valid[:, None].astype(kl.dtype)
            denom = jnp.maximum(jnp.sum(m) * kl.shape[1], 1.0)
            losses.append(jnp.sum(kl * m) / denom)

        if exist is None:
            exist = jnp.sum(tg_prototype, axis=-1) != 0

        if "PROTOTYPE" in cfg_str:
            tgt = jax.nn.softmax(sr_prototype, axis=-1)
            logq = jax.nn.log_softmax(tg_prototype, axis=-1)
            kl = tgt * (jnp.log(jnp.maximum(tgt, 1e-12)) - logq)
            m = exist[:, None].astype(kl.dtype)
            denom = jnp.maximum(jnp.sum(m) * kl.shape[1], 1.0)
            losses.append(jnp.sum(kl * m) / denom)

        if "ADJ" in cfg_str or "ADJ_COMPLETE" in cfg_str:
            if "ADJ_COMPLETE" in cfg_str:
                tg_c = jnp.where(exist[:, None], tg_prototype, sr_prototype)
                pair_mask = None
            else:
                tg_c = tg_prototype
                pair_mask = exist[:, None] & exist[None, :]
            adj_sr = sim_matrix(sr_prototype, sr_prototype)
            adj_tg = sim_matrix(tg_c, tg_c)
            if pair_mask is not None:
                adj_sr = jnp.where(pair_mask, adj_sr, 0.0)
                adj_tg = jnp.where(pair_mask, adj_tg, 0.0)
            a = adj_sr.reshape(-1)
            b = adj_tg.reshape(-1)
            cos = jnp.dot(a, b) / jnp.maximum(
                safe_l2_norm(a) * safe_l2_norm(b), 1e-8
            )
            losses.append(1.0 - cos)

        if not losses:
            return None
        return sum(losses)

    # ------------------------------------------------------------------ #
    # mode entry points
    # ------------------------------------------------------------------ #
    def __call__(self, features, proto_state: ProtoState, mode: str = "inference",
                 targets=None):
        """Dispatch (reference condgraph.py:547-556).

        Returns (features_out, losses_dict, act_maps, new_proto_state).
        """
        c = self.cfg
        features = [self.head_in(f) for f in features]

        if mode == "source":
            return self._forward_source(features, proto_state, targets)
        if mode == "target":
            return self._forward_target(features, proto_state)
        return self._forward_inference(features, proto_state)

    def _forward_source(self, features, proto_state, targets):
        c = self.cfg
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        locations = compute_locations(shapes, c.fpn_strides)
        nodes, node_labels, node_valid, act_labels = sample_source_nodes(
            locations, features,
            targets["boxes"], targets["labels"], targets["mask"],
            max_nodes=c.max_nodes, with_bg=c.with_bg_proto,
        )
        node_loss, proto_batch = self.forward_gcns(nodes, node_labels, node_valid)

        new_state = update_prototype(
            proto_state, proto_batch, c.proto_iter, c.use_rnn,
            c.cosine_update, c.proto_momentum,
            exist=self._class_exist(node_labels, node_valid),
        )
        conded_weight = self.get_conded_weight(new_state.prototype)
        maps_logits, act_maps = self._act_maps(features, conded_weight)

        losses = {"node_loss": node_loss}
        if c.act_loss:
            losses["act_loss"] = self.get_act_loss(maps_logits, act_labels)
        features = self.post_process(features, act_maps)
        return features, losses, act_maps, new_state

    def _forward_target(self, features, proto_state):
        c = self.cfg
        conded_weight = self.get_conded_weight(proto_state.prototype)
        _, act_maps = self._act_maps(features, conded_weight)

        nodes, node_labels, node_valid, any_nodes = sample_target_nodes(
            features, act_maps,
            max_nodes=c.max_nodes,
            sampling_cfg=c.target_sampling,
            score_threshold=c.plabel_th,
            dbscan_eps=c.dbscan_eps,
            dbscan_thr=c.dbscan_thr,
            max_candidates_per_level=c.max_target_candidates,
        )
        features_out = self.post_process(features, act_maps)

        losses = {}
        do_transfer = bool(
            [t for t in c.transfer_cfg if t]
        ) or c.self_training
        if do_transfer:
            node_loss, tg_proto = self.forward_gcns(nodes, node_labels, node_valid)
            sr_proto = source_prototype_view(proto_state, c.proto_iter)
            transfer = self.get_transfer_loss(
                sr_proto, tg_proto, nodes, node_labels, node_valid,
                exist=self._class_exist(node_labels, node_valid),
            )
            gate = any_nodes.astype(jnp.float32)
            if transfer is not None:
                losses["transfer_loss"] = c.con_loss_weight * transfer * gate
            if c.self_training:
                losses["node_loss_tg"] = c.gcn_loss_weight_tg * node_loss * gate
        return features_out, losses, act_maps, proto_state

    def _forward_inference(self, features, proto_state):
        conded_weight = self.get_conded_weight(proto_state.prototype)
        _, act_maps = self._act_maps(features, conded_weight)
        features = self.post_process(features, act_maps)
        return features, {}, act_maps, proto_state
