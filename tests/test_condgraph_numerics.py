"""Golden numeric tests for condgraph internals: sim_matrix, per-class
prototype means, node CE loss, transfer losses vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan_tpu.modeling.condgraph.module import (
    CondGraph,
    CondGraphConfig,
    sim_matrix,
)
from scan_tpu.modeling.condgraph.prototype import ProtoState


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_sim_matrix_against_numpy():
    rng = np.random.RandomState(0)
    a = rng.randn(5, 8).astype(np.float32)
    got = np.asarray(sim_matrix(jnp.asarray(a), jnp.asarray(a)))
    norm = a / np.linalg.norm(a, axis=1, keepdims=True)
    want = norm @ norm.T
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def cg():
    cfg = CondGraphConfig(
        num_classes=4, proto_iter=1, use_rnn=False, global_gcn=True,
        max_nodes=16, transfer_cfg=("NODES", "ADJ"),
    )
    module = CondGraph(cfg)
    feats = [jnp.zeros((1, 4, 4, 256)) for _ in range(5)]
    state = ProtoState(jnp.ones((4, 256)), jnp.asarray(-1))
    targets = {
        "boxes": jnp.asarray([[[2.0, 2, 20, 20]]]),
        "labels": jnp.asarray([[1]]),
        "mask": jnp.asarray([[True]]),
    }
    params = module.init(jax.random.PRNGKey(0), feats, state, "source", targets)
    return cfg, module, params, state


def test_forward_gcns_class_means(cg):
    cfg, module, params, state = cg
    rng = np.random.RandomState(1)
    nodes = jnp.asarray(rng.randn(16, 256), jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1, 1, 2, 3, 3] + [0] * 8)
    valid = jnp.asarray([True] * 8 + [False] * 8)

    node_loss, proto_batch = module.apply(
        params, nodes, labels, valid, method=module.forward_gcns
    )
    assert np.isfinite(float(node_loss))
    pb = np.asarray(proto_batch)
    assert pb.shape == (4, 256)
    # classes with no valid nodes would be zero; all 4 appear here
    assert np.all(np.abs(pb).sum(1) > 0)

    # masked nodes must not affect the means: flip an invalid node's value
    nodes2 = nodes.at[12].set(1000.0)
    _, pb2 = module.apply(
        params, nodes2, labels, valid, method=module.forward_gcns
    )
    np.testing.assert_allclose(pb, np.asarray(pb2), atol=2e-3)


def test_transfer_loss_oracle(cg):
    cfg, module, params, state = cg
    rng = np.random.RandomState(2)
    sr = rng.randn(4, 256).astype(np.float32)
    tg_proto = rng.randn(4, 256).astype(np.float32)
    tg_proto[3] = 0  # class 3 absent
    tg_nodes = rng.randn(16, 256).astype(np.float32)
    tg_labels = np.asarray([0, 1, 2, 3] * 4)
    tg_valid = np.asarray([True] * 8 + [False] * 8)

    loss = module.apply(
        params, jnp.asarray(sr), jnp.asarray(tg_proto), jnp.asarray(tg_nodes),
        jnp.asarray(tg_labels), jnp.asarray(tg_valid),
        method=module.get_transfer_loss,
    )
    got = float(loss)

    # NODES oracle: mean over valid rows x 256 of KL(softmax(proto[l]) ||
    # softmax(node))
    tgt = _softmax(sr[tg_labels])
    q = _softmax(tg_nodes)
    kl = tgt * (np.log(np.maximum(tgt, 1e-12)) - np.log(np.maximum(q, 1e-12)))
    nodes_term = kl[tg_valid].sum() / (tg_valid.sum() * 256)

    # ADJ oracle: 1 - cos between masked flattened cosine-sim matrices
    exist = np.abs(tg_proto).sum(1) != 0
    def simm(x):
        n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)
        return n @ n.T
    m = np.outer(exist, exist)
    a = (simm(sr) * m).reshape(-1)
    b = (simm(tg_proto) * m).reshape(-1)
    adj_term = 1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    np.testing.assert_allclose(got, nodes_term + adj_term, rtol=1e-3, atol=1e-5)


def test_act_maps_are_softmax_probabilities(cg):
    cfg, module, params, state = cg
    feats = [jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 256), jnp.float32)
             for _ in range(5)]
    out_feats, losses, act_maps, _ = module.apply(
        params, feats, state, "inference"
    )
    for a in act_maps:
        s = np.asarray(a).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)
    for f in out_feats:
        assert f.shape[-1] == 256  # head_out projected back


@pytest.mark.parametrize("edge_norm", ["cosine_detached", "NO", "softmax", "cosine"])
def test_local_gcn_edge_variants(edge_norm):
    cfg = CondGraphConfig(
        num_classes=4, proto_iter=1, use_rnn=False, global_gcn=False,
        gcn_edge_norm=edge_norm, max_nodes=12, transfer_cfg=(None,),
    )
    module = CondGraph(cfg)
    rng = np.random.RandomState(5)
    nodes = jnp.asarray(rng.randn(12, 256), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3] * 3)
    valid = jnp.asarray([True] * 8 + [False] * 4)
    feats = [jnp.zeros((1, 4, 4, 256)) for _ in range(5)]
    state = ProtoState(jnp.ones((4, 256)), jnp.asarray(-1))
    targets = {
        "boxes": jnp.asarray([[[2.0, 2, 20, 20]]]),
        "labels": jnp.asarray([[1]]),
        "mask": jnp.asarray([[True]]),
    }
    params = module.init(jax.random.PRNGKey(1), feats, state, "source", targets)
    node_loss, pb = module.apply(
        params, nodes, labels, valid, method=module.forward_gcns
    )
    assert np.isfinite(float(node_loss))
    assert np.all(np.isfinite(np.asarray(pb)))


def test_local_gcn_class_isolation():
    """With a block-diagonal adjacency, perturbing a node of class A must
    not change outputs of class-B nodes (cosine_detached edges)."""
    cfg = CondGraphConfig(
        num_classes=3, proto_iter=1, use_rnn=False, global_gcn=False,
        gcn_edge_norm="cosine_detached", max_nodes=8, transfer_cfg=(None,),
    )
    module = CondGraph(cfg)
    rng = np.random.RandomState(6)
    nodes = jnp.asarray(rng.randn(8, 256), jnp.float32)
    labels = jnp.asarray([0, 0, 1, 1, 2, 2, 0, 1])
    valid = jnp.ones((8,), bool)
    feats = [jnp.zeros((1, 4, 4, 256)) for _ in range(5)]
    state = ProtoState(jnp.ones((3, 256)), jnp.asarray(-1))
    targets = {
        "boxes": jnp.asarray([[[2.0, 2, 20, 20]]]),
        "labels": jnp.asarray([[1]]),
        "mask": jnp.asarray([[True]]),
    }
    params = module.init(jax.random.PRNGKey(2), feats, state, "source", targets)
    _, pb1 = module.apply(params, nodes, labels, valid,
                          method=module.forward_gcns)
    nodes2 = nodes.at[0].set(nodes[0] + 10.0)  # class 0 node
    _, pb2 = module.apply(params, nodes2, labels, valid,
                          method=module.forward_gcns)
    # class 1 and 2 prototypes unchanged
    np.testing.assert_allclose(np.asarray(pb1[1]), np.asarray(pb2[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pb1[2]), np.asarray(pb2[2]), atol=1e-4)
    # class 0 prototype changed
    assert np.abs(np.asarray(pb1[0]) - np.asarray(pb2[0])).max() > 1e-3


def test_transfer_prototype_and_adj_complete():
    cfg = CondGraphConfig(
        num_classes=4, proto_iter=1, use_rnn=False, global_gcn=True,
        max_nodes=8, transfer_cfg=("PROTOTYPE", "ADJ_COMPLETE"),
    )
    module = CondGraph(cfg)
    feats = [jnp.zeros((1, 4, 4, 256)) for _ in range(5)]
    state = ProtoState(jnp.ones((4, 256)), jnp.asarray(-1))
    targets = {
        "boxes": jnp.asarray([[[2.0, 2, 20, 20]]]),
        "labels": jnp.asarray([[1]]),
        "mask": jnp.asarray([[True]]),
    }
    params = module.init(jax.random.PRNGKey(3), feats, state, "source", targets)

    rng = np.random.RandomState(7)
    sr = rng.randn(4, 256).astype(np.float32)
    tg = rng.randn(4, 256).astype(np.float32)
    tg[2] = 0  # absent class -> ADJ_COMPLETE substitutes the source row
    loss = module.apply(
        params, jnp.asarray(sr), jnp.asarray(tg),
        jnp.asarray(rng.randn(8, 256).astype(np.float32)),
        jnp.asarray(np.zeros(8, np.int32)), jnp.ones(8, bool),
        method=module.get_transfer_loss,
    )
    got = float(loss)
    assert np.isfinite(got) and got >= 0

    # PROTOTYPE oracle on existing rows
    exist = np.abs(tg).sum(1) != 0
    t = _softmax(sr)
    q = _softmax(tg)
    kl = t * (np.log(np.maximum(t, 1e-12)) - np.log(np.maximum(q, 1e-12)))
    proto_term = kl[exist].sum() / (exist.sum() * 256)

    # ADJ_COMPLETE oracle: absent rows replaced by source prototypes
    tg_c = tg.copy()
    tg_c[~exist] = sr[~exist]
    def simm(x):
        n = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)
        return n @ n.T
    a = simm(sr).reshape(-1)
    b = simm(tg_c).reshape(-1)
    adj_term = 1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    np.testing.assert_allclose(got, proto_term + adj_term, rtol=1e-3, atol=1e-5)
