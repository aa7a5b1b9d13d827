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
