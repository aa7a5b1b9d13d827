"""Prototype EMA state: parity with the reference update semantics
(plain / nx1 cycling / RNN saturating-shift, fixed + cosine momentum)."""

import numpy as np
import jax
import jax.numpy as jnp

from scan_tpu.modeling.condgraph.prototype import (
    ProtoState,
    init_proto_state,
    source_prototype_view,
    update_prototype,
)


def _np_cos(a, b):
    return (a * b).sum(-1) / np.maximum(
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8
    )


def test_plain_ema_fixed_momentum():
    state = ProtoState(jnp.ones((3, 4)), jnp.asarray(-1))
    batch = jnp.zeros((3, 4)).at[0].set(5.0)  # only class 0 exists
    new = update_prototype(state, batch, proto_iter=1, use_rnn=False,
                           cosine=False, momentum=0.9)
    np.testing.assert_allclose(np.asarray(new.prototype[0]), 0.9 * 1 + 0.1 * 5)
    np.testing.assert_allclose(np.asarray(new.prototype[1]), 1.0)  # untouched


def test_plain_ema_cosine_momentum():
    rng = np.random.RandomState(0)
    proto = rng.randn(3, 4).astype(np.float32)
    batch = np.zeros((3, 4), np.float32)
    batch[1] = rng.randn(4)
    state = ProtoState(jnp.asarray(proto), jnp.asarray(-1))
    new = update_prototype(state, jnp.asarray(batch), 1, False, True)
    m = _np_cos(proto[1], batch[1])
    want = proto[1] * m + batch[1] * (1 - m)
    np.testing.assert_allclose(np.asarray(new.prototype[1]), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.prototype[0]), proto[0])


def test_nx1_cycling_counter():
    """PROTO_ITER=3, no RNN: counter cycles 0,1,2,0,... and only the
    selected slice updates (reference update_prototype_nx1)."""
    proto = np.ones((2, 4, 3), np.float32)
    state = ProtoState(jnp.asarray(proto), jnp.asarray(-1))
    batch = jnp.full((2, 4), 3.0)
    slices_touched = []
    for step in range(4):
        state = update_prototype(state, batch, 3, False, False, momentum=0.5)
        slices_touched.append(int(state.counter))
    assert slices_touched == [0, 1, 2, 0]
    p = np.asarray(state.prototype)
    # slice 0 updated twice: 1 -> 2 -> 2.5 ; slices 1,2 once: -> 2
    np.testing.assert_allclose(p[:, :, 0], 2.5)
    np.testing.assert_allclose(p[:, :, 1], 2.0)
    np.testing.assert_allclose(p[:, :, 2], 2.0)


def test_rnn_saturating_shift():
    """RNN variant: counter saturates at ITER; afterwards the buffer shifts
    left and the LAST slice blends with the pre-shift last slice
    (reference update_prototype_nx1_rnn)."""
    it = 3
    proto = np.stack(
        [np.full((2, 4), v, np.float32) for v in (10.0, 20.0, 30.0)], axis=2
    )
    state = ProtoState(jnp.asarray(proto), jnp.asarray(it - 1))  # next -> it
    batch = jnp.full((2, 4), 50.0)
    new = update_prototype(state, batch, it, True, False, momentum=0.5)
    p = np.asarray(new.prototype)
    # shift: slice0 <- old slice1 (20), slice1 <- old slice2 (30)
    np.testing.assert_allclose(p[:, :, 0], 20.0)
    np.testing.assert_allclose(p[:, :, 1], 30.0)
    # last slice: blend of pre-shift last (30) with batch 50 at m=0.5 -> 40
    np.testing.assert_allclose(p[:, :, 2], 40.0)
    assert int(new.counter) == it
    # saturates: another update keeps shifting
    new2 = update_prototype(new, batch, it, True, False, momentum=0.5)
    assert int(new2.counter) == it
    p2 = np.asarray(new2.prototype)
    np.testing.assert_allclose(p2[:, :, 0], 30.0)
    np.testing.assert_allclose(p2[:, :, 1], 40.0)
    np.testing.assert_allclose(p2[:, :, 2], 45.0)


def test_rnn_fill_phase():
    it = 3
    state = init_proto_state(jax.random.PRNGKey(0), 2, 4, it)
    before = np.asarray(state.prototype).copy()
    batch = jnp.full((2, 4), 7.0)
    s1 = update_prototype(state, batch, it, True, False, momentum=0.5)
    assert int(s1.counter) == 0
    p1 = np.asarray(s1.prototype)
    np.testing.assert_allclose(p1[:, :, 0], before[:, :, 0] * 0.5 + 3.5)
    np.testing.assert_allclose(p1[:, :, 1], before[:, :, 1])


def test_update_is_gradient_free():
    """The EMA must not leak gradients into the batch prototypes
    (reference detaches, condgraph.py:561)."""

    def f(batch):
        state = ProtoState(jnp.ones((2, 4)), jnp.asarray(-1))
        new = update_prototype(state, batch, 1, False, False)
        return jnp.sum(new.prototype)

    g = jax.grad(f)(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_source_prototype_view():
    p3 = jnp.stack([jnp.ones((2, 4)), 3 * jnp.ones((2, 4))], axis=2)
    st = ProtoState(p3, jnp.asarray(0))
    v = source_prototype_view(st, 2)
    np.testing.assert_allclose(np.asarray(v), 2.0)
