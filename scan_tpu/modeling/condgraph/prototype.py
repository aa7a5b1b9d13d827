"""Semantic prototype ("paradigm") EMA state, threaded functionally.

Parity target: reference ``condgraph.py:180-184, 558-617`` — a registered
buffer of shape (C_used, channel[, PROTO_ITER]) updated per step with either
a fixed momentum or a cosine-similarity momentum, and a step counter:

  * PROTO_ITER == 1: plain EMA on existing classes.
  * PROTO_ITER > 1 (no RNN): cycling counter 0..ITER-1 selects the slice.
  * RNN variant: counter saturates at ITER (0,1,...,ITER-1,ITER,ITER,...);
    once saturated the buffer shifts left and the last slice is updated
    (a recurrent history window).

The reference updates this buffer in-place on one GPU and never syncs it
across ranks (its DA path is single-GPU only, README.md:79). Here the state
is explicit in the train step, so the data-parallel trainer can pmean the
batch prototypes before the update — multi-chip DA training stays exact.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ProtoState(NamedTuple):
    prototype: jnp.ndarray  # (C_used, ch) or (C_used, ch, ITER)
    counter: jnp.ndarray  # () int32


def init_proto_state(rng, num_classes_used: int, channels: int, proto_iter: int) -> ProtoState:
    if proto_iter == 1:
        proto = jax.random.normal(rng, (num_classes_used, channels))
    else:
        proto = jax.random.normal(rng, (num_classes_used, channels, proto_iter))
    return ProtoState(proto, jnp.asarray(-1, jnp.int32))


def _momentum(old_slice, batch, cosine: bool, momentum: float):
    if not cosine:
        return momentum
    from ...layers import safe_l2_norm

    dot = jnp.sum(old_slice * batch, axis=1)
    denom = safe_l2_norm(old_slice, axis=1) * safe_l2_norm(batch, axis=1)
    cos = dot / jnp.maximum(denom, 1e-8)
    return cos[:, None]


def _blend(old_slice, batch, exist, cosine, momentum):
    m = _momentum(old_slice, batch, cosine, momentum)
    new = old_slice * m + batch * (1 - m)
    return jnp.where(exist[:, None], new, old_slice)


def update_prototype(state: ProtoState, prototype_batch: jnp.ndarray,
                     proto_iter: int, use_rnn: bool, cosine: bool,
                     momentum: float = 0.95, exist=None) -> ProtoState:
    """Dispatch matching reference update_prototype_ensemble
    (condgraph.py:304-311).

    ``exist`` marks the classes to update. The reference derives it as
    ``prototype_batch.sum(-1).bool()`` (condgraph.py:560) — a proxy for
    "class had nodes this step" that is numerically chaotic when the batch
    means sum to ~0 (LayerNorm-init outputs). Callers that know the true
    node counts should pass the counts-based mask; the sum test remains
    the default for reference-shaped callers.
    """
    batch = jax.lax.stop_gradient(prototype_batch)
    if exist is None:
        exist = jnp.sum(batch, axis=-1) != 0

    if proto_iter == 1:
        new_proto = _blend(state.prototype, batch, exist, cosine, momentum)
        return ProtoState(new_proto, state.counter)

    if not use_rnn:
        # cycling counter: 0, 1, ..., ITER-1, 0, 1, ...
        counter = (state.counter + 1) % proto_iter
        old_slice = jnp.take(state.prototype, counter, axis=2)
        new_slice = _blend(old_slice, batch, exist, cosine, momentum)
        proto = jax.lax.dynamic_update_index_in_dim(
            state.prototype, new_slice, counter, axis=2
        )
        return ProtoState(proto, counter)

    # RNN variant: saturating counter.
    counter = jnp.minimum(state.counter + 1, proto_iter)

    def saturated(proto):
        # shift history left, update the last slice
        shifted = jnp.concatenate(
            [proto[:, :, 1:], proto[:, :, -1:]], axis=2
        )
        old_slice = proto[:, :, proto_iter - 1]
        new_slice = _blend(old_slice, batch, exist, cosine, momentum)
        return jax.lax.dynamic_update_index_in_dim(
            shifted, new_slice, proto_iter - 1, axis=2
        )

    def filling(proto):
        idx = counter  # < proto_iter
        old_slice = jnp.take(proto, idx, axis=2)
        new_slice = _blend(old_slice, batch, exist, cosine, momentum)
        return jax.lax.dynamic_update_index_in_dim(proto, new_slice, idx, axis=2)

    proto = jax.lax.cond(
        counter >= proto_iter, saturated, filling, state.prototype
    )
    return ProtoState(proto, counter)


def source_prototype_view(state: ProtoState, proto_iter: int) -> jnp.ndarray:
    """The (detached) source prototype used by the transfer losses
    (reference condgraph.py:459-460): mean over the ITER axis when 3-D."""
    p = jax.lax.stop_gradient(state.prototype)
    return p.mean(axis=-1) if proto_iter > 1 else p
