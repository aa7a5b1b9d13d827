"""The fused DA training step.

Parity target: reference ``fcos_core/engine/trainer.py:241-424``. The
reference runs three sequential ``backward()`` calls (G-source with
retain_graph, D-source, D-target+GST) and then steps every optimizer once.
Because all optimizers step exactly once per iteration, the accumulated
gradient equals the gradient of the SUM of all loss terms — so the
TPU-native form is a single ``jax.value_and_grad`` over

    L = L_G(source) + sum_l L_D(source, l) + [forward_target-gated]
        (L_GST + L_node_tg) + sum_l L_D(target, l)

with the gradient-reversal layers providing the adversarial sign exactly as
in the reference. The AP50 gate on the target GST pass
(``trainer.py:350``) changes which subgraphs exist, so two step variants are
compiled (forward_target static).

Data parallelism: the step is written with optional ``axis_name``; under
``shard_map``/pmap the gradients AND the batch prototype means are pmean'd
— fixing the reference's prototype-desync that restricted it to one GPU
(reference README.md:79).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..modeling.detector import SCANDetector


def _fused_pmean(axis_name, *trees):
    """pmean every float leaf of the given pytrees in ONE all-reduce.

    The grad tree has hundreds of leaves; per-leaf ``lax.pmean`` emits one
    collective each and leans on XLA's all-reduce combiner to merge them
    (which O0 / some backends skip, and which costs one 8-way rendezvous
    per collective on the CPU test mesh). Concatenating into a single f32
    vector guarantees exactly one all-reduce per step on every backend.
    Non-float leaves (counters) pass through unchanged.
    """
    leaves, treedef = jax.tree_util.tree_flatten(trees)
    idx = [i for i, l in enumerate(leaves)
           if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if idx:
        flat = jnp.concatenate(
            [jnp.ravel(leaves[i]).astype(jnp.float32) for i in idx]
        )
        flat = jax.lax.pmean(flat, axis_name)
        off = 0
        for i in idx:
            l = leaves[i]
            n = l.size
            leaves[i] = flat[off:off + n].reshape(jnp.shape(l)).astype(
                jnp.asarray(l).dtype
            )
            off += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_da_train_step(detector: SCANDetector, optimizer,
                       axis_name: Optional[str] = None):
    """Returns train_step(params, opt_state, proto_state, batch_s, batch_t,
    forward_target) -> (params, opt_state, proto_state, metrics).

    batch_s: dict(images, sizes, boxes, labels, mask); batch_t: dict(images).
    forward_target must be a static python bool at trace time.
    """

    def loss_fn(params, proto_state, batch_s, batch_t, forward_target: bool,
                rng=None):
        metrics = {}
        targets = {
            "boxes": batch_s["boxes"],
            "labels": batch_s["labels"],
            "mask": batch_s["mask"],
        }
        rng_s = rng_t = None
        if rng is not None:
            rng_s, rng_t = jax.random.split(rng)
        # ---- (1) G on source ----
        losses_s, feats_s, act_s, score_maps_s, new_proto = (
            detector.forward_train(
                params, proto_state, batch_s["images"], targets, "source",
                rng=rng_s,
            )
        )
        metrics.update({k + "_gs": v for k, v in losses_s.items()})

        # ---- (2) D on source ----
        d_src = detector.discriminator_losses(
            params, feats_s, act_s, score_maps_s, 1.0, "source"
        )
        metrics.update(d_src)

        # ---- (3) target: GST (gated) + D ----
        d_tgt = {}
        losses_t = {}
        if detector.cfg.MODEL.DA_ON:
            losses_t, feats_t, act_t, score_maps_t, _ = detector.forward_train(
                params, new_proto, batch_t["images"], None, "target",
                forward_target=forward_target, rng=rng_t,
            )
            metrics.update({k + "_gt": v for k, v in losses_t.items()})
            d_tgt = detector.discriminator_losses(
                params, feats_t, act_t, score_maps_t, 0.0, "target"
            )
            metrics.update(d_tgt)

        total = sum(losses_s.values())
        total = total + sum(d_src.values()) + sum(d_tgt.values())
        total = total + sum(losses_t.values())
        metrics["loss_total"] = total
        return total, (metrics, new_proto)

    def train_step(params, opt_state, proto_state, batch_s, batch_t,
                   forward_target: bool = False, rng=None):
        if rng is not None and axis_name is not None:
            # independent dropout draws per data-parallel replica
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_proto)), grads = grad_fn(
            params, proto_state, batch_s, batch_t, forward_target, rng
        )
        if axis_name is not None:
            proto_mean = (new_proto.prototype if new_proto is not None
                          else None)
            grads, metrics, proto_mean = _fused_pmean(
                axis_name, grads, metrics, proto_mean
            )
            if new_proto is not None:
                new_proto = type(new_proto)(proto_mean, new_proto.counter)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_proto, metrics

    if axis_name is None:
        train_step = jax.jit(train_step, static_argnames=("forward_target",))
    return train_step


def make_source_only_train_step(detector: SCANDetector, optimizer,
                                axis_name: Optional[str] = None):
    """Plain (non-DA) training step (reference trainer.py:153-240 /
    tools/train_net.py)."""

    def loss_fn(params, proto_state, batch, rng=None):
        targets = {
            "boxes": batch["boxes"],
            "labels": batch["labels"],
            "mask": batch["mask"],
        }
        losses, _, _, _, new_proto = detector.forward_train(
            params, proto_state, batch["images"], targets, "source", rng=rng
        )
        total = sum(losses.values())
        losses["loss_total"] = total
        return total, (losses, new_proto)

    def train_step(params, opt_state, proto_state, batch, rng=None):
        if rng is not None and axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        (loss, (metrics, new_proto)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, proto_state, batch, rng)
        if axis_name is not None:
            proto_mean = (new_proto.prototype if new_proto is not None
                          else None)
            grads, metrics, proto_mean = _fused_pmean(
                axis_name, grads, metrics, proto_mean
            )
            if new_proto is not None:
                new_proto = type(new_proto)(proto_mean, new_proto.counter)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_proto, metrics

    if axis_name is None:
        train_step = jax.jit(train_step)
    return train_step

