"""Data-parallel (multi-chip) train steps via shard_map over a 1-D mesh.

Parity target: the reference wires per-module DDP into its entry point
(reference ``tools/train_net_da.py:421-515,698-703``); its DA path is in
practice single-GPU because the prototype buffer never syncs. Here one
shard_mapped step shards the global batch over the 'dp' axis, replicates
params, and pmeans gradients AND batch prototypes on ICI — the same
per-replica-normalise-then-average gradient semantics as DDP, plus the
prototype sync the reference lacks.
"""

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..modeling.detector import SCANDetector
from .train_step import make_da_train_step, make_source_only_train_step


def _shard_mapped(bound, mesh: Mesh, n_batches: int, n_extra: int = 0):
    """jit(shard_map(bound)): params/opt/proto replicated, batches sharded,
    trailing ``n_extra`` args (e.g. a dropout rng key) replicated."""
    specs = (P(), P(), P()) + (P("dp"),) * n_batches + (P(),) * n_extra
    return jax.jit(
        jax.shard_map(
            bound, mesh=mesh,
            in_specs=specs,
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
    )


def make_dp_da_train_step(detector: SCANDetector, optimizer, mesh: Mesh,
                          forward_target=None):
    """Full DA step sharded over the 'dp' axis.

    With ``forward_target=None`` (default) returns a dispatcher with the
    same signature as the single-device step from ``make_da_train_step`` —
    ``step(params, opt_state, proto_state, batch_s, batch_t,
    forward_target=bool)`` — compiling one shard_mapped variant per gate
    value on first use (the AP50 gate changes which subgraphs exist, so it
    must stay trace-static). Passing a bool pins a single variant and the
    returned step takes no gate argument.
    """
    step = make_da_train_step(detector, optimizer, axis_name="dp")

    def variant(ft: bool, with_rng: bool):
        if with_rng:
            def bound(params, opt_state, proto_state, batch_s, batch_t, rng):
                return step(params, opt_state, proto_state, batch_s, batch_t,
                            forward_target=ft, rng=rng)
        else:
            def bound(params, opt_state, proto_state, batch_s, batch_t):
                return step(params, opt_state, proto_state, batch_s, batch_t,
                            forward_target=ft)

        return _shard_mapped(bound, mesh, n_batches=2,
                             n_extra=int(with_rng))

    if forward_target is not None:
        return variant(bool(forward_target), with_rng=False)

    variants = {}

    def dispatch(params, opt_state, proto_state, batch_s, batch_t,
                 forward_target: bool = False, rng=None):
        key = (bool(forward_target), rng is not None)
        if key not in variants:
            variants[key] = variant(*key)
        args = (params, opt_state, proto_state, batch_s, batch_t)
        if rng is not None:
            args = args + (rng,)
        return variants[key](*args)

    return dispatch


def make_dp_source_only_train_step(detector: SCANDetector, optimizer,
                                   mesh: Mesh):
    """Source-only (non-DA) step sharded over the 'dp' axis
    (multi-chip form of ``make_source_only_train_step``)."""
    step = make_source_only_train_step(detector, optimizer, axis_name="dp")

    def variant(with_rng: bool):
        if with_rng:
            def bound(params, opt_state, proto_state, batch, rng):
                return step(params, opt_state, proto_state, batch, rng=rng)
        else:
            def bound(params, opt_state, proto_state, batch):
                return step(params, opt_state, proto_state, batch)

        return _shard_mapped(bound, mesh, n_batches=1, n_extra=int(with_rng))

    variants = {}

    def dispatch(params, opt_state, proto_state, batch, rng=None):
        key = rng is not None
        if key not in variants:
            variants[key] = variant(key)
        args = (params, opt_state, proto_state, batch)
        if rng is not None:
            args = args + (rng,)
        return variants[key](*args)

    return dispatch


def build_da_train_step(detector: SCANDetector, optimizer, mesh=None):
    """Single-device or dp step behind one signature. ``mesh=None`` or a
    1-device mesh gives the plain jitted step."""
    if mesh is None or mesh.size == 1:
        return make_da_train_step(detector, optimizer)
    return make_dp_da_train_step(detector, optimizer, mesh)


def build_source_only_train_step(detector: SCANDetector, optimizer, mesh=None):
    if mesh is None or mesh.size == 1:
        return make_source_only_train_step(detector, optimizer)
    return make_dp_source_only_train_step(detector, optimizer, mesh)
