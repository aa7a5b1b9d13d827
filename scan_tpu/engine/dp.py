"""Data-parallel (multi-chip) train step via shard_map over a 1-D mesh."""


import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..modeling.detector import SCANDetector
from .train_step import make_da_train_step


def make_dp_da_train_step(detector: SCANDetector, optimizer, mesh: Mesh,
                          forward_target: bool = False):
    """Full DA step sharded over the 'dp' axis: batch split, params
    replicated, grads + batch prototypes pmean'd on ICI."""
    step = make_da_train_step(detector, optimizer, axis_name="dp")

    def bound(params, opt_state, proto_state, batch_s, batch_t):
        return step(params, opt_state, proto_state, batch_s, batch_t,
                    forward_target=forward_target)

    sharded = jax.shard_map(
        bound,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P("dp")),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
