"""Device mesh / sharding helpers.

The reference scales with per-module DDP over NCCL
(reference ``tools/train_net_da.py:421-515``, ``utils/comm.py``) — and its DA
path is in practice single-GPU because the prototype buffer never syncs
(README.md:79). The TPU-native replacement is a 1-D data-parallel mesh:
params replicated, batch sharded over 'dp', gradients and batch prototypes
pmean'd inside one shard_mapped train step (riding ICI collectives).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp == -1:
        dp = len(devices)
    return Mesh(np.asarray(devices[:dp]).reshape(dp), ("dp",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
