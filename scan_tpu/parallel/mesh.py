"""Device mesh / sharding helpers.

The reference scales with per-module DDP over NCCL
(reference ``tools/train_net_da.py:421-515``, ``utils/comm.py``) — and its DA
path is in practice single-GPU because the prototype buffer never syncs
(README.md:79). The TPU-native replacement is a 1-D data-parallel mesh:
params replicated, batch sharded over 'dp', gradients and batch prototypes
pmean'd inside one shard_mapped train step (riding ICI collectives).
"""


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed(enable: bool = False):
    """Multi-host runtime init (reference ``tools/train_net_da.py:698-703``
    init_process_group). jax.distributed discovers coordinator/process
    ids from the TPU/cluster environment (or SCAN_TPU_COORDINATOR /
    SCAN_TPU_NUM_PROCESSES / SCAN_TPU_PROCESS_ID overrides for plain-CPU
    clusters); enabled via --distributed or SCAN_TPU_DISTRIBUTED=1.

    When the caller EXPLICITLY asked for distributed mode, an init failure
    raises — silently training single-host after a failed init would be a
    correctness bug, not a fallback. 'Already initialised' stays a no-op.
    """
    import logging
    import os

    if not (enable or os.environ.get("SCAN_TPU_DISTRIBUTED") == "1"):
        return
    kwargs = {}
    if os.environ.get("SCAN_TPU_COORDINATOR"):
        kwargs = dict(
            coordinator_address=os.environ["SCAN_TPU_COORDINATOR"],
            num_processes=int(os.environ["SCAN_TPU_NUM_PROCESSES"]),
            process_id=int(os.environ["SCAN_TPU_PROCESS_ID"]),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            logging.getLogger("scan_tpu.mesh").warning(
                "jax.distributed already initialised: %s", e
            )
            return
        raise


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


# --------------------------------------------------------------------- #
# comm-style helpers (reference fcos_core/utils/comm.py:13-60)
# --------------------------------------------------------------------- #
def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize():
    """Barrier across processes (reference comm.synchronize)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("scan_tpu_sync")


def all_gather(data):
    """Gather a host pytree from every process (reference comm.all_gather,
    pickle-tensor based; here multihost_utils handles arbitrary pytrees)."""
    if jax.process_count() == 1:
        return [data]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(data)
    return list(gathered)


def reduce_loss_dict(loss_dict):
    """Mean losses across data-parallel replicas for logging (reference
    engine/trainer.py:76-98). Inside a shard_mapped step this is a pmean;
    at the host level single-process values pass through."""
    return loss_dict
