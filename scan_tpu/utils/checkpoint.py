"""Checkpointing.

Parity target: reference ``fcos_core/utils/checkpoint.py:101-493``
(``DetectronCheckpointer``): multi-component state (one entry per model-dict
member + optimizer/scheduler state + iteration), a ``last_checkpoint``
pointer file for crash auto-resume, ``load(f, load_dis, load_opt_sch)``
semantics, and loading torch ``.pth`` files (ImageNet VGG / full SCAN
checkpoints) through the converter in ``torch_weights``.

Storage is orbax (async-capable, TPU-native) instead of torch.save.
"""

import logging
import os
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..modeling.condgraph.prototype import ProtoState

logger = logging.getLogger("scan_tpu.checkpoint")


class Checkpointer:
    def __init__(self, save_dir: str, detector=None):
        self.save_dir = os.path.abspath(save_dir)
        self.detector = detector
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------ #
    def save(self, name: str, params, proto_state: Optional[ProtoState] = None,
             opt_state=None, iteration: int = 0, extra: Optional[Dict] = None):
        path = os.path.join(self.save_dir, name)
        tree = {"params": params, "iteration": np.asarray(iteration)}
        if proto_state is not None:
            tree["prototype"] = proto_state.prototype
            tree["proto_counter"] = proto_state.counter
        if opt_state is not None:
            tree["opt_state"] = opt_state
        if extra:
            tree["extra"] = extra
        # One batched device->host fetch before handing the tree to orbax:
        # orbax otherwise pulls leaf-by-leaf, and per-leaf fetches through
        # a relayed TPU client pay full dispatch latency each (measured:
        # a model_final save over the axon relay ranged 14 s .. 13 min;
        # batched it is bounded by bandwidth, not round-trips).
        tree = jax.device_get(tree)
        self._ckptr.save(path, tree, force=True)
        # StandardCheckpointer.save is async; block until the files are on
        # disk so a process exiting right after save() (e.g. model_final at
        # the end of training) can't tear down the interpreter mid-write.
        self._ckptr.wait_until_finished()
        with open(os.path.join(self.save_dir, "last_checkpoint"), "w") as f:
            f.write(path)
        logger.info("saved checkpoint %s", path)
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, "last_checkpoint"))

    def get_checkpoint_file(self) -> str:
        try:
            with open(os.path.join(self.save_dir, "last_checkpoint")) as f:
                return f.read().strip()
        except OSError:
            return ""

    # ------------------------------------------------------------------ #
    def load(self, f: Optional[str], params, proto_state=None, opt_state=None,
             load_dis: bool = True, load_opt_sch: bool = True):
        """Reference-compatible resolution order: prefer the last_checkpoint
        pointer, else the given file (checkpoint.py:303-316)."""
        if self.has_checkpoint():
            f = self.get_checkpoint_file()
        if not f:
            logger.info("no checkpoint found; keeping initialisation")
            return params, proto_state, opt_state, 0
        if f.startswith(("catalog://", "http://", "https://")):
            from .model_zoo import resolve_weight_uri

            resolved = resolve_weight_uri(f)
            logger.info("%s resolved to %s", f, resolved)
            f = resolved
        if f.endswith(".pth") or f.endswith(".pkl"):
            params, proto_state = self._load_torch(f, params, proto_state, load_dis)
            return params, proto_state, opt_state, 0
        return self._load_orbax(f, params, proto_state, opt_state, load_opt_sch)

    def _load_orbax(self, path, params, proto_state, opt_state, load_opt_sch):
        target = {"params": params, "iteration": np.asarray(0)}
        if proto_state is not None:
            target["prototype"] = proto_state.prototype
            target["proto_counter"] = proto_state.counter
        if opt_state is not None and load_opt_sch:
            target["opt_state"] = opt_state
        try:
            restored = self._ckptr.restore(path, target)
        except ValueError:
            # Structure mismatch — typically restoring a training
            # checkpoint (which carries opt_state) for evaluation, where
            # no optimizer target exists (reference remove_solver_states
            # workflow; tools/test_net.py). transforms={} makes the
            # restore partial: on-disk keys missing from the target are
            # dropped instead of raising.
            ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
            restored = ckptr.restore(
                path,
                args=ocp.args.PyTreeRestore(
                    item=target,
                    transforms={},
                    restore_args=(
                        ocp.checkpoint_utils.construct_restore_args(target)
                    ),
                ),
            )
            logger.info(
                "partial restore of %s (extra on-disk state ignored)", path
            )
            # transforms={} silently keeps the passed-in (random-init)
            # value for any TARGET key absent on disk — which would let an
            # incompatible checkpoint "load" and evaluate garbage. Diff
            # the on-disk tree against the target and refuse unless every
            # unmatched target key is a known extra.
            try:
                disk_keys = _key_paths(ckptr.metadata(path).item_metadata.tree)
            except Exception as e:  # metadata layout varies across versions
                disk_keys = None
                logger.warning("could not read checkpoint metadata: %s", e)
            if disk_keys is not None:
                missing = _key_paths(target) - disk_keys
                benign = {
                    k for k in missing
                    if k.split("/")[0] in ("opt_state", "scheduler")
                }
                if missing - benign:
                    raise ValueError(
                        f"checkpoint {path} lacks {len(missing - benign)} "
                        "target keys (incompatible architecture?): "
                        + ", ".join(sorted(missing - benign)[:8])
                    )
        params = restored["params"]
        if proto_state is not None:
            proto_state = ProtoState(
                restored["prototype"], restored["proto_counter"]
            )
        if opt_state is not None and load_opt_sch and "opt_state" in restored:
            opt_state = restored["opt_state"]
        iteration = int(restored.get("iteration", 0))
        logger.info("restored %s at iteration %d", path, iteration)
        return params, proto_state, opt_state, iteration

    def _load_torch(self, path, params, proto_state, load_dis):
        from .torch_weights import load_reference_checkpoint

        converted, prototype = load_reference_checkpoint(path, self.detector)
        params = dict(params)
        for key, tree in converted.items():
            if key == "backbone_body":
                # ImageNet VGG: merge only the body convs
                bb = jax.tree_util.tree_map(lambda x: x, params["backbone"])
                merged = _merge(bb, {"params": {"body": tree}})
                params["backbone"] = merged
                logger.info("loaded ImageNet VGG body from %s", path)
                continue
            if key.startswith("dis_") and not load_dis:
                continue
            if key in params:
                params[key] = _merge(params[key], tree)
                logger.info("loaded component %s from %s", key, path)
        if prototype is not None and proto_state is not None:
            proto_state = ProtoState(
                jax.numpy.asarray(prototype), proto_state.counter
            )
        return params, proto_state


def _key_paths(tree):
    """Set of '/'-joined key paths of every leaf in a nested dict tree."""
    paths = set()

    def walk(node, prefix):
        if isinstance(node, dict) and node:
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            paths.add("/".join(prefix))

    walk(tree, ())
    return paths


def _merge(dst, src):
    """Recursively overlay src onto dst, checking shapes."""
    if not isinstance(src, dict):
        dst_arr = np.asarray(dst)
        src_arr = np.asarray(src)
        if dst_arr.shape != src_arr.shape:
            raise ValueError(
                f"shape mismatch loading checkpoint: {dst_arr.shape} vs {src_arr.shape}"
            )
        return jax.numpy.asarray(src_arr.astype(dst_arr.dtype))
    out = dict(dst)
    for k, v in src.items():
        if k not in out:
            raise KeyError(f"unexpected checkpoint key: {k}")
        out[k] = _merge(out[k], v)
    return out
