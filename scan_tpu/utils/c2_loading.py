"""Caffe2 / Detectron .pkl weight loading for ResNet backbones.

Parity target: reference ``fcos_core/utils/c2_model_loading.py`` (loads
Detectron ImageNet ResNet pickles, renames to the torch layout). Here the
Detectron names map straight onto the scan_tpu ResNet param tree:

  conv1_w                      -> stem_conv1 kernel
  res_conv1_bn_{s,b}           -> stem_bn1 (frozen BN affine; Detectron
                                   pickles ship pre-folded scale/bias)
  res{S}_{B}_branch2{a,b,c}_w  -> layer{S-1}_block{B} conv1/2/3
  res{S}_{B}_branch2{a..}_bn_* -> bn1/2/3
  res{S}_{B}_branch1_*         -> downsample conv/bn
"""

import pickle
from typing import Dict

import numpy as np


def load_c2_pickle(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items() if not k.endswith("_momentum")}


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


_BRANCH2 = {"a": ("conv1", "bn1"), "b": ("conv2", "bn2"), "c": ("conv3", "bn3")}


def convert_c2_resnet(blobs: Dict[str, np.ndarray]) -> Dict:
    """Detectron blob dict -> scan_tpu ResNet body param subtree."""
    out: Dict = {}

    def put(path, leaf, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for name, v in blobs.items():
        if name == "conv1_w":
            put(("stem_conv1", "Conv_0", "kernel"), None, None)  # placeholder
            out.setdefault("stem_conv1", {})["Conv_0"] = {"kernel": _conv(v)}
        elif name == "res_conv1_bn_s":
            out.setdefault("stem_bn1", {})["weight"] = v
        elif name == "res_conv1_bn_b":
            out.setdefault("stem_bn1", {})["bias"] = v
        elif name.startswith("res") and "_branch" in name:
            # res{S}_{B}_branch{1|2x}[_bn]_{w|s|b}
            head, branch = name.split("_branch")
            stage = int(head[3])  # res2..res5
            block = int(head.split("_")[1])
            tgt = f"layer{stage - 1}_block{block}"
            blk = out.setdefault(tgt, {})
            if branch.startswith("1"):
                if branch == "1_w":
                    blk.setdefault("downsample_conv", {})["Conv_0"] = {
                        "kernel": _conv(v)
                    }
                elif branch == "1_bn_s":
                    blk.setdefault("downsample_bn", {})["weight"] = v
                elif branch == "1_bn_b":
                    blk.setdefault("downsample_bn", {})["bias"] = v
            else:
                which = branch[1]  # a/b/c
                conv_name, bn_name = _BRANCH2[which]
                rest = branch[2:]
                if rest == "_w":
                    blk.setdefault(conv_name, {})["Conv_0"] = {
                        "kernel": _conv(v)
                    }
                elif rest == "_bn_s":
                    blk.setdefault(bn_name, {})["weight"] = v
                elif rest == "_bn_b":
                    blk.setdefault(bn_name, {})["bias"] = v

    # Detectron pickles fold BN stats into scale/bias; our FrozenBatchNorm
    # also carries running stats — identity-fill them.
    def fill_bn(node):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                if "weight" in v and "Conv_0" not in v and "running_mean" not in v:
                    c = v["weight"].shape[0]
                    v["running_mean"] = np.zeros(c, np.float32)
                    v["running_var"] = np.ones(c, np.float32)
                else:
                    fill_bn(v)

    fill_bn(out)
    return out
