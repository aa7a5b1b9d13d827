"""Torch checkpoint -> scan_tpu parameter conversion.

Covers two checkpoint families:
  * ImageNet-pretrained caffe VGG-16 (`vgg16_caffe-292e1171.pth`, mmcv
    layout `features.{idx}.weight`) used to initialise the backbone
    (reference configs/scan/*.yaml MODEL.WEIGHT);
  * full SCAN checkpoints saved by the reference's DetectronCheckpointer
    (reference ``fcos_core/utils/checkpoint.py:141-301``): one state_dict
    per model-dict entry (``model_backbone`` / ``model_fcos`` /
    ``middle_head`` / ``model_dis_P*_CON`` ...), with the prototype buffer
    inside ``middle_head``.

Layout conversions (torch NCHW -> flax NHWC):
  conv weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
  linear weight (O, I)       -> kernel (I, O)
  norm weight/bias           -> scale/bias
"""

from typing import Dict

import numpy as np

# torch Sequential indices of the 13 VGG-16 convs in mmcv's `features`
VGG16_TORCH_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _t(x):
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def conv_w(x):
    return _t(x).transpose(2, 3, 1, 0)


def lin_w(x):
    return _t(x).transpose(1, 0)


def _strip_prefix(sd: Dict, prefix: str = "module."):
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in sd.items()
    }


def load_torch_file(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt
    return ckpt


def convert_vgg16_caffe(state_dict: Dict) -> Dict:
    """caffe-VGG16 `features.*` -> backbone body param subtree."""
    sd = _strip_prefix(state_dict.get("state_dict", state_dict))
    sd = {k.replace("body.", ""): v for k, v in sd.items()}
    out = {}
    for my_idx, t_idx in enumerate(VGG16_TORCH_CONV_IDX):
        w = sd.get(f"features.{t_idx}.weight")
        b = sd.get(f"features.{t_idx}.bias")
        if w is None:
            raise KeyError(f"missing VGG conv features.{t_idx}.weight")
        out[f"conv{my_idx}"] = {
            "Conv_0": {"kernel": conv_w(w), "bias": _t(b)}
        }
    return out


def convert_fpn(sd: Dict) -> Dict:
    """Reference FPN names use the absolute in_channels_list index
    (fpn_inner3..5 for VGG: the first two entries are 0-channel
    placeholders, backbone.py:30-37); ours are 1-based over used levels."""
    out = {}
    ref_ids = sorted(
        {
            int(k.split(".")[0][len("fpn_inner"):])
            for k in sd
            if k.startswith("fpn_inner")
        }
    )
    for my_i, ref_i in enumerate(ref_ids, 1):
        for kind in ("inner", "layer"):
            w = sd[f"fpn_{kind}{ref_i}.weight"]
            b = sd[f"fpn_{kind}{ref_i}.bias"]
            out[f"fpn_{kind}{my_i}"] = {
                "Conv_0": {"kernel": conv_w(w), "bias": _t(b)}
            }
    for p in ("p6", "p7"):
        if f"top_blocks.{p}.weight" in sd:
            out[p] = {
                "Conv_0": {
                    "kernel": conv_w(sd[f"top_blocks.{p}.weight"]),
                    "bias": _t(sd[f"top_blocks.{p}.bias"]),
                }
            }
    return out


def convert_tower(sd: Dict, prefix: str, num_convs: int, with_gn=True) -> Dict:
    """torch Sequential [conv, GN, relu]*n -> ConvTower params."""
    out = {}
    step = 3 if with_gn else 2
    for i in range(num_convs):
        ci = i * step
        out[f"conv{i}"] = {
            "Conv_0": {
                "kernel": conv_w(sd[f"{prefix}.{ci}.weight"]),
                "bias": _t(sd[f"{prefix}.{ci}.bias"]),
            }
        }
        if with_gn:
            out[f"gn{i}"] = {
                "GroupNorm_0": {
                    "scale": _t(sd[f"{prefix}.{ci + 1}.weight"]),
                    "bias": _t(sd[f"{prefix}.{ci + 1}.bias"]),
                }
            }
    return out


def convert_backbone(state_dict: Dict) -> Dict:
    sd = _strip_prefix(state_dict)
    body_sd = {k[len("body."):]: v for k, v in sd.items() if k.startswith("body.")}
    fpn_sd = {k[len("fpn."):]: v for k, v in sd.items() if k.startswith("fpn.")}
    return {
        "params": {
            "body": convert_vgg16_caffe(body_sd),
            "fpn": convert_fpn(fpn_sd),
        }
    }


def convert_fcos_head(state_dict: Dict, num_convs_cls=4, num_convs_reg=4,
                      num_levels=5) -> Dict:
    sd = _strip_prefix(state_dict)
    sd = {k[len("head."):]: v for k, v in sd.items() if k.startswith("head.")}
    params = {}
    params["cls_tower"] = convert_tower(sd, "cls_tower", num_convs_cls)
    params["bbox_tower"] = convert_tower(sd, "bbox_tower", num_convs_reg)
    for name in ("cls_logits", "bbox_pred", "centerness"):
        params[name] = {
            "Conv_0": {
                "kernel": conv_w(sd[f"{name}.weight"]),
                "bias": _t(sd[f"{name}.bias"]),
            }
        }
    for l in range(num_levels):
        params[f"scale{l}"] = {"scale": _t(sd[f"scales.{l}.scale"])}
    return {"params": params}


def convert_middle_head(state_dict: Dict, cg_cfg) -> Dict:
    """GRAPHModule state_dict -> CondGraph params (+ prototype array)."""
    sd = _strip_prefix(state_dict)
    params = {}
    params["head_in"] = convert_tower(
        sd, "head_in.middle_tower", cg_cfg.num_convs_in, with_gn=True
    )
    if cg_cfg.cat_act_map:
        params["head_out"] = convert_tower(
            sd, "head_out.middle_tower", cg_cfg.num_convs_out, with_gn=False
        )
    for name, mine in (("proto_cls_hidden", "proto_cls_hidden"),
                       ("proto_cls", "proto_cls")):
        params[mine] = {
            "kernel": lin_w(sd[f"{name}.weight"]),
            "bias": _t(sd[f"{name}.bias"]),
        }
    if cg_cfg.global_gcn:
        mha = {}
        for lin in ("linear_q", "linear_k", "linear_v", "linear_final"):
            mha[lin] = {
                "kernel": lin_w(sd[f"multihead_attn.{lin}.weight"]),
                "bias": _t(sd[f"multihead_attn.{lin}.bias"]),
            }
        mha["layer_norm"] = {
            "scale": _t(sd["multihead_attn.layer_norm.weight"]),
            "bias": _t(sd["multihead_attn.layer_norm.bias"]),
        }
        params["multihead_attn"] = mha
    else:
        for lin in ("gcn_layer1", "gcn_layer2"):
            params[lin] = {
                "kernel": lin_w(sd[f"{lin}.weight"]),
                "bias": _t(sd[f"{lin}.bias"]),
            }
    if cg_cfg.use_rnn:
        rnn = {}
        for layer in range(2):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                v = sd[f"cond_rnn.{kind}_l{layer}"]
                rnn[f"{kind}_l{layer}"] = _t(v)
        params["cond_rnn"] = rnn
        # cond_nx1: torch Conv2d(512 -> 256, (ITER, 1)) == Dense over the
        # (512, ITER) axes flattened channel-major (see CondGraph).
        w = _t(sd["cond_nx1.weight"])  # (256, 512, ITER, 1)
        o, i, t, _ = w.shape
        params["cond_nx1"] = {
            "kernel": w[:, :, :, 0].reshape(o, i * t).transpose(1, 0),
            "bias": _t(sd["cond_nx1.bias"]),
        }
    elif cg_cfg.proto_iter > 1:
        w = _t(sd["cond_nx1.weight"])
        o, i, t, _ = w.shape
        params["cond_nx1"] = {
            "kernel": w[:, :, :, 0].reshape(o, i * t).transpose(1, 0),
            "bias": _t(sd["cond_nx1.bias"]),
        }
        params["cond_nx1_norm"] = {
            "scale": _t(sd["cond_nx1_norm.weight"]),
            "bias": _t(sd["cond_nx1_norm.bias"]),
        }
    else:
        params["cond_1"] = {
            "kernel": lin_w(sd["cond_1.weight"]),
            "bias": _t(sd["cond_1.bias"]),
        }
    # cond_2 exists in every reference checkpoint but is DEAD in the RNN
    # path (get_conded_weight never calls it, condgraph.py:313-319), so our
    # RNN-mode param tree doesn't materialise it — skip it there.
    if "cond_2.weight" in sd and not cg_cfg.use_rnn:
        params["cond_2"] = {
            "kernel": lin_w(sd["cond_2.weight"]),
            "bias": _t(sd["cond_2.bias"]),
        }
    prototype = _t(sd["prototype"])
    return {"params": params}, prototype


def convert_con_discriminator(state_dict: Dict, num_convs=4, num_fg=8) -> Dict:
    sd = _strip_prefix(state_dict)
    params = {}
    params["dis_tower"] = convert_tower(sd, "dis_tower", num_convs)
    for c in range(num_fg):
        params[f"classifier_cls_{c}_0"] = {
            "Conv_0": {
                "kernel": conv_w(sd[f"classifier_cls_{c}.0.weight"]),
                "bias": _t(sd[f"classifier_cls_{c}.0.bias"]),
            }
        }
        params[f"classifier_cls_{c}_1"] = {
            "Conv_0": {
                "kernel": conv_w(sd[f"classifier_cls_{c}.2.weight"]),
                "bias": _t(sd[f"classifier_cls_{c}.2.bias"]),
            }
        }
    return {"params": params}


def load_reference_checkpoint(path: str, detector):
    """Load a full reference SCAN .pth into (params, prototype) pieces.

    Returns dict with whatever components the checkpoint carries; missing
    components keep their randomly-initialised values (the caller merges).
    """
    ckpt = load_torch_file(path)
    out = {}
    prototype = None
    if "model_backbone" in ckpt:
        out["backbone"] = convert_backbone(ckpt["model_backbone"])
    if "model_fcos" in ckpt:
        out["fcos"] = convert_fcos_head(
            ckpt["model_fcos"],
            detector.cfg.MODEL.FCOS.NUM_CONVS_CLS,
            detector.cfg.MODEL.FCOS.NUM_CONVS_REG,
        )
    if "middle_head" in ckpt:
        mh, prototype = convert_middle_head(ckpt["middle_head"], detector.cg_cfg)
        out["middle_head"] = mh
    for k in ckpt:
        if k.startswith("model_dis_") and k.endswith("_CON"):
            name = k[len("model_"):]
            out[name] = convert_con_discriminator(
                ckpt[k],
                num_fg=detector.cfg.MODEL.FCOS.NUM_CLASSES - 1,
            )
    # plain ImageNet VGG file (no component nesting)
    if not out and any("features" in k for k in getattr(ckpt, "keys", lambda: [])()):
        out["backbone_body"] = convert_vgg16_caffe(ckpt)
    return out, prototype
