"""Load the reference fcos_core (pure PyTorch, CPU) for numeric parity tests.

The upstream SCAN code assumes a CUDA box: it hard-codes ``.to('cuda')``
throughout (e.g. reference ``fcos_core/modeling/rpn/fcos/condgraph.py:170-237``)
and binds a compiled extension ``fcos_core._C`` for NMS
(``fcos_core/layers/nms.py:3-6``). This module makes it runnable on the CPU in
this image without touching the read-only reference tree:

  * ``yacs`` is aliased to this repo's yacs-compatible ``ConfigNode``;
  * ``ipdb`` / ``pycocotools`` get inert stubs (parity tests never hit the
    ATSS adapt-topk path that constructs a COCO object);
  * ``fcos_core._C`` is stubbed with a torch greedy NMS that reproduces the
    reference kernels' '+1'-area convention
    (``fcos_core/csrc/cpu/nms_cpu.cpp:23-62``, ``csrc/cuda/ml_nms.cu:19-22``);
  * a ``TorchFunctionMode`` rewrites every explicit cuda device argument to
    cpu, covering ``.to('cuda')``, ``.cuda()`` and factory ``device=`` kwargs.

Nothing here is imported by ``scan_tpu`` — test-only support code.
"""

import sys
import types

import torch
from torch.overrides import TorchFunctionMode

REF_ROOT = "/root/reference"

_READY = False


def _greedy_nms(boxes: torch.Tensor, scores: torch.Tensor, thresh: float):
    """'+1'-convention greedy NMS (reference csrc/cuda/nms.cu semantics:
    suppress at IoU > thresh)."""
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.long)
    order = scores.argsort(descending=True)
    x1, y1, x2, y2 = boxes.unbind(1)
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    keep = []
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        w = (xx2 - xx1 + 1).clamp(min=0)
        h = (yy2 - yy1 + 1).clamp(min=0)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return torch.tensor(keep, dtype=torch.long)


def _greedy_ml_nms(boxes, scores, labels, thresh):
    """Label-aware NMS via the standard coordinate-offset trick
    (matches csrc/cuda/ml_nms.cu: boxes of different labels never overlap)."""
    if boxes.numel() == 0:
        return torch.empty(0, dtype=torch.long)
    offset = labels.to(boxes.dtype) * (boxes.max() + 2.0)
    return _greedy_nms(boxes + offset[:, None], scores, thresh)


class _CudaToCpu(TorchFunctionMode):
    """Rewrite explicit cuda devices to cpu in every torch call."""

    @staticmethod
    def _fix(v):
        if isinstance(v, str) and v.startswith("cuda"):
            return torch.device("cpu")
        if isinstance(v, torch.device) and v.type == "cuda":
            return torch.device("cpu")
        return v

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = kwargs or {}
        name = getattr(func, "__name__", "")
        if name == "cuda" and args and isinstance(args[0], torch.Tensor):
            return args[0]
        args = tuple(self._fix(a) for a in args)
        kwargs = {k: self._fix(v) for k, v in kwargs.items()}
        # old-torch leniency: the reference passes a (1, K*K) all-ones
        # target to CosineEmbeddingLoss (condgraph.py:479-481); modern
        # torch requires a 1D (N,) target. Same semantics, reshaped.
        if (
            name == "cosine_embedding_loss"
            and len(args) >= 3
            and isinstance(args[2], torch.Tensor)
            and args[2].dim() > 1
        ):
            n = args[0].shape[0]
            args = (args[0], args[1], args[2].reshape(-1)[:n]) + args[3:]
        try:
            return func(*args, **kwargs)
        except RuntimeError as e:
            # old-torch code: .view() on tensors modern torch considers
            # non-contiguous (reference fcos_core/modeling/rpn/fcos/
            # inference.py:76) — fall back to reshape
            if name == "view" and "view size is not compatible" in str(e):
                return torch.Tensor.reshape(*args, **kwargs)
            raise


def setup_reference():
    """Idempotently make ``import fcos_core`` work on CPU."""
    global _READY
    if _READY:
        return
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    from scan_tpu.config.node import ConfigNode

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = ConfigNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    ipdb = types.ModuleType("ipdb")
    ipdb.set_trace = lambda: None
    sys.modules.setdefault("ipdb", ipdb)

    pct = types.ModuleType("pycocotools")
    pcc = types.ModuleType("pycocotools.coco")

    class _COCO:  # only referenced by the ATSS adapt-topk path
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools stub: not available in parity tests")

    pcc.COCO = _COCO
    pct.coco = pcc
    sys.modules.setdefault("pycocotools", pct)
    sys.modules.setdefault("pycocotools.coco", pcc)

    ext = types.ModuleType("fcos_core._C")
    ext.nms = _greedy_nms
    ext.ml_nms = _greedy_ml_nms
    sys.modules["fcos_core._C"] = ext

    _CudaToCpu().__enter__()  # stays active for the process lifetime

    import fcos_core

    fcos_core._C = ext

    # The reference CPU focal loss (fcos_core/layers/sigmoid_focal_loss.py:
    # 40-44) indexes gamma[0]/alpha[0] — written for a tuple signature the
    # module never uses, so the CPU path crashes on floats. Wrap it to accept
    # the scalar the nn.Module actually passes; numerics unchanged.
    from fcos_core.layers import sigmoid_focal_loss as _sfl

    _orig_cpu = _sfl.sigmoid_focal_loss_cpu

    def _cpu_scalar_ok(logits, targets, gamma, alpha):
        if not isinstance(gamma, (tuple, list)):
            gamma = (gamma,)
        if not isinstance(alpha, (tuple, list)):
            alpha = (alpha,)
        return _orig_cpu(logits, targets, gamma, alpha)

    _sfl.sigmoid_focal_loss_cpu = _cpu_scalar_ok
    _READY = True


def ref_cfg(yaml_path: str, opts=()):
    """A fresh frozen-free reference cfg merged from yaml + opt list."""
    setup_reference()
    from fcos_core.config import cfg as _base

    c = _base.clone()
    c.merge_from_file(yaml_path)
    if opts:
        c.merge_from_list(list(opts))
    c.MODEL.DEVICE = "cpu"
    return c


def build_ref_modules(cfg, seed: int = 0):
    """The reference model dict on CPU (reference tools/train_net_da.py:43-49):
    backbone / middle_head (if CONDGRAPH_ON) / fcos."""
    setup_reference()
    torch.manual_seed(seed)
    from fcos_core.modeling.backbone import build_backbone
    from fcos_core.modeling.rpn.rpn import build_middle_head, build_rpn

    modules = {}
    backbone = build_backbone(cfg)
    modules["backbone"] = backbone
    if cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON:
        modules["middle_head"] = build_middle_head(cfg, backbone.out_channels)
    modules["fcos"] = build_rpn(cfg, backbone.out_channels)
    for m in modules.values():
        m.float().eval()
    return modules


def checkpoint_dict(modules):
    """State dicts in the reference DetectronCheckpointer layout
    (reference fcos_core/utils/checkpoint.py save: one entry per model-dict
    component, keys ``model_backbone`` / ``model_fcos`` / ``middle_head``)."""
    out = {}
    for name, m in modules.items():
        key = "middle_head" if name == "middle_head" else f"model_{name}"
        out[key] = {k: v.detach().clone() for k, v in m.state_dict().items()}
    return out


def to_image_list(tensor_batch, size_divisible=32):
    setup_reference()
    from fcos_core.structures.image_list import to_image_list as _til

    return _til(tensor_batch, size_divisible)


def make_boxlist(boxes_xyxy, labels, image_size_wh):
    """A reference BoxList with labels field (training targets)."""
    setup_reference()
    from fcos_core.structures.bounding_box import BoxList

    bl = BoxList(torch.as_tensor(boxes_xyxy, dtype=torch.float32),
                 image_size_wh, mode="xyxy")
    bl.add_field("labels", torch.as_tensor(labels, dtype=torch.int64))
    return bl
