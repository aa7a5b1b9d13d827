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

    # torch._six was removed in torch>=1.13; the reference's
    # utils/imports.py:4 still gates on torch._six.PY3 (always true here).
    if not hasattr(torch, "_six"):
        six = types.ModuleType("torch._six")
        six.PY3 = True
        six.string_classes = (str, bytes)
        six.int_classes = (int,)
        torch._six = six
        sys.modules["torch._six"] = six

    # torchvision is not installed; the reference only needs (a) the
    # CocoDetection base class (fcos_core/data/datasets/coco.py:39) and
    # (b) four functional ops in data/transforms/transforms.py, all of
    # which are thin PIL/torch wrappers reimplemented faithfully here
    # (F.resize == PIL bilinear with (h, w) size, torchvision semantics).
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_ds = types.ModuleType("torchvision.datasets")
        tv_ds_coco = types.ModuleType("torchvision.datasets.coco")

        class _CocoDetection:
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "torchvision stub: CocoDetection not usable in tests"
                )

        tv_ds_coco.CocoDetection = _CocoDetection
        tv_ds.coco = tv_ds_coco
        tv_ds.CocoDetection = _CocoDetection
        tv_tr = types.ModuleType("torchvision.transforms")
        tv_f = types.ModuleType("torchvision.transforms.functional")

        def _f_resize(img, size):
            from PIL import Image

            if isinstance(size, (list, tuple)):
                oh, ow = size
            else:  # int: match smaller edge (unused by the reference)
                w, h = img.size
                if w < h:
                    ow, oh = size, int(size * h / w)
                else:
                    oh, ow = size, int(size * w / h)
            return img.resize((ow, oh), Image.BILINEAR)

        def _f_hflip(img):
            from PIL import Image

            return img.transpose(Image.FLIP_LEFT_RIGHT)

        def _f_to_tensor(img):
            import numpy as _np

            arr = _np.asarray(img, dtype=_np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

        def _f_normalize(t, mean, std):
            mean = torch.as_tensor(mean, dtype=t.dtype).view(-1, 1, 1)
            std = torch.as_tensor(std, dtype=t.dtype).view(-1, 1, 1)
            return (t - mean) / std

        tv_f.resize = _f_resize
        tv_f.hflip = _f_hflip
        tv_f.to_tensor = _f_to_tensor
        tv_f.normalize = _f_normalize
        tv_tr.functional = tv_f
        tv.transforms = tv_tr
        tv.datasets = tv_ds
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.datasets"] = tv_ds
        sys.modules["torchvision.datasets.coco"] = tv_ds_coco
        sys.modules["torchvision.transforms"] = tv_tr
        sys.modules["torchvision.transforms.functional"] = tv_f

    pct = types.ModuleType("pycocotools")
    pcc = types.ModuleType("pycocotools.coco")

    class _COCO:  # only referenced by the ATSS adapt-topk path
        def __init__(self, *a, **k):
            raise RuntimeError("pycocotools stub: not available in parity tests")

    pcc.COCO = _COCO
    pct.coco = pcc
    pcm = types.ModuleType("pycocotools.mask")

    def _mask_unavailable(*a, **k):
        raise RuntimeError("pycocotools.mask stub: not available in tests")

    pcm.frPyObjects = _mask_unavailable
    pcm.decode = _mask_unavailable
    pcm.encode = _mask_unavailable
    pcm.iou = _mask_unavailable
    pct.mask = pcm
    # mark as a package so `import pycocotools.mask` resolves
    pct.__path__ = []
    sys.modules.setdefault("pycocotools", pct)
    sys.modules.setdefault("pycocotools.coco", pcc)
    sys.modules.setdefault("pycocotools.mask", pcm)

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
