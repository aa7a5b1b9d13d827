"""Backbone factory registry.

Parity target: reference ``fcos_core/modeling/backbone/backbone.py:21-143``.
Each builder returns a flax Module mapping (B, H, W, 3) -> tuple of NHWC
pyramid levels (P3..P7 for the *-FPN-RETINANET bodies).
"""

from typing import Optional

import jax
from flax import linen as nn

from ...utils.registry import Registry
from .fpn import FPN
from .resnet import ResNet
from .vgg import VGG16

BACKBONES = Registry()


class _BackboneWithFPN(nn.Module):
    body_cls: type
    body_kwargs: dict
    fpn_kwargs: dict
    dtype: Optional[object] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kw = dict(self.body_kwargs)
        if self.quant and "quant" in type(self).body_quant_fields(self.body_cls):
            kw["quant"] = True
        feats = self.body_cls(dtype=self.dtype, name="body", **kw)(x)
        return FPN(
            dtype=self.dtype, quant=self.quant, name="fpn", **self.fpn_kwargs
        )(feats)

    @staticmethod
    def body_quant_fields(cls):
        import dataclasses

        return {f.name for f in dataclasses.fields(cls)}


@BACKBONES.register("VGG-16-FPN-RETINANET")
def build_vgg_fpn_backbone(cfg, dtype=None):
    return _BackboneWithFPN(
        body_cls=VGG16,
        body_kwargs=dict(
            frozen_stages=2,
            with_bn=cfg.MODEL.BACKBONE.VGG_W_BN,
            width_div=int(cfg.TPU.VGG_WIDTH_DIV),
            stem_chunk=int(cfg.TPU.STEM_CHUNK),
            pallas_stem=bool(cfg.TPU.PALLAS_STEM),
            stem_s8_epilogue=bool(cfg.TPU.get("STEM_S8_EPILOGUE", True)),
            stem_pair_conv=bool(cfg.TPU.get("STEM_PAIR_CONV", True)),
            pallas_conv0=bool(cfg.TPU.get("PALLAS_CONV0", False)),
            stem_im2col=bool(cfg.TPU.get("STEM_IM2COL_CONV0", False)),
            pallas_phase_max=bool(cfg.TPU.get("PALLAS_PHASE_MAX", False)),
            pallas_stem_int8=bool(cfg.TPU.get("PALLAS_STEM_INT8", False)),
            phase_max_form=str(cfg.TPU.get("PHASE_MAX_FORM", "slice")),
            # numerics are exactly equal either way (tests/test_s2d_stem),
            # so this is purely an execution-strategy choice: the packed
            # stride-2 stem is a large win on the TPU MXU but compiles and
            # runs poorly on the XLA:CPU backend used by the test mesh.
            s2d_stage1=bool(cfg.TPU.S2D_STEM)
            and jax.default_backend() != "cpu",
            **(
                {"stage_blocks": tuple(cfg.TPU.VGG_STAGE_BLOCKS)}
                if cfg.TPU.get("VGG_STAGE_BLOCKS") else {}
            ),
        ),
        fpn_kwargs=dict(
            in_features=tuple(cfg.TPU.get("FPN_IN_FEATURES") or (2, 3, 4)),
            out_channels=256,
            top_block=(
                None
                if cfg.TPU.get("FPN_TOP_BLOCK", "p6p7") == "none"
                else cfg.TPU.get("FPN_TOP_BLOCK", "p6p7")
            ),
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        ),
        dtype=dtype,
    )


@BACKBONES.register("R-50-FPN-RETINANET")
@BACKBONES.register("R-101-FPN-RETINANET")
def build_resnet_fpn_p3p7_backbone(cfg, dtype=None):
    depth = 101 if "101" in cfg.MODEL.BACKBONE.CONV_BODY else 50
    out_channels = cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS
    return _BackboneWithFPN(
        body_cls=ResNet,
        body_kwargs=dict(
            depth=depth,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
            stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        ),
        fpn_kwargs=dict(
            in_features=(1, 2, 3),  # C3, C4, C5
            out_channels=out_channels,
            top_block="p6p7",
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        ),
        dtype=dtype,
    )


@BACKBONES.register("R-50-FPN")
@BACKBONES.register("R-101-FPN")
def build_resnet_fpn_backbone(cfg, dtype=None):
    depth = 101 if "101" in cfg.MODEL.BACKBONE.CONV_BODY else 50
    return _BackboneWithFPN(
        body_cls=ResNet,
        body_kwargs=dict(
            depth=depth,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        ),
        fpn_kwargs=dict(
            in_features=(0, 1, 2, 3),
            out_channels=cfg.MODEL.RESNETS.BACKBONE_OUT_CHANNELS,
            top_block="maxpool",
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
        ),
        dtype=dtype,
    )


@BACKBONES.register("MNV2-FPN-RETINANET")
def build_mnv2_fpn_backbone(cfg, dtype=None):
    from .mobilenet import MobileNetV2

    out_channels = cfg.MODEL.BACKBONE.get("OUT_CHANNELS", 256) if hasattr(
        cfg.MODEL.BACKBONE, "get"
    ) else 256
    return _BackboneWithFPN(
        body_cls=MobileNetV2,
        body_kwargs=dict(freeze_at=0),
        fpn_kwargs=dict(
            in_features=(1, 2, 3),  # C3, C4, C5
            out_channels=out_channels,
            top_block="p6p7",
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        ),
        dtype=dtype,
    )


@BACKBONES.register("FBNet")
@BACKBONES.register("FBNET")
def build_fbnet_fpn_backbone(cfg, dtype=None):
    from .fbnet import FBNetTrunk

    return _BackboneWithFPN(
        body_cls=FBNetTrunk,
        body_kwargs=dict(
            arch=cfg.MODEL.FBNET.ARCH or "default",
            scale_factor=cfg.MODEL.FBNET.SCALE_FACTOR,
            width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
        ),
        fpn_kwargs=dict(
            in_features=(1, 2, 3),
            out_channels=256,
            top_block="p6p7",
            use_gn=cfg.MODEL.FPN.USE_GN,
            use_relu=cfg.MODEL.FPN.USE_RELU,
            use_c5_for_p6=cfg.MODEL.RETINANET.USE_C5,
        ),
        dtype=dtype,
    )


def build_backbone(cfg, dtype=None, quant: bool = False):
    body = cfg.MODEL.BACKBONE.CONV_BODY
    if body not in BACKBONES:
        raise KeyError(f"Unknown backbone: {body}")
    bb = BACKBONES[body](cfg, dtype=dtype)
    if quant:
        bb = bb.clone(quant=True)
    return bb
