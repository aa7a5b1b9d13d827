"""GeneralizedRCNN: backbone + RPN + RoI heads assembly.

Parity target: reference ``fcos_core/modeling/detector/generalized_rcnn.py:16-70``
— the two-stage (Faster R-CNN) path used by ``tools/train_net.py`` and the
demo when RPN_ONLY is False. The SCAN DA pipeline itself uses the
single-stage SCANDetector; this class completes the framework's detector
family.
"""


import jax
import jax.numpy as jnp

from .backbone.build import build_backbone
from .anchors import grid_anchors
from .roi_heads import (
    RoIBoxConfig,
    RoIBoxHead,
    fpn_pooler,
    match_proposals,
    roi_box_losses,
    roi_box_postprocess,
)
from .rpn_anchor import RPNConfig, RPNHead, rpn_losses, rpn_proposals


class FasterRCNN:
    def __init__(self, cfg):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else None
        self.backbone = build_backbone(cfg, dtype=dtype)
        self.rpn_cfg_train = RPNConfig.from_cfg(cfg, is_train=True)
        self.rpn_cfg_test = RPNConfig.from_cfg(cfg, is_train=False)
        self.rpn_head = RPNHead(
            num_anchors=self.rpn_cfg_train.num_anchors, dtype=dtype
        )
        self.box_cfg = RoIBoxConfig.from_cfg(cfg)
        self.box_head = RoIBoxHead(self.box_cfg, dtype=dtype)

    def _anchors(self, feats, rpn_cfg):
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        strides = rpn_cfg.strides
        if len(strides) != len(shapes):
            strides = tuple(strides[:1]) * len(shapes)
        sizes = [(s,) for s in rpn_cfg.anchor_sizes[: len(shapes)]]
        if len(sizes) != len(shapes):
            sizes = [(rpn_cfg.anchor_sizes[0],)] * len(shapes)
        return grid_anchors(shapes, strides, sizes, rpn_cfg.aspect_ratios)

    def init_params(self, rng, sample_images):
        def build(rng):
            k1, k2, k3 = jax.random.split(rng, 3)
            params = {}
            params["backbone"] = self.backbone.init(k1, sample_images)
            feats = self.backbone.apply(params["backbone"], sample_images)
            params["rpn"] = self.rpn_head.init(k2, list(feats))
            pooled = jnp.zeros(
                (4, self.box_cfg.pooler_resolution,
                 self.box_cfg.pooler_resolution, feats[0].shape[-1])
            )
            params["roi_box"] = self.box_head.init(k3, pooled)
            return params

        return jax.jit(build)(rng)

    def forward_train(self, params, images, targets, image_sizes):
        feats = list(self.backbone.apply(params["backbone"], images))
        obj, reg = self.rpn_head.apply(params["rpn"], feats)
        anchors = self._anchors(feats, self.rpn_cfg_train)
        losses = rpn_losses(
            self.rpn_cfg_train, anchors, obj, reg,
            targets["boxes"], targets["mask"],
        )
        props = rpn_proposals(
            self.rpn_cfg_train, anchors, obj, reg, image_sizes
        )
        proposals = jax.lax.stop_gradient(props["boxes"])
        prop_valid = props["valid"]
        matched_labels, reg_targets = match_proposals(
            self.box_cfg, proposals, prop_valid,
            targets["boxes"], targets["labels"], targets["mask"],
        )
        b, n = proposals.shape[:2]
        rois = proposals.reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(b), n)
        pooled = fpn_pooler(self.box_cfg, feats[:4], rois, bidx)
        cls_logits, bbox_pred = self.box_head.apply(params["roi_box"], pooled)
        losses.update(
            roi_box_losses(
                self.box_cfg, cls_logits, bbox_pred, rois,
                prop_valid.reshape(-1), matched_labels.reshape(-1),
                reg_targets.reshape(-1, 4),
            )
        )
        return losses

    def forward_inference(self, params, images, image_sizes):
        feats = list(self.backbone.apply(params["backbone"], images))
        obj, reg = self.rpn_head.apply(params["rpn"], feats)
        anchors = self._anchors(feats, self.rpn_cfg_test)
        props = rpn_proposals(self.rpn_cfg_test, anchors, obj, reg, image_sizes)
        b, n = props["boxes"].shape[:2]
        rois = props["boxes"].reshape(-1, 4)
        bidx = jnp.repeat(jnp.arange(b), n)
        pooled = fpn_pooler(self.box_cfg, feats[:4], rois, bidx)
        cls_logits, bbox_pred = self.box_head.apply(params["roi_box"], pooled)
        return roi_box_postprocess(
            self.box_cfg,
            cls_logits.reshape(b, n, -1),
            bbox_pred.reshape(b, n, -1),
            props["boxes"], props["valid"], image_sizes,
        )
