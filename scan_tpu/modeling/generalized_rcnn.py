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
    RoIKeypointConfig,
    RoIKeypointHead,
    RoIMaskConfig,
    RoIMaskHead,
    fpn_pooler,
    keypoints_to_heatmap,
    match_proposals,
    roi_box_losses,
    roi_box_postprocess,
    roi_keypoint_decode,
    roi_keypoint_loss,
    roi_mask_loss,
)
from ..ops.roi_align import roi_align
from .rpn_anchor import RPNConfig, RPNHead, rpn_losses, rpn_proposals


class FasterRCNN:
    """Box head always; mask / keypoint branches behind MODEL.MASK_ON /
    MODEL.KEYPOINT_ON (reference roi_heads/roi_heads.py:14-49 combines the
    three the same way)."""

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
        self.mask_on = bool(cfg.MODEL.MASK_ON)
        self.keypoint_on = bool(cfg.MODEL.KEYPOINT_ON)
        if self.mask_on:
            self.mask_cfg = RoIMaskConfig.from_cfg(cfg)
            self.mask_head = RoIMaskHead(self.mask_cfg, dtype=dtype)
        if self.keypoint_on:
            self.kp_cfg = RoIKeypointConfig.from_cfg(cfg)
            self.kp_head = RoIKeypointHead(self.kp_cfg, dtype=dtype)

    def _branch_pool(self, branch_cfg, feats, rois, bidx):
        """Pool for a mask/keypoint branch: same FPN pooler, that branch's
        resolution/scales."""
        import dataclasses as _dc

        cfg = _dc.replace(
            self.box_cfg,
            pooler_resolution=branch_cfg.pooler_resolution,
            pooler_scales=branch_cfg.pooler_scales,
            sampling_ratio=branch_cfg.sampling_ratio,
        )
        return fpn_pooler(cfg, feats, rois, bidx)

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
            if self.mask_on:
                km = jax.random.fold_in(rng, 11)
                params["roi_mask"] = self.mask_head.init(
                    km,
                    jnp.zeros((4, self.mask_cfg.pooler_resolution,
                               self.mask_cfg.pooler_resolution,
                               feats[0].shape[-1])),
                )
            if self.keypoint_on:
                kk = jax.random.fold_in(rng, 13)
                params["roi_keypoint"] = self.kp_head.init(
                    kk,
                    jnp.zeros((4, self.kp_cfg.pooler_resolution,
                               self.kp_cfg.pooler_resolution,
                               feats[0].shape[-1])),
                )
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
        matched_labels, reg_targets, matched_idx = match_proposals(
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
        pos_mask = matched_labels.reshape(-1) > 0
        if self.mask_on and "gt_masks" in targets:
            # gt_masks (B, G, Hm, Wm) bitmasks at 1/gt_mask_scale of image
            # resolution. Targets are projected onto each positive proposal
            # with ROIAlign on the matched GT bitmap — the fixed-shape
            # equivalent of the reference's per-proposal polygon crop+resize
            # (mask_head/loss.py:33-59 project_masks_on_boxes).
            gm = targets["gt_masks"].astype(jnp.float32)
            scale = 1.0  # gt_masks are expected at image resolution
            g = gm.shape[1]
            flat_gm = gm.reshape(b * g, gm.shape[2], gm.shape[3], 1)
            gidx = jnp.maximum(matched_idx.reshape(-1), 0) + bidx * g
            s = self.mask_cfg.pooler_resolution * 2  # logits are 2x deconv
            crops = roi_align(
                flat_gm, rois, gidx, s, scale, self.mask_cfg.sampling_ratio
            )[..., 0]
            mask_targets = (crops >= 0.5).astype(jnp.float32)
            mpooled = self._branch_pool(self.mask_cfg, feats[:4], rois, bidx)
            mask_logits = self.mask_head.apply(params["roi_mask"], mpooled)
            losses["loss_mask"] = roi_mask_loss(
                mask_logits, matched_labels.reshape(-1), mask_targets,
                pos_mask,
            )
        if self.keypoint_on and "gt_keypoints" in targets:
            # gt_keypoints (B, G, K, 3); gather each positive proposal's
            # matched instance and discretise into the heatmap grid
            # (keypoint_head/loss.py + keypoints_to_heat_map).
            kp = targets["gt_keypoints"].astype(jnp.float32)
            g, k = kp.shape[1], kp.shape[2]
            flat_kp = kp.reshape(b * g, k, 3)
            gidx = jnp.maximum(matched_idx.reshape(-1), 0) + bidx * g
            kp_rois = jnp.take(flat_kp, gidx, axis=0)
            hm_size = self.kp_cfg.pooler_resolution * 4  # deconv2x + up2x
            kp_t, kp_valid = keypoints_to_heatmap(kp_rois, rois, hm_size)
            kp_valid = kp_valid * pos_mask.astype(jnp.float32)[:, None]
            kpooled = self._branch_pool(self.kp_cfg, feats[:4], rois, bidx)
            heatmaps = self.kp_head.apply(params["roi_keypoint"], kpooled)
            losses["loss_kp"] = roi_keypoint_loss(heatmaps, kp_t, kp_valid)
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
        dets = roi_box_postprocess(
            self.box_cfg,
            cls_logits.reshape(b, n, -1),
            bbox_pred.reshape(b, n, -1),
            props["boxes"], props["valid"], image_sizes,
        )
        if not (self.mask_on or self.keypoint_on):
            return dets
        # mask/keypoint branches run on the final detections
        # (roi_heads/roi_heads.py:39-49 eval path)
        d = dets["boxes"].shape[1]
        det_rois = dets["boxes"].reshape(-1, 4)
        det_bidx = jnp.repeat(jnp.arange(b), d)
        if self.mask_on:
            mpooled = self._branch_pool(
                self.mask_cfg, feats[:4], det_rois, det_bidx
            )
            mlogits = self.mask_head.apply(params["roi_mask"], mpooled)
            s = mlogits.shape[1]
            sel = jnp.take_along_axis(
                mlogits.reshape(b * d, s * s, -1),
                jnp.maximum(dets["labels"].reshape(-1), 0)[:, None, None]
                .repeat(s * s, 1),
                axis=2,
            )[:, :, 0].reshape(b, d, s, s)
            dets["masks"] = jax.nn.sigmoid(sel)
        if self.keypoint_on:
            kpooled = self._branch_pool(
                self.kp_cfg, feats[:4], det_rois, det_bidx
            )
            heatmaps = self.kp_head.apply(params["roi_keypoint"], kpooled)
            xy, kscores = roi_keypoint_decode(heatmaps, det_rois)
            dets["keypoints"] = xy.reshape(b, d, -1, 3)
            dets["keypoint_scores"] = kscores.reshape(b, d, -1)
        return dets
