"""Model assembly: the SCAN "model dict" and its forward glue.

Parity targets:
  * model-dict construction (backbone / middle_head / fcos / per-level
    discriminators): reference ``tools/train_net_da.py:35-274``;
  * ``foward_detector`` glue: reference ``fcos_core/engine/trainer.py:20-72``.

The reference's model is a dict of nn.Modules with one optimizer each; here
it is a dict-of-param-pytrees applied by a single ``SCANDetector`` object,
so one jitted step computes every loss and one optax ``multi_transform``
reproduces the per-module LR schedule.
"""

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..config.node import ConfigNode
from ..ops.locations import compute_locations
from .backbone.build import build_backbone
from .condgraph.module import CondGraph, CondGraphConfig
from .condgraph.prototype import init_proto_state
from .discriminator.discriminators import (
    FCOSDiscriminator,
    FCOSDiscriminatorCA,
    FCOSDiscriminatorCon,
    FCOSDiscriminatorOut,
)
from .fcos.head import FCOSHead
from .fcos.loss import fcos_losses
from .fcos.module import mix_cls_maps
from .fcos.postprocess import PostProcessConfig, fcos_postprocess

LAYERS = ("P3", "P4", "P5", "P6", "P7")


class SCANDetector:
    """Stateless orchestrator over the model dict's flax modules."""

    def __init__(self, cfg: ConfigNode):
        self.cfg = cfg
        dtype = (
            jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else None
        )
        self.dtype = dtype
        self.strides = tuple(cfg.MODEL.FCOS.FPN_STRIDES)
        self.num_classes = cfg.MODEL.FCOS.NUM_CLASSES
        self.backbone = build_backbone(cfg, dtype=dtype)

        self.condgraph_on = cfg.MODEL.MIDDLE_HEAD.CONDGRAPH_ON
        if self.condgraph_on:
            self.cg_cfg = CondGraphConfig.from_cfg(cfg)
            self.middle_head = CondGraph(self.cg_cfg, dtype=dtype)

        # head selection mirrors reference build_rpn (rpn.py:201-206):
        # ATSS_ON > FCOS_ON > anchor RPN.
        self.atss_on = cfg.MODEL.ATSS_ON
        if self.atss_on:
            from .atss.atss import ATSSConfig, ATSSHead

            self.atss_cfg = ATSSConfig.from_cfg(cfg)
            self.num_classes = self.atss_cfg.num_classes
            self.fcos_head = ATSSHead(
                self.atss_cfg, num_levels=len(self.strides), dtype=dtype
            )
        else:
            self.fcos_head = FCOSHead(
                num_classes=self.num_classes,
                num_convs_cls=cfg.MODEL.FCOS.NUM_CONVS_CLS,
                num_convs_reg=cfg.MODEL.FCOS.NUM_CONVS_REG,
                prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
                with_reg_ctr=cfg.MODEL.FCOS.REG_CTR_ON,
                num_levels=len(self.strides),
                dtype=dtype,
            )
        self.loss_gamma = cfg.MODEL.FCOS.LOSS_GAMMA
        self.loss_alpha = cfg.MODEL.FCOS.LOSS_ALPHA
        self.test_mode = cfg.TEST.MODE

        # w8a8 int8-MXU inference variants over the SAME param tree
        # (TPU.INT8_INFERENCE; ops/quant.py). Training always runs the fp
        # modules — round() would kill gradients.
        self.int8_inference = bool(cfg.TPU.get("INT8_INFERENCE", False))
        if self.int8_inference:
            self.backbone_inf = build_backbone(cfg, dtype=dtype, quant=True)
            self.head_inf = self.fcos_head.clone(quant=True)
            self.middle_head_inf = (
                self.middle_head.clone(quant=True)
                if self.condgraph_on else None
            )
        else:
            self.backbone_inf = self.backbone
            self.head_inf = self.fcos_head
            self.middle_head_inf = (
                self.middle_head if self.condgraph_on else None
            )
        head_cfg = cfg.MODEL.ATSS if self.atss_on else cfg.MODEL.FCOS
        self.pp_cfg = PostProcessConfig(
            pre_nms_thresh=head_cfg.INFERENCE_TH,
            pre_nms_top_n=head_cfg.PRE_NMS_TOP_N,
            nms_thresh=head_cfg.NMS_TH,
            fpn_post_nms_top_n=cfg.TEST.DETECTIONS_PER_IMG,
            num_classes=self.num_classes,
            # The XLA fori_loop NMS benchmarks faster than the Pallas kernel
            # here (the greedy scan is scalar-sequential either way and
            # Mosaic's per-iteration overhead dominates); keep Pallas opt-in.
            use_pallas_nms=cfg.TPU.get("USE_PALLAS_NMS", False),
            nms_cap=cfg.TPU.get("NMS_CAP", 512),
        )

        # ---------------- discriminators ----------------
        adv = cfg.MODEL.ADV
        self.dis_modules: Dict[str, Any] = {}
        self.lambdas = {
            "GA": adv.GA_DIS_LAMBDA,
            "CA": adv.CA_DIS_LAMBDA,
            "OUT": adv.OUT_DIS_LAMBDA,
            "CON": adv.CON_DIS_LAMBDA,
        }
        self.used_layers: List[str] = [
            l for l in LAYERS if getattr_cfg(adv, f"USE_DIS_{l}")
            or getattr_cfg(adv, f"USE_DIS_{l}_CON")
        ]
        if cfg.MODEL.DA_ON:
            for i, layer in enumerate(LAYERS):
                grl_w = getattr_cfg(adv, f"GRL_WEIGHT_{layer}")
                ca_grl_w = getattr_cfg(adv, f"CA_GRL_WEIGHT_{layer}")
                if adv.USE_DIS_GLOBAL and getattr_cfg(adv, f"USE_DIS_{layer}"):
                    self.dis_modules[f"dis_{layer}"] = FCOSDiscriminator(
                        num_convs=getattr_cfg(adv, f"DIS_{layer}_NUM_CONVS"),
                        grl_lambda=grl_w,
                        grl_applied_domain=adv.GRL_APPLIED_DOMAIN,
                        patch_stride=adv.PATCH_STRIDE,
                        dtype=dtype,
                    )
                if adv.USE_DIS_CENTER_AWARE and getattr_cfg(adv, f"USE_DIS_{layer}"):
                    self.dis_modules[f"dis_{layer}_CA"] = FCOSDiscriminatorCA(
                        num_convs=getattr_cfg(adv, f"CA_DIS_{layer}_NUM_CONVS"),
                        grl_lambda=ca_grl_w,
                        center_aware_weight=adv.CENTER_AWARE_WEIGHT,
                        center_aware_type=adv.CENTER_AWARE_TYPE,
                        grl_applied_domain=adv.GRL_APPLIED_DOMAIN,
                        dtype=dtype,
                    )
                if adv.USE_DIS_OUT and getattr_cfg(adv, f"USE_DIS_{layer}"):
                    self.dis_modules[f"dis_{layer}_OUT"] = FCOSDiscriminatorOut(
                        num_convs=getattr_cfg(adv, f"CA_DIS_{layer}_NUM_CONVS"),
                        grl_lambda=ca_grl_w,
                        out_weight=adv.OUT_WEIGHT,
                        out_loss=adv.OUT_LOSS,
                        outmap_op=adv.OUTMAP_OP,
                        use_reg=adv.OUTPUT_REG_DA,
                        use_cls=adv.OUTPUT_CLS_DA,
                        use_ctr=adv.OUTPUT_CENTERNESS_DA,
                        num_classes=self.num_classes,
                        base_dis_tower=adv.BASE_DIS_TOWER,
                        grl_applied_domain=adv.GRL_APPLIED_DOMAIN,
                        dtype=dtype,
                    )
                if adv.USE_DIS_CON and getattr_cfg(adv, f"USE_DIS_{layer}_CON"):
                    self.dis_modules[f"dis_{layer}_CON"] = FCOSDiscriminatorCon(
                        num_convs=getattr_cfg(adv, f"CON_NUM_SHARED_CONV_{layer}"),
                        num_classes=self.num_classes,
                        fusion_cfg=adv.CON_FUSUIN_CFG,
                        grl_lambda=grl_w,
                        grl_applied_domain=adv.GRL_APPLIED_DOMAIN,
                        with_ga=adv.CON_WITH_GA,
                        dtype=dtype,
                    )

        self.need_score_maps = cfg.MODEL.DA_ON and (
            cfg.MODEL.ADV.USE_DIS_CENTER_AWARE or cfg.MODEL.ADV.USE_DIS_OUT
        )

        self.pixel_mean = tuple(cfg.INPUT.PIXEL_MEAN)
        self.pixel_std = tuple(cfg.INPUT.PIXEL_STD)
        self.to_bgr255 = cfg.INPUT.TO_BGR255

    def _prep_images(self, images):
        """On-device normalization for uint8 batches (TPU.DEVICE_NORMALIZE):
        RGB u8 -> (BGR*255 - mean)/std, fused into the first conv by XLA.
        Float inputs are assumed already normalized on the host."""
        if images.dtype != jnp.uint8:
            return images
        x = images.astype(jnp.float32)
        if self.to_bgr255:
            x = x[..., ::-1]
        else:
            x = x / 255.0
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return (x - mean) / std

    # ------------------------------------------------------------------ #
    def init_params(self, rng, sample_images: jnp.ndarray):
        """Initialise the parameter dict and prototype state.

        Jitted as a whole: eager init dispatches hundreds of tiny ops,
        which is pathologically slow through a remote-compile TPU path.
        """
        return jax.jit(self._init_params)(rng, sample_images)

    def _init_params(self, rng, sample_images: jnp.ndarray):
        keys = jax.random.split(rng, 4 + len(self.dis_modules))
        params: Dict[str, Any] = {}
        params["backbone"] = self.backbone.init(keys[0], sample_images)
        feats = self.backbone.apply(params["backbone"], sample_images)

        proto_state = None
        if self.condgraph_on:
            proto_state = init_proto_state(
                keys[1], self.cg_cfg.used_classes, self.cg_cfg.proto_channel,
                self.cg_cfg.proto_iter,
            )
            # init in 'source' mode: it exercises every submodule (graph
            # layers, node classifier, kernel branch, head_out), so all
            # params are created.
            b = sample_images.shape[0]
            dummy_targets = {
                "boxes": jnp.tile(
                    jnp.asarray([[8.0, 8.0, 48.0, 48.0]]), (b, 1, 1)
                ),
                "labels": jnp.ones((b, 1), jnp.int32),
                "mask": jnp.ones((b, 1), bool),
            }
            params["middle_head"] = self.middle_head.init(
                keys[2], list(feats), proto_state, "source", dummy_targets
            )
            feats, _, act_maps, _ = self.middle_head.apply(
                params["middle_head"], list(feats), proto_state, "inference"
            )
        else:
            act_maps = None

        params["fcos"] = self.fcos_head.init(keys[3], list(feats))

        for i, (name, mod) in enumerate(sorted(self.dis_modules.items())):
            lvl = LAYERS.index(name.split("_")[1])
            f = feats[lvl]
            if name.endswith("_CA") or name.endswith("_OUT"):
                sm = {
                    "box_cls": jnp.zeros(f.shape[:3] + (self.num_classes - 1,)),
                    "box_regression": jnp.zeros(f.shape[:3] + (4,)),
                    "centerness": jnp.zeros(f.shape[:3] + (1,)),
                }
                if name.endswith("_CA"):
                    params[name] = mod.init(keys[4 + i], f, 1.0, sm)
                else:
                    params[name] = mod.init(keys[4 + i], sm, 1.0)
            elif name.endswith("_CON"):
                am = act_maps[lvl] if act_maps is not None else jnp.zeros(
                    f.shape[:3] + (self.num_classes,)
                )
                params[name] = mod.init(keys[4 + i], f, 1.0, am)
            else:
                params[name] = mod.init(keys[4 + i], f, 1.0)
        return params, proto_state

    # ------------------------------------------------------------------ #
    def forward_train(self, params, proto_state, images, targets, mode: str,
                      forward_target: bool = False, rng=None):
        """One domain's G pass (reference foward_detector, trainer.py:20-72).

        ``rng`` (optional) enables train-time dropout inside the condgraph
        MHA (reference transformer.py:36-91 trains with p=0.1); without it
        the pass is deterministic — torch eval() semantics.

        Returns (losses, features, act_maps, score_maps, new_proto_state).
        """
        images = self._prep_images(images)
        feats = list(self.backbone.apply(params["backbone"], images))
        losses: Dict[str, jnp.ndarray] = {}
        act_maps = None
        new_state = proto_state
        if self.condgraph_on:
            mh_mode = mode if (mode == "source" or forward_target) else "inference"
            feats, mh_losses, act_maps, new_state = self.middle_head.apply(
                params["middle_head"], feats, proto_state, mh_mode,
                targets if mode == "source" else None,
                rngs=None if rng is None else {"dropout": rng},
            )
            losses.update(mh_losses)

        score_maps = None
        if mode == "source" or self.need_score_maps:
            if self.atss_on:
                logits, reg, ctr = self.fcos_head.apply(params["fcos"], feats)
            else:
                logits, reg, ctr = self.fcos_head.apply(
                    params["fcos"], feats, True
                )
            score_maps = {
                "box_cls": logits,
                "box_regression": reg,
                "centerness": ctr,
            }
            if mode == "source":
                shapes = [(f.shape[1], f.shape[2]) for f in feats]
                if self.atss_on:
                    from .anchors import atss_level_sizes, grid_anchors
                    from .atss.atss import atss_losses

                    anchors = grid_anchors(
                        shapes, self.strides,
                        atss_level_sizes(
                            self.atss_cfg.anchor_sizes, self.atss_cfg.octave,
                            self.atss_cfg.scales_per_octave,
                        ),
                        self.atss_cfg.aspect_ratios,
                    )
                    losses.update(
                        atss_losses(
                            self.atss_cfg, anchors, logits, reg, ctr,
                            targets["boxes"], targets["labels"], targets["mask"],
                        )
                    )
                else:
                    locations = compute_locations(shapes, self.strides)
                    losses.update(
                        fcos_losses(
                            locations, logits, reg, ctr,
                            targets["boxes"], targets["labels"], targets["mask"],
                            gamma=self.loss_gamma, alpha=self.loss_alpha,
                        )
                    )
        return losses, feats, act_maps, score_maps, new_state

    def discriminator_losses(self, params, feats, act_maps, score_maps,
                             domain_label: float, domain: str):
        """Per-level adversarial losses (reference trainer.py:314-376)."""
        losses = {}
        suffix = "ds" if domain == "source" else "dt"
        for name, mod in self.dis_modules.items():
            parts = name.split("_")
            layer = parts[1]
            family = parts[2] if len(parts) > 2 else "GA"
            lvl = LAYERS.index(layer)
            lam = self.lambdas[family]
            if family == "GA":
                val = mod.apply(params[name], feats[lvl], domain_label, domain)
            elif family == "CA":
                sm = {
                    k: jax.lax.stop_gradient(v[lvl]) for k, v in score_maps.items()
                }
                val = mod.apply(params[name], feats[lvl], domain_label, sm, domain)
            elif family == "OUT":
                sm = {k: v[lvl] for k, v in score_maps.items()}
                val = mod.apply(params[name], sm, domain_label, domain)
            elif family == "CON":
                val = mod.apply(
                    params[name], feats[lvl], domain_label, act_maps[lvl], domain
                )
            else:
                raise KeyError(family)
            losses[f"loss_adv_{layer}_{family}_{suffix}"] = lam * val
        return losses

    # ------------------------------------------------------------------ #
    def calibrate_int8(self, params, proto_state, image_batches):
        """Populate static int8 activation scales by running the inference
        path over calibration batches with the ``act_scales`` collections
        mutable (each quantized Conv accumulates its running |x|max; see
        modeling/layers.Conv). Returns params with the scales attached —
        subsequent forward_inference calls then skip the per-batch amax
        reduce entirely. No-op when TPU.INT8_INFERENCE is off."""
        if not self.int8_inference:
            return params
        bb_vars = dict(params["backbone"])
        fc_vars = dict(params["fcos"])
        mh_vars = (
            dict(params["middle_head"]) if self.condgraph_on else None
        )

        @jax.jit
        def step(bb_vars, fc_vars, mh_vars, proto, images):
            x = self._prep_images(images)
            feats, bb_up = self.backbone_inf.apply(
                bb_vars, x, mutable=["act_scales"]
            )
            feats = list(feats)
            mh_up = {}
            if self.condgraph_on:
                out, mh_up = self.middle_head_inf.apply(
                    mh_vars, feats, proto, "inference",
                    mutable=["act_scales"],
                )
                feats = out[0]
            if self.atss_on:
                _, fc_up = self.head_inf.apply(
                    fc_vars, feats, mutable=["act_scales"]
                )
            else:
                _, fc_up = self.head_inf.apply(
                    fc_vars, feats, self.test_mode != "light",
                    mutable=["act_scales"],
                )
            return bb_up, fc_up, mh_up

        for images in image_batches:
            bb_up, fc_up, mh_up = step(
                bb_vars, fc_vars, mh_vars, proto_state, images
            )
            bb_vars = {**bb_vars, **dict(bb_up)}
            fc_vars = {**fc_vars, **dict(fc_up)}
            if self.condgraph_on:
                mh_vars = {**mh_vars, **dict(mh_up)}
        out = dict(params)
        out["backbone"] = bb_vars
        out["fcos"] = fc_vars
        if self.condgraph_on:
            out["middle_head"] = mh_vars
        return out

    def forward_inference_multi(self, params, proto_state, images, image_sizes):
        """Chained inference: run k batches stacked on a leading axis
        (images (k,B,H,W,3), sizes (k,B,2)) through ONE device dispatch via
        ``lax.map``. Per-call dispatch through a remote TPU relay costs
        ~30 ms of host time that the async queue does not hide on a
        single-core host (measured: batch-32 inference 169 img/s dispatched
        per-batch vs ~200 img/s chained, = the XProf device-busy rate);
        chaining amortises it k-fold. Ship images as uint8 so the stack
        stays small in HBM (normalisation runs on device, `_prep_images`).
        Outputs come back stacked (k, B, ...)."""
        return jax.lax.map(
            lambda args: self.forward_inference(params, proto_state, *args),
            (images, image_sizes),
        )

    def forward_inference(self, params, proto_state, images, image_sizes):
        """Eval path (reference trainer.py foward_detector eval branch +
        fcos.py TEST.MODE mixing)."""
        images = self._prep_images(images)
        feats = list(self.backbone_inf.apply(params["backbone"], images))
        act_maps = None
        if self.condgraph_on:
            feats, _, act_maps, _ = self.middle_head_inf.apply(
                params["middle_head"], feats, proto_state, "inference"
            )
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        if self.atss_on:
            from .anchors import atss_level_sizes, grid_anchors
            from .atss.atss import atss_postprocess

            logits, reg, ctr = self.head_inf.apply(params["fcos"], feats)
            anchors = grid_anchors(
                shapes, self.strides,
                atss_level_sizes(
                    self.atss_cfg.anchor_sizes, self.atss_cfg.octave,
                    self.atss_cfg.scales_per_octave,
                ),
                self.atss_cfg.aspect_ratios,
            )
            return atss_postprocess(
                self.atss_cfg, self.pp_cfg, anchors, logits, reg, ctr,
                image_sizes,
            )
        compute_cls = self.test_mode != "light"
        logits, reg, ctr = self.head_inf.apply(params["fcos"], feats, compute_cls)
        cls_maps, apply_sigmoid = mix_cls_maps(self.test_mode, logits, act_maps)
        pp = dataclasses.replace(self.pp_cfg, apply_sigmoid=apply_sigmoid)
        locations = compute_locations(shapes, self.strides)
        return fcos_postprocess(pp, locations, cls_maps, reg, ctr, image_sizes)


def getattr_cfg(node, key):
    return node[key]


def build_detector(cfg) -> SCANDetector:
    return SCANDetector(cfg)
