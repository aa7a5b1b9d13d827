"""Optimisers: per-module SGD with warmup-multistep schedules.

Parity target: reference ``fcos_core/solver/build.py:7-84`` and
``lr_scheduler.py:10-60``:
  * SGD(momentum=0.9), weight decay WEIGHT_DECAY (bias: WEIGHT_DECAY_BIAS),
    bias LR multiplied by BIAS_LR_FACTOR;
  * WarmupMultiStepLR: constant- or linear-warmup factor for WARMUP_ITERS,
    then BASE_LR * GAMMA^bisect(STEPS, it).

The reference keeps one optimizer per model-dict entry and steps them all
each iteration; here a single ``optax.multi_transform`` with labels
(module_group, is_bias) reproduces the exact same per-parameter update in
one call, which is what a fused TPU train step wants.
"""


import optax


def warmup_multistep(base_lr, steps, gamma, warmup_factor, warmup_iters,
                     warmup_method, bias_lr_factor=1.0):
    steps = list(steps)

    def schedule(count):
        import jax.numpy as jnp

        it = count.astype(jnp.float32) if hasattr(count, "astype") else float(count)
        if warmup_method == "constant":
            wf = jnp.where(it < warmup_iters, warmup_factor, 1.0)
        else:  # linear
            alpha = it / max(warmup_iters, 1)
            wf = jnp.where(
                it < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        decay = jnp.asarray(1.0)
        for s in steps:
            decay = decay * jnp.where(it >= s, gamma, 1.0)
        return base_lr * bias_lr_factor * wf * decay

    return schedule


_GROUP_TO_SOLVER_KEY = {
    "backbone": "BACKBONE",
    "middle_head": "MIDDLE_HEAD",
    "fcos": "FCOS",
    "discriminator": "DIS",
}


def _module_group(top_key: str) -> str:
    if top_key.startswith("dis_"):
        return "discriminator"
    if top_key in ("backbone", "middle_head", "fcos"):
        return top_key
    raise KeyError(top_key)


def _frozen_checker(cfg):
    """Predicate over param paths for parameters the reference marks
    requires_grad=False (frozen backbone stages / FrozenBatchNorm buffers) —
    these are excluded from the optimizer entirely (reference
    solver/build.py:9-11), so even weight decay must not touch them."""
    body = cfg.MODEL.BACKBONE.CONV_BODY
    is_vgg = body.startswith("VGG")
    freeze_at = 2 if is_vgg else cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT
    if is_vgg:
        from ..modeling.backbone.vgg import VGG16_STAGE_BLOCKS

        n_frozen_convs = sum(VGG16_STAGE_BLOCKS[:freeze_at])
    else:
        n_frozen_convs = 0

    def is_frozen(top, path):
        if top != "backbone":
            return False
        comps = path
        if "body" not in comps:
            return False
        for c in comps:
            # FrozenBatchNorm params are never trained (any backbone).
            if not is_vgg and (
                c.startswith("bn") or c.startswith("stem_bn") or c == "downsample_bn"
            ):
                return True
            if not is_vgg and freeze_at >= 1 and c.startswith("stem_"):
                return True
            if not is_vgg and c.startswith("layer"):
                stage = int(c[5])  # layer1..layer4
                if freeze_at >= stage + 1:
                    return True
            if is_vgg and c.startswith("conv") and c[4:].isdigit():
                if int(c[4:]) < n_frozen_convs:
                    return True
            if is_vgg and c.startswith("bn") and c[2:].isdigit():
                if int(c[2:]) < n_frozen_convs:
                    return True
        return False

    return is_frozen


def make_optimizer(cfg, params) -> optax.GradientTransformation:
    """One optax transform reproducing the reference's 4-optimizer scheme."""
    momentum = cfg.SOLVER.MOMENTUM
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    is_frozen = _frozen_checker(cfg)

    transforms = {"frozen": optax.set_to_zero()}
    for group, key in _GROUP_TO_SOLVER_KEY.items():
        s = cfg.SOLVER[key]
        for is_bias in (False, True):
            sched = warmup_multistep(
                s.BASE_LR, s.STEPS, s.GAMMA, s.WARMUP_FACTOR,
                s.WARMUP_ITERS, s.WARMUP_METHOD,
                bias_lr_factor=s.BIAS_LR_FACTOR if is_bias else 1.0,
            )
            transforms[f"{group}/bias" if is_bias else group] = optax.chain(
                optax.add_decayed_weights(wd_bias if is_bias else wd),
                optax.sgd(learning_rate=sched, momentum=momentum),
            )

    def label_fn(tree):
        def walk(subtree, top, path):
            if isinstance(subtree, dict):
                return {
                    k: walk(v, top, path + (k,)) for k, v in subtree.items()
                }
            if is_frozen(top, path):
                return "frozen"
            is_bias = len(path) > 0 and path[-1] == "bias"
            g = _module_group(top)
            return f"{g}/bias" if is_bias else g

        return {k: walk(v, k, ()) for k, v in tree.items()}

    return optax.multi_transform(transforms, label_fn)
