"""Deformable convolution (DCNv1/v2 style) as gather + einsum.

Parity target: reference ``fcos_core/layers/misc.py:109-184`` (``DFConv2d``,
a wrapper over the CUDA deform-conv used when ATSS.USE_DCN_IN_TOWER). The
TPU-native form samples each kernel tap at its offset position with bilinear
interpolation (vectorised gathers) and contracts with the kernel on the MXU.
"""


import jax
import jax.numpy as jnp


def _bilinear_gather(feat, ys, xs):
    """feat: (H, W, C); ys/xs: (P,) continuous positions. Zero outside."""
    h, w, _ = feat.shape
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    ys = jnp.clip(ys, 0.0, h - 1)
    xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0)[:, None]
    lx = (xs - x0)[:, None]
    out = (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )
    return out * inside[:, None]


def deform_conv2d(x, offsets, weight, bias=None, mask=None,
                  kernel_size: int = 3):
    """x: (B, H, W, C); offsets: (B, H, W, 2*k*k) as (dy, dx) per tap;
    weight: (k, k, C, O); mask: optional (B, H, W, k*k) modulation (DCNv2).
    Stride 1, SAME padding. Returns (B, H, W, O)."""
    b, h, w, c = x.shape
    k = kernel_size
    pad = k // 2

    base_y = jnp.arange(h, dtype=jnp.float32)
    base_x = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")  # (H, W)

    def one_image(feat, offs, mod):
        acc = None
        for i in range(k):
            for j in range(k):
                t = i * k + j
                dy = offs[..., 2 * t]
                dx = offs[..., 2 * t + 1]
                ys = (gy + i - pad + dy).reshape(-1)
                xs = (gx + j - pad + dx).reshape(-1)
                samp = _bilinear_gather(feat, ys, xs).reshape(h, w, c)
                if mod is not None:
                    samp = samp * mod[..., t : t + 1]
                contrib = jnp.einsum(
                    "hwc,co->hwo", samp, weight[i, j],
                    preferred_element_type=jnp.float32,
                )
                acc = contrib if acc is None else acc + contrib
        return acc

    if mask is None:
        out = jax.vmap(lambda f, o: one_image(f, o, None))(x, offsets)
    else:
        out = jax.vmap(one_image)(x, offsets, mask)
    if bias is not None:
        out = out + bias
    return out
