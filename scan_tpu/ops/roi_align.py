"""ROIAlign / ROIPool as pure-jnp gather + bilinear interpolation.

Replaces the reference CUDA kernels (reference
``fcos_core/csrc/cuda/ROIAlign_cuda.cu``, ``ROIPool_cuda.cu`` via
``layers/roi_align.py`` / ``roi_pool.py``). Matches the maskrcnn-benchmark
("legacy", non-half-pixel) ROIAlign semantics: roi coords scaled by
spatial_scale, bin size (roi_size / output_size), ``sampling_ratio`` sample
points per bin axis (ceil(roi_size / output_size) when 0), bilinear
interpolation with zero padding outside, average over samples.

On TPU this lowers to vectorised gathers — no custom kernel needed: the
gather feeds the RoI-head matmuls which dominate.
"""


import jax
import jax.numpy as jnp


def _bilinear_sample(feature, y, x):
    """feature: (H, W, C); y, x: (P,) continuous coords. Zero outside."""
    h, w, c = feature.shape
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yy, xx):
        return feature[yy, xx]  # (P, C)

    val = (
        g(y0, x0) * (hy * hx)[:, None]
        + g(y0, x1) * (hy * lx)[:, None]
        + g(y1, x0) * (ly * hx)[:, None]
        + g(y1, x1) * (ly * lx)[:, None]
    )
    return val * inside[:, None]


def roi_align(features, rois, batch_indices, output_size: int,
              spatial_scale: float, sampling_ratio: int = 2):
    """features: (B, H, W, C) NHWC; rois: (R, 4) xyxy in image coords;
    batch_indices: (R,) int. Returns (R, output_size, output_size, C)."""
    s = output_size
    sr = max(sampling_ratio, 1)

    def one_roi(roi, b_idx):
        feat = features[b_idx]
        x1, y1, x2, y2 = roi * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / s
        bin_h = roi_h / s
        # sample grid: sr x sr points per bin
        ys = y1 + jnp.arange(s)[:, None] * bin_h + (
            (jnp.arange(sr) + 0.5) * bin_h / sr
        )[None, :]  # (s, sr)
        xs = x1 + jnp.arange(s)[:, None] * bin_w + (
            (jnp.arange(sr) + 0.5) * bin_w / sr
        )[None, :]  # (s, sr)
        # Y[py, px, i, j] = ys[py, i]; X[py, px, i, j] = xs[px, j]
        Y = jnp.broadcast_to(ys[:, None, :, None], (s, s, sr, sr))
        X = jnp.broadcast_to(xs[None, :, None, :], (s, s, sr, sr))
        vals = _bilinear_sample(feat, Y.reshape(-1), X.reshape(-1))
        vals = vals.reshape(s, s, sr * sr, -1)
        return jnp.mean(vals, axis=2)

    return jax.vmap(one_roi)(rois, batch_indices)


def roi_pool(features, rois, batch_indices, output_size: int,
             spatial_scale: float):
    """Max RoI pooling (reference ROIPool_cuda.cu) via dense sampling."""
    s = output_size

    def one_roi(roi, b_idx):
        feat = features[b_idx]
        h, w, c = feat.shape
        x1 = jnp.round(roi[0] * spatial_scale)
        y1 = jnp.round(roi[1] * spatial_scale)
        x2 = jnp.round(roi[2] * spatial_scale)
        y2 = jnp.round(roi[3] * spatial_scale)
        roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
        roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
        # sample a fixed dense grid per bin and take max (approximates the
        # exact integer-bin max for reasonably sized rois)
        sr = 4
        iy = y1 + (jnp.arange(s * sr) + 0.5) * roi_h / (s * sr)
        ix = x1 + (jnp.arange(s * sr) + 0.5) * roi_w / (s * sr)
        yy = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)
        patch = feat[yy][:, xx]  # (s*sr, s*sr, C)
        patch = patch.reshape(s, sr, s, sr, c)
        return jnp.max(patch, axis=(1, 3))

    return jax.vmap(one_roi)(rois, batch_indices)
