"""Shared flax.linen building blocks.

Initialisation conventions follow the reference:
  * head convs: Normal(std=0.01), zero bias (reference fcos.py:67-73)
  * FPN convs: kaiming_uniform(a=1) (reference modeling/make_layers.py)
  * GroupNorm(32) with eps 1e-5 (torch default)
Layout is NHWC throughout (TPU-native).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def normal_init(std=0.01):
    return nn.initializers.normal(stddev=std)


def kaiming_uniform_a1():
    """torch.nn.init.kaiming_uniform_(w, a=1) for conv kernels.

    bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(3 / fan_in).
    flax kernel shape (kh, kw, in, out): fan_in = kh*kw*in.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = float(np.sqrt(3.0 / fan_in))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _ConvParams(nn.Module):
    """Declares kernel/bias at the same tree paths nn.Conv would
    (<parent>/Conv_0/{kernel,bias}) without running the conv — the int8
    path reads the identical fp32 param tree as the regular path."""

    shape: tuple
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (
            self.param("bias", self.bias_init, (self.shape[-1],))
            if self.use_bias else None
        )
        return k, b


class Conv(nn.Module):
    """3x3/1x1 conv with explicit init and optional stride, NHWC.

    ``quant=True`` runs the w8a8 int8-MXU path (ops/quant.py) over the same
    parameters — inference only (round() kills gradients)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    kernel_init: Callable = normal_init(0.01)
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import QuantizedActivation

        if isinstance(x, QuantizedActivation) and not self.quant:
            x = x.dequantize(self.dtype or jnp.float32)
        if self.quant:
            from ..ops.quant import int8_conv

            pre_q = x if isinstance(x, QuantizedActivation) else None
            k, b = _ConvParams(
                (self.kernel_size, self.kernel_size,
                 x.shape[-1], self.features),
                self.use_bias, self.kernel_init, self.bias_init,
                name="Conv_0",
            )()
            p = self.kernel_size // 2
            # Static activation scales: a calibration pass (apply with
            # mutable=["act_scales"], see SCANDetector.calibrate_int8)
            # accumulates each layer's running |x|max; afterwards the
            # stored scale replaces the per-batch amax reduce.
            act_scale = None
            # not during init: every collection is mutable there, which
            # would bake a zero scale into the initial params
            calibrating = (
                self.is_mutable_collection("act_scales")
                and not self.is_initializing()
            )
            if calibrating or self.has_variable("act_scales", "amax"):
                sv = self.variable(
                    "act_scales", "amax",
                    lambda: jnp.zeros((), jnp.float32),
                )
                if calibrating:
                    # prequantized inputs never occur during calibration
                    # (producers emit fp on that pass, see VGG16 stem)
                    sv.value = jnp.maximum(
                        sv.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                    )
                else:
                    act_scale = sv.value / 127.0
            if pre_q is not None:
                # already int8 at a known scale (the producer folded this
                # layer's quantize into its epilogue) — skip quantization
                return int8_conv(
                    pre_q.q, k, b, stride=self.stride,
                    padding=((p, p), (p, p)),
                    out_dtype=self.dtype or jnp.float32,
                    act_scale=pre_q.scale,
                )
            return int8_conv(
                x, k, b, stride=self.stride, padding=((p, p), (p, p)),
                out_dtype=self.dtype or x.dtype, act_scale=act_scale,
            )
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.kernel_size // 2,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
        )(x)


class GroupNorm32(nn.Module):
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype,
            use_fast_variance=False,
        )(x)


class ConvTower(nn.Module):
    """num_convs x [conv3x3 -> (GN) -> ReLU]; the FCOS/discriminator tower."""

    num_convs: int
    features: int
    norm: str = "GN"  # 'GN' | 'NONE'
    dtype: Optional[Dtype] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = Conv(self.features, 3, dtype=self.dtype, quant=self.quant,
                     name=f"conv{i}")(x)
            if self.norm == "GN":
                x = GroupNorm32(dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (reference layers/scale.py:5-11)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale", lambda k: jnp.asarray([self.init_value], jnp.float32)
        )
        return x * scale


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics (reference layers/batch_norm.py:6-25).

    Stats and affine params live in the 'params' collection but receive no
    gradient (stop_gradient) — they are loaded from pretrained checkpoints.
    """

    features: int

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        weight, bias, mean, var = (
            jax.lax.stop_gradient(t) for t in (weight, bias, mean, var)
        )
        scale = weight * jax.lax.rsqrt(var + 1e-5)
        return x * scale + (bias - mean * scale)


class MultiHeadSelfAttention(nn.Module):
    """Multi-head attention over sampled graph nodes.

    Parity target: reference ``layers/transformer.py:36-91`` — separate
    q/k/v linears, scaled dot-product with the reference's idiosyncratic
    scale ((dim_per_head // num_heads) ** -0.5), output linear, residual +
    LayerNorm. Dropout matches the reference placement: on the attention
    weights after softmax (transformer.py:31) and on the output after
    linear_final, before the residual+LN (transformer.py:86). It fires only
    when the caller provides a 'dropout' rng (training); without one the
    layer is deterministic (eval), mirroring torch train()/eval().
    """

    model_dim: int = 256
    num_heads: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=None):
        if deterministic is None:
            deterministic = (
                self.dropout == 0.0 or not self.has_rng("dropout")
            )
        # x: (N, D) nodes; mask: (N,) validity
        d = self.model_dim
        h = self.num_heads
        dh = d // h
        q = nn.Dense(d, name="linear_q")(x)
        k = nn.Dense(d, name="linear_k")(x)
        v = nn.Dense(d, name="linear_v")(x)
        n = x.shape[0]
        # Reference head split is a raw view (transformer.py:67-69):
        # (1, N, D).view(heads, -1, dh) in row-major order — NOT the
        # standard per-channel head split. Reproduce it exactly so
        # converted reference checkpoints agree numerically.
        q = q.reshape(h, n, dh)
        k = k.reshape(h, n, dh)
        v = v.reshape(h, n, dh)
        # reference scale: (dim_per_head // num_heads) ** -0.5
        scale = float(max(dh // h, 1)) ** -0.5
        attn = jnp.einsum("hnd,hmd->hnm", q, k, preferred_element_type=jnp.float32) * scale
        if mask is not None:
            # Under the raw-view split, key position m of head h_ holds a
            # dh-slice of original node (h_*n + m) // h — remap validity.
            pos = jnp.arange(h)[:, None] * n + jnp.arange(n)[None, :]
            pos_mask = mask[pos // h]  # (h, n)
            attn = jnp.where(pos_mask[:, None, :], attn, -1e30)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.dropout, name="attn_dropout")(
            attn, deterministic=deterministic
        )
        ctx = jnp.einsum("hnm,hmd->hnd", attn, v, preferred_element_type=jnp.float32)
        # inverse raw view (transformer.py:82): (h, n, dh) -> (n, d)
        ctx = ctx.reshape(n, d)
        out = nn.Dense(d, name="linear_final")(ctx)
        out = nn.Dropout(rate=self.dropout, name="out_dropout")(
            out, deterministic=deterministic
        )
        out = nn.LayerNorm(
            epsilon=1e-5, use_fast_variance=False, name="layer_norm"
        )(x + out)
        return out
