"""Per-class conditional 1x1 convolution ("kernel manifestation").

Parity target: reference ``condgraph.dynamic_conv``
(``fcos_core/modeling/rpn/fcos/condgraph.py:619-629``): the manifested
prototype kernels (C_used, 256[+1]) act as a 1x1 conv over the feature map.

TPU-native form: a 1x1 conv over NHWC features IS a matmul over the channel
axis — a single (B*H*W, C_in) x (C_in, C_used) contraction that XLA maps
straight onto the MXU. No Pallas needed; this is speed-of-light already.
"""

import jax.numpy as jnp


def dynamic_conv(features, kernel_par, with_bias=False):
    """Apply per-class conditional kernels to an NHWC feature map.

    Args:
      features: (B, H, W, C_in).
      kernel_par: (num_classes, C_in) or (num_classes, C_in + 1) with bias.
      with_bias: if True the last column of kernel_par is a bias.

    Returns:
      (B, H, W, num_classes) activation logits.
    """
    if with_bias:
        weight, bias = kernel_par[:, :-1], kernel_par[:, -1]
    else:
        weight, bias = kernel_par, None
    out = jnp.einsum(
        "bhwc,kc->bhwk", features, weight, preferred_element_type=jnp.float32
    )
    if bias is not None:
        out = out + bias[None, None, None, :]
    return out
