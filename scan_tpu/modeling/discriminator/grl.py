"""Gradient Reversal Layer as a jax.custom_vjp.

Parity target: reference ``fcos_core/modeling/discriminator/layer.py:6-33``
(identity forward, -lambda * grad backward).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x, lambd):
    return x


def _grl_fwd(x, lambd):
    return x, lambd


def _grl_bwd(lambd, g):
    return (jax.tree_util.tree_map(lambda t: -lambd * t, g), None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
