"""Numeric parity of torch->flax weight conversion (layout transposes).

Builds small torch modules (conv+GN tower, linear, RNN, (ITER,1) conv) with
random weights, converts them, and checks the flax side computes the same
function in NHWC. This validates every conversion rule the full SCAN
checkpoint loader relies on.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scan_tpu.modeling.layers import Conv, ConvTower
from scan_tpu.modeling.condgraph.module import TorchRNN
from scan_tpu.utils.torch_weights import conv_w, convert_tower, lin_w


def test_conv_gn_tower_parity():
    torch.manual_seed(0)
    tower = torch.nn.Sequential(
        torch.nn.Conv2d(8, 8, 3, padding=1),
        torch.nn.GroupNorm(4, 8),
        torch.nn.ReLU(),
        torch.nn.Conv2d(8, 8, 3, padding=1),
        torch.nn.GroupNorm(4, 8),
        torch.nn.ReLU(),
    )
    x = torch.randn(2, 8, 10, 12)
    with torch.no_grad():
        want = tower(x).permute(0, 2, 3, 1).numpy()

    sd = {f"t.{k}": v for k, v in tower.state_dict().items()}
    converted = convert_tower(sd, "t", 2)
    x_nhwc = jnp.asarray(x.permute(0, 2, 3, 1).numpy())

    import flax.linen as nn

    class Tower4(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(2):
                x = Conv(8, 3, name=f"conv{i}")(x)
                x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name=f"gn{i}")(x)
                x = nn.relu(x)
            return x

    mod4 = Tower4()
    params4 = mod4.init(jax.random.PRNGKey(0), x_nhwc)
    # overlay converted weights (gn params sit directly, not under
    # GroupNorm_0, in this local module)
    p = {"params": {}}
    for i in range(2):
        p["params"][f"conv{i}"] = {
            "Conv_0": {
                "kernel": jnp.asarray(converted[f"conv{i}"]["Conv_0"]["kernel"]),
                "bias": jnp.asarray(converted[f"conv{i}"]["Conv_0"]["bias"]),
            }
        }
        p["params"][f"gn{i}"] = {
            "scale": jnp.asarray(converted[f"gn{i}"]["GroupNorm_0"]["scale"]),
            "bias": jnp.asarray(converted[f"gn{i}"]["GroupNorm_0"]["bias"]),
        }
    got = np.asarray(mod4.apply(p, x_nhwc))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_parity():
    torch.manual_seed(1)
    lin = torch.nn.Linear(16, 24)
    x = torch.randn(5, 16)
    with torch.no_grad():
        want = lin(x).numpy()
    got = np.asarray(x.numpy() @ lin_w(lin.weight) + lin.bias.detach().numpy())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rnn_parity():
    torch.manual_seed(2)
    rnn_t = torch.nn.RNN(16, 32, 2, nonlinearity="tanh")
    x = torch.randn(3, 9, 16)  # (T, B, C)
    with torch.no_grad():
        want = rnn_t(x)[0].numpy()

    rnn_j = TorchRNN(input_size=16, hidden_size=32, num_layers=2)
    xj = jnp.asarray(x.numpy())
    params = rnn_j.init(jax.random.PRNGKey(0), xj)
    p = {"params": {}}
    for layer in range(2):
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            p["params"][f"{kind}_l{layer}"] = jnp.asarray(
                getattr(rnn_t, f"{kind}_l{layer}").detach().numpy()
            )
    got = np.asarray(rnn_j.apply(p, xj))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cond_nx1_conv_as_dense_parity():
    """torch Conv2d(C_in, C_out, (ITER, 1)) over (N, C_in, ITER, 1) equals a
    dense layer over the channel-major flattened (C_in * ITER) axis."""
    torch.manual_seed(3)
    it = 3
    conv = torch.nn.Conv2d(512, 256, (it, 1))
    x = torch.randn(9, 512, it, 1)
    with torch.no_grad():
        want = conv(x).squeeze(-1).squeeze(-1).numpy()  # (9, 256)

    w = conv.weight.detach().numpy()  # (256, 512, it, 1)
    kernel = w[:, :, :, 0].reshape(256, 512 * it).transpose(1, 0)
    flat = x.numpy()[:, :, :, 0].reshape(9, 512 * it)
    got = flat @ kernel + conv.bias.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nchw_nhwc_conv_parity():
    torch.manual_seed(4)
    conv_t = torch.nn.Conv2d(3, 6, 3, padding=1)
    x = torch.randn(1, 3, 8, 9)
    with torch.no_grad():
        want = conv_t(x).permute(0, 2, 3, 1).numpy()
    mod = Conv(6, 3)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    params = mod.init(jax.random.PRNGKey(0), xj)
    p = {
        "params": {
            "Conv_0": {
                "kernel": jnp.asarray(conv_w(conv_t.weight)),
                "bias": jnp.asarray(conv_t.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(mod.apply(p, xj))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
