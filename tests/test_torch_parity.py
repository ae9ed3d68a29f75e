"""Numerical parity vs torch (CPU) for the conversion layer — the fidelity
gate of SURVEY.md hard part #3: converted weights must reproduce torch
outputs, not just shapes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from videotuna_tpu.tools.convert_weights import (t_conv, t_dense_general,
                                                 t_linear)


def to_np(t):
    return t.detach().cpu().numpy()


class TestLinear:
    def test_dense_matches_torch_linear(self):
        torch.manual_seed(0)
        lin = torch.nn.Linear(16, 32)
        x = torch.randn(4, 16)
        ref = to_np(lin(x))
        params = {"kernel": jnp.asarray(t_linear(to_np(lin.weight))),
                  "bias": jnp.asarray(to_np(lin.bias))}
        out = nn.Dense(32).apply({"params": params}, jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_dense_general_matches_torch_qkv(self):
        """torch attention projection (H·hd, in) → DenseGeneral heads."""
        torch.manual_seed(1)
        heads, hd, din = 4, 8, 16
        w = torch.randn(heads * hd, din)
        x = torch.randn(2, 5, din)
        ref = to_np(x @ w.T).reshape(2, 5, heads, hd)
        params = {"kernel": jnp.asarray(t_dense_general(heads)(to_np(w)))}
        out = nn.DenseGeneral((heads, hd), use_bias=False).apply(
            {"params": params}, jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestConv:
    def test_conv2d_matches(self):
        torch.manual_seed(2)
        conv = torch.nn.Conv2d(3, 8, 3, padding=1)
        x = torch.randn(1, 3, 16, 16)
        ref = to_np(conv(x)).transpose(0, 2, 3, 1)       # NCHW → NHWC
        params = {"kernel": jnp.asarray(t_conv(to_np(conv.weight))),
                  "bias": jnp.asarray(to_np(conv.bias))}
        out = nn.Conv(8, (3, 3), padding=1).apply(
            {"params": params},
            jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_conv3d_matches(self):
        torch.manual_seed(3)
        conv = torch.nn.Conv3d(4, 6, (3, 3, 3), padding=(1, 1, 1))
        x = torch.randn(1, 4, 5, 8, 8)
        ref = to_np(conv(x)).transpose(0, 2, 3, 4, 1)    # NCTHW → NTHWC
        params = {"kernel": jnp.asarray(t_conv(to_np(conv.weight))),
                  "bias": jnp.asarray(to_np(conv.bias))}
        out = nn.Conv(6, (3, 3, 3), padding=1).apply(
            {"params": params},
            jnp.asarray(to_np(x).transpose(0, 2, 3, 4, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


class TestNorms:
    def test_layernorm_matches(self):
        torch.manual_seed(4)
        ln = torch.nn.LayerNorm(32)
        with torch.no_grad():
            ln.weight.mul_(1.3)
            ln.bias.add_(0.1)
        x = torch.randn(2, 7, 32)
        ref = to_np(ln(x))
        params = {"scale": jnp.asarray(to_np(ln.weight)),
                  "bias": jnp.asarray(to_np(ln.bias))}
        out = nn.LayerNorm(epsilon=1e-5).apply({"params": params},
                                               jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_groupnorm_matches(self):
        torch.manual_seed(5)
        gn = torch.nn.GroupNorm(4, 16)
        with torch.no_grad():
            gn.weight.mul_(0.7)
        x = torch.randn(2, 16, 8, 8)
        ref = to_np(gn(x)).transpose(0, 2, 3, 1)
        params = {"scale": jnp.asarray(to_np(gn.weight)),
                  "bias": jnp.asarray(to_np(gn.bias))}
        out = nn.GroupNorm(4, epsilon=1e-5).apply(
            {"params": params},
            jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestAttention:
    def test_sdpa_matches_reference(self):
        torch.manual_seed(6)
        b, s, h, d = 2, 16, 4, 8
        q = torch.randn(b, h, s, d)
        k = torch.randn(b, h, s, d)
        v = torch.randn(b, h, s, d)
        ref = to_np(torch.nn.functional.scaled_dot_product_attention(
            q, k, v)).transpose(0, 2, 1, 3)              # BHSD → BSHD
        from videotuna_tpu.kernels.attention import reference_attention
        out = reference_attention(
            jnp.asarray(to_np(q).transpose(0, 2, 1, 3)),
            jnp.asarray(to_np(k).transpose(0, 2, 1, 3)),
            jnp.asarray(to_np(v).transpose(0, 2, 1, 3)))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_silu_gelu_match(self):
        x = torch.randn(100)
        np.testing.assert_allclose(
            np.asarray(nn.silu(jnp.asarray(to_np(x)))),
            to_np(torch.nn.functional.silu(x)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(nn.gelu(jnp.asarray(to_np(x)), approximate=True)),
            to_np(torch.nn.functional.gelu(x, approximate="tanh")),
            atol=1e-6)
