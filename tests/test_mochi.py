"""Mochi AsymmDiT: torch-replica parity + conversion-map gates.

The environment has no ``diffusers`` package, so the reference
``MochiTransformer3DModel`` (behind /root/reference/scripts/
inference_mochi.py) cannot be imported. These tests instead build an
INDEPENDENT torch implementation of the published AsymmDiT block math with
the diffusers checkpoint key layout (tanh-gated RMS residuals, scale-only
RMS modulation, SwiGLU value·silu(gate), per-head learned mixed-rotation
RoPE, asymmetric joint attention), convert its state dict through
``mochi_map`` and assert the JAX block reproduces it — catching layout /
transpose / convention bugs between the two frameworks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F


def _rms_t(x, weight=None, eps=1e-6):
    xf = x.float()
    y = xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + eps)
    if weight is not None:
        y = y * weight
    return y.to(x.dtype)


class TorchMochiAttention(tnn.Module):
    """Diffusers MochiAttention layout: to_q/k/v (dim_x), add_*_proj
    (dim_y→dim_x), per-head RMS qk norms, to_out.0 / to_add_out."""

    def __init__(self, dim_x, dim_y, heads, update_y):
        super().__init__()
        self.heads, self.hd = heads, dim_x // heads
        self.to_q = tnn.Linear(dim_x, dim_x, bias=False)
        self.to_k = tnn.Linear(dim_x, dim_x, bias=False)
        self.to_v = tnn.Linear(dim_x, dim_x, bias=False)
        self.add_q_proj = tnn.Linear(dim_y, dim_x, bias=False)
        self.add_k_proj = tnn.Linear(dim_y, dim_x, bias=False)
        self.add_v_proj = tnn.Linear(dim_y, dim_x, bias=False)
        class _RMS(tnn.Module):          # diffusers RMSNorm → .weight key
            def __init__(self, d):
                super().__init__()
                self.weight = tnn.Parameter(torch.rand(d))

        self.norm_q = _RMS(self.hd)
        self.norm_k = _RMS(self.hd)
        self.norm_added_q = _RMS(self.hd)
        self.norm_added_k = _RMS(self.hd)
        to_out = tnn.Linear(dim_x, dim_x, bias=True)
        self.to_out = tnn.ModuleList([to_out])
        self.update_y = update_y
        if update_y:
            self.to_add_out = tnn.Linear(dim_x, dim_y, bias=True)

    @staticmethod
    def _rope(x, cos, sin):
        # x: (B, S, H, hd); cos/sin: (S, H, hd/2); interleaved pairs
        x1, x2 = x[..., 0::2].float(), x[..., 1::2].float()
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        return torch.stack([o1, o2], dim=-1).flatten(-2).to(x.dtype)

    def forward(self, x, y, cos, sin):
        b, sx, _ = x.shape
        h, hd = self.heads, self.hd

        def split(z, lin):
            return lin(z).view(b, -1, h, hd)

        qx = _rms_t(split(x, self.to_q), self.norm_q.weight)
        kx = _rms_t(split(x, self.to_k), self.norm_k.weight)
        vx = split(x, self.to_v)
        qy = _rms_t(split(y, self.add_q_proj), self.norm_added_q.weight)
        ky = _rms_t(split(y, self.add_k_proj), self.norm_added_k.weight)
        vy = split(y, self.add_v_proj)
        qx, kx = self._rope(qx, cos, sin), self._rope(kx, cos, sin)
        q = torch.cat([qx, qy], dim=1).transpose(1, 2).float()
        k = torch.cat([kx, ky], dim=1).transpose(1, 2).float()
        v = torch.cat([vx, vy], dim=1).transpose(1, 2).float()
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, -1, h * hd)
        ox, oy = o[:, :sx], o[:, sx:]
        ox = self.to_out[0](ox)
        oy = self.to_add_out(oy) if self.update_y else None
        return ox, oy


class TorchMochiBlock(tnn.Module):
    def __init__(self, dim_x, dim_y, heads, update_y=True, mlp_x=4.0,
                 mlp_y=4.0):
        super().__init__()
        self.update_y = update_y
        self.norm1 = tnn.Module()
        self.norm1.linear = tnn.Linear(dim_x, 4 * dim_x)
        self.norm1_context = tnn.Module()
        self.norm1_context.linear = tnn.Linear(
            dim_x, 4 * dim_y if update_y else dim_y)
        self.attn1 = TorchMochiAttention(dim_x, dim_y, heads, update_y)
        hx, hy = int(dim_x * mlp_x), int(dim_y * mlp_y)
        self.ff = tnn.Module()
        net = tnn.ModuleList()
        proj = tnn.Module()
        proj.proj = tnn.Linear(dim_x, 2 * hx, bias=False)
        net.append(proj)
        net.append(tnn.Identity())
        net.append(tnn.Linear(hx, dim_x, bias=False))
        self.ff.net = net
        if update_y:
            self.ff_context = tnn.Module()
            netc = tnn.ModuleList()
            projc = tnn.Module()
            projc.proj = tnn.Linear(dim_y, 2 * hy, bias=False)
            netc.append(projc)
            netc.append(tnn.Identity())
            netc.append(tnn.Linear(hy, dim_y, bias=False))
            self.ff_context.net = netc

    @staticmethod
    def _swiglu(z, proj, out):
        val, gate = proj(z).chunk(2, dim=-1)
        return out(val * F.silu(gate))

    def forward(self, x, y, c, cos, sin):
        mod_x = self.norm1.linear(F.silu(c))
        sc_ax, g_ax, sc_mx, g_mx = mod_x.chunk(4, dim=-1)
        mod_y = self.norm1_context.linear(F.silu(c))
        if self.update_y:
            sc_ay, g_ay, sc_my, g_my = mod_y.chunk(4, dim=-1)
        else:
            sc_ay = mod_y
        xm = _rms_t(x) * (1 + sc_ax.unsqueeze(1))
        ym = _rms_t(y) * (1 + sc_ay.unsqueeze(1))
        ax, ay = self.attn1(xm, ym, cos, sin)
        x = x + torch.tanh(g_ax).unsqueeze(1) * _rms_t(ax)
        if self.update_y:
            y = y + torch.tanh(g_ay).unsqueeze(1) * _rms_t(ay)
        fx = self._swiglu(_rms_t(x) * (1 + sc_mx.unsqueeze(1)),
                          self.ff.net[0].proj, self.ff.net[2])
        x = x + torch.tanh(g_mx).unsqueeze(1) * _rms_t(fx)
        if self.update_y:
            fy = self._swiglu(_rms_t(y) * (1 + sc_my.unsqueeze(1)),
                              self.ff_context.net[0].proj,
                              self.ff_context.net[2])
            y = y + torch.tanh(g_my).unsqueeze(1) * _rms_t(fy)
        return x, y


def _rope_tables(t, h, w, heads, hd):
    from videotuna_tpu.models.mochi.dit import mochi_positions, mochi_rope
    freqs = np.random.RandomState(7).normal(
        0, 0.5, (3, heads, hd // 2)).astype(np.float32)
    pos = mochi_positions(t, h, w)
    cos, sin = mochi_rope(jnp.asarray(freqs), pos)
    return freqs, np.asarray(cos), np.asarray(sin)


@pytest.mark.parametrize("update_y", [True, False])
def test_mochi_block_parity(update_y):
    from videotuna_tpu.models.mochi.dit import MochiBlock
    from videotuna_tpu.tools.convert_weights import (mochi_map,
                                                     verify_tree_shapes)

    torch.manual_seed(0)
    dim_x, dim_y, heads = 64, 32, 4
    hd = dim_x // heads
    blk = TorchMochiBlock(dim_x, dim_y, heads, update_y).eval()
    t, hh, ww, ly = 2, 2, 4, 6
    sx = t * hh * ww
    x = torch.randn(1, sx, dim_x)
    y = torch.randn(1, ly, dim_y)
    c = torch.randn(1, dim_x)
    _, cos, sin = _rope_tables(t, hh, ww, heads, hd)
    with torch.no_grad():
        x_ref, y_ref = blk(x, y, c, torch.from_numpy(cos),
                           torch.from_numpy(sin))

    ours = MochiBlock(dim_x=dim_x, dim_y=dim_y, heads=heads,
                      update_y=update_y)
    args = ((jnp.asarray(x.numpy()), jnp.asarray(y.numpy())),
            jnp.asarray(c.numpy()), jnp.asarray(cos), jnp.asarray(sin))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {f"transformer_blocks.0.{k}": v.numpy()
          for k, v in blk.state_dict().items()}
    tree = mochi_map(heads=heads).convert(sd, strict=True)["block_0"]
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    x_o, y_o = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(np.asarray(x_o), x_ref.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(y_o), y_ref.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_mochi_attention_pool_parity():
    """Attention pool: masked-mean query over [pool; tokens] with padding
    masked out of the softmax."""
    from videotuna_tpu.models.mochi.dit import MochiAttentionPool
    torch.manual_seed(1)
    d, heads, out_dim, ly = 32, 4, 48, 6
    to_kv = tnn.Linear(d, 2 * d)
    to_q = tnn.Linear(d, d)
    to_out = tnn.Linear(d, out_dim)
    x = torch.randn(1, ly, d)
    mask = torch.tensor([[1, 1, 1, 1, 0, 0]], dtype=torch.bool)

    with torch.no_grad():
        mf = mask.float().unsqueeze(-1)
        pool = (x * mf).sum(1, keepdim=True) / mf.sum(1, keepdim=True)
        xs = torch.cat([pool, x], dim=1)
        k, v = to_kv(xs).chunk(2, dim=-1)
        q = to_q(xs[:, :1])
        hd = d // heads
        q = q.view(1, 1, heads, hd).transpose(1, 2)
        k = k.view(1, ly + 1, heads, hd).transpose(1, 2)
        v = v.view(1, ly + 1, heads, hd).transpose(1, 2)
        full = torch.cat([torch.ones(1, 1, dtype=torch.bool), mask], dim=1)
        att_mask = full[:, None, None, :]
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=att_mask)
        ref = to_out(o.transpose(1, 2).reshape(1, d))

    ours = MochiAttentionPool(heads=heads, out_dim=out_dim)
    xj = jnp.asarray(x.numpy())
    mj = jnp.asarray(mask.numpy())
    init = ours.init(jax.random.key(0), xj, mj)["params"]
    from videotuna_tpu.tools.convert_weights import t_linear
    tree = {
        "to_kv": {"kernel": t_linear(to_kv.weight.detach().numpy()),
                  "bias": to_kv.bias.detach().numpy()},
        "to_q": {"kernel": t_linear(to_q.weight.detach().numpy()),
                 "bias": to_q.bias.detach().numpy()},
        "to_out": {"kernel": t_linear(to_out.weight.detach().numpy()),
                   "bias": to_out.bias.detach().numpy()},
    }
    out = ours.apply({"params": tree}, xj, mj)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=1e-4)
    _ = init


def test_mochi_dit_forward_and_grad():
    """Full tiny MochiDiT: scan path == per-block path, finite grads."""
    from videotuna_tpu.models.mochi.dit import MochiDiT
    kw = dict(dim=64, dim_y=32, depth=3, heads=4, caption_channels=16,
              patch_size=2)
    x = jax.random.normal(jax.random.key(1), (1, 2, 8, 8, 12))
    t = jnp.asarray([500.0])
    y = jax.random.normal(jax.random.key(2), (1, 6, 16))
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], bool)

    m_loop = MochiDiT(**kw, scan_blocks=False)
    p_loop = m_loop.init(jax.random.key(0), x, t, y, mask)["params"]
    out_loop = m_loop.apply({"params": p_loop}, x, t, y, mask)
    assert out_loop.shape == x.shape

    m_scan = MochiDiT(**kw, scan_blocks=True)
    from videotuna_tpu.tools.convert_weights import stack_blocks_for_scan
    p_scan = stack_blocks_for_scan(
        jax.tree.map(np.asarray, p_loop), prefix="block_",
        out_key="blocks", exclude=(kw["depth"] - 1,))
    out_scan = m_scan.apply({"params": p_scan}, x, t, y, mask)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5, rtol=1e-5)

    def loss(p):
        return jnp.mean(m_loop.apply({"params": p}, x, t, y, mask) ** 2)

    g = jax.grad(loss)(p_loop)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(g))


def test_mochi_flow_train_and_sample():
    from videotuna_tpu.core.config import load_configs
    from videotuna_tpu.core.registry import instantiate

    cfg = load_configs(["configs/010_mochi/mochi_t2v.yaml"])
    p = cfg["flow"]["params"]
    p["denoiser_config"]["params"].update(
        {"dim": 64, "dim_y": 32, "depth": 2, "heads": 4,
         "caption_channels": 16, "scan_blocks": False})
    p["first_stage_config"] = None
    p["cond_stage_config"] = None
    flow = p and instantiate(cfg["flow"])
    params = flow.init_params(0)
    batch = {"latents": jax.random.normal(jax.random.key(1),
                                          (1, 2, 8, 8, 12)),
             "text_states": jnp.zeros((1, 6, 16)),
             "text_mask": jnp.ones((1, 6), bool)}
    loss, aux = flow.training_loss(params, batch, jax.random.key(2))
    assert np.isfinite(float(loss))

    cond = {"y": jnp.zeros((1, 6, 16)), "mask": jnp.ones((1, 6), bool)}
    uncond = {"y": jnp.zeros((1, 6, 16)), "mask": jnp.ones((1, 6), bool)}
    out = flow.sample(params, cond, uncond, (1, 2, 8, 8, 12),
                      jax.random.key(3), cfg_scale=4.5)
    assert out.shape == (1, 2, 8, 8, 12)
    assert np.isfinite(np.asarray(out)).all()
