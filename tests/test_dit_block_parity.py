"""DiT block-level numerical parity vs the actual reference torch modules.

Imports the reference sources from /root/reference with dependency shims
(diffusers config mixins, loguru) and a CPU SDPA stand-in for flash-attn,
then converts random-init reference blocks through tools/convert_weights
and asserts forward parity (the VERDICT §3 gate: Wan DiT block here;
reference wan/modules/model.py:102-292).
"""

import importlib.util
import sys
import types

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

WAN_DIR = "/root/reference/videotuna/models/wan/wan/modules"


def _stub_diffusers():
    if "diffusers" in sys.modules:
        return
    import torch.nn as tnn
    d = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(fn):
        return fn

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    dm = types.ModuleType("diffusers.models")
    mu = types.ModuleType("diffusers.models.modeling_utils")
    mu.ModelMixin = tnn.Module
    dm.modeling_utils = mu
    dm.ModelMixin = tnn.Module
    d.configuration_utils = cu
    d.models = dm
    sys.modules["diffusers"] = d
    sys.modules["diffusers.configuration_utils"] = cu
    sys.modules["diffusers.models"] = dm
    sys.modules["diffusers.models.modeling_utils"] = mu


def _stub_loguru():
    if "loguru" in sys.modules:
        return
    stub = types.ModuleType("loguru")

    class _L:
        def __getattr__(self, _):
            return lambda *a, **k: None

    stub.logger = _L()
    sys.modules["loguru"] = stub


def _make_pkg(name, path):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
    return sys.modules[name]


def _load(name, file):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _sdpa_flash(q, k, v, q_lens=None, k_lens=None, window_size=(-1, -1),
                **kw):
    """CPU stand-in for the reference flash_attention wrapper
    (wan/modules/attention.py:148-179 documents this exact SDPA fallback).
    q/k/v: (B, L, H, D) → (B, L, H, D)."""
    import torch.nn.functional as F
    out = F.scaled_dot_product_attention(
        q.transpose(1, 2).float(), k.transpose(1, 2).float(),
        v.transpose(1, 2).float())
    return out.transpose(1, 2)


@pytest.fixture(scope="module")
def ref_wan():
    _stub_diffusers()
    _make_pkg("refwan", WAN_DIR)
    _load("refwan.attention", f"{WAN_DIR}/attention.py")
    mod = _load("refwan.model", f"{WAN_DIR}/model.py")
    mod.flash_attention = _sdpa_flash
    return mod


@pytest.mark.parametrize("cross_type", ["t2v_cross_attn", "i2v_cross_attn"])
def test_wan_block_parity(ref_wan, cross_type):
    from videotuna_tpu.models.layers import rope_3d, wan_rope_dims
    from videotuna_tpu.models.wan.dit import WanBlock
    from videotuna_tpu.tools.convert_weights import wan_map

    torch.manual_seed(0)
    dim, heads, ffn = 32, 4, 64
    hd = dim // heads
    blk = ref_wan.WanAttentionBlock(cross_type, dim, ffn, heads,
                                    qk_norm=True, cross_attn_norm=True,
                                    eps=1e-6).eval()

    f, h, w = 3, 4, 4
    L = f * h * w
    Lt = 6
    x = torch.randn(1, L, dim)
    e = torch.randn(1, 6, dim)
    # i2v context: first 257 tokens are CLIP image tokens
    n_img = 257 if cross_type == "i2v_cross_attn" else 0
    ctx = torch.randn(1, n_img + Lt, dim)
    dt, dh, dw = wan_rope_dims(hd)
    freqs = torch.cat([ref_wan.rope_params(1024, dt),
                       ref_wan.rope_params(1024, dh),
                       ref_wan.rope_params(1024, dw)], dim=1)
    with torch.no_grad():
        out_ref = blk(x, e, torch.tensor([L]), torch.tensor([[f, h, w]]),
                      freqs, ctx, None)

    ours = WanBlock(dim=dim, heads=heads, ffn_dim=ffn)
    cos, sin = rope_3d(dt, dh, dw, f, h, w)
    ctx_txt = np.asarray(ctx[:, n_img:].numpy())
    ctx_img = np.asarray(ctx[:, :n_img].numpy()) if n_img else None
    args = (np.asarray(x.numpy()), np.asarray(e.numpy()), ctx_txt,
            ctx_img, cos, sin)
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {f"blocks.0.{k}": v.numpy() for k, v in blk.state_dict().items()}
    tree = wan_map(heads=heads).convert(sd, strict=True)["block_0"]
    from videotuna_tpu.tools.convert_weights import verify_tree_shapes
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    out = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=3e-4, rtol=1e-3)
