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
import jax.numpy as jnp
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


def _stub_module(name):
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _stub_opensora_deps():
    """timm / xformers / mmengine / colossalai shims so the reference
    opensora stdit.py imports on CPU without those packages."""
    import torch.nn as tnn
    import torch.nn.functional as F

    if "timm" not in sys.modules:
        timm = _stub_module("timm")
        tm = _stub_module("timm.models")
        tl = _stub_module("timm.models.layers")
        tv = _stub_module("timm.models.vision_transformer")

        class DropPath(tnn.Identity):
            def __init__(self, p=0.0):
                super().__init__()

        class Mlp(tnn.Module):
            # faithful to timm: fc1 → act → fc2 (drop=0 in the VAE/DiT use)
            def __init__(self, in_features, hidden_features, act_layer,
                         out_features=None, drop=0.0):
                super().__init__()
                self.fc1 = tnn.Linear(in_features, hidden_features)
                self.act = act_layer()
                self.fc2 = tnn.Linear(hidden_features,
                                      out_features or in_features)

            def forward(self, x):
                return self.fc2(self.act(self.fc1(x)))

        tl.DropPath = DropPath
        tv.Mlp = Mlp
        tm.layers = tl
        tm.vision_transformer = tv
        timm.models = tm
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl,
                            "timm.models.vision_transformer": tv})

    if "xformers" not in sys.modules:
        xf = _stub_module("xformers")
        ops = _stub_module("xformers.ops")

        def memory_efficient_attention(q, k, v, p=0.0, attn_bias=None):
            assert attn_bias is None
            o = F.scaled_dot_product_attention(
                q.transpose(1, 2).float(), k.transpose(1, 2).float(),
                v.transpose(1, 2).float())
            return o.transpose(1, 2)

        ops.memory_efficient_attention = memory_efficient_attention

        class _FMHA:
            class BlockDiagonalMask:
                @staticmethod
                def from_seqlens(q_lens, kv_lens=None):
                    # single-sequence block-diagonal == plain attention
                    assert len(q_lens) == 1, "stub supports B=1 only"
                    return None

        ops.fmha = _FMHA
        xf.ops = ops
        sys.modules.update({"xformers": xf, "xformers.ops": ops})

    if "mmengine" not in sys.modules:
        mme = _stub_module("mmengine")
        mmr = _stub_module("mmengine.registry")

        class Registry:
            def __init__(self, *a, **k):
                pass

            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco

        mmr.Registry = Registry
        mme.registry = mmr
        sys.modules.update({"mmengine": mme, "mmengine.registry": mmr})

    if "rotary_embedding_torch" not in sys.modules:
        ret = _stub_module("rotary_embedding_torch")

        class RotaryEmbedding:
            def __init__(self, *a, **k):
                pass

        ret.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = ret

    if "torchvision" not in sys.modules:
        tvn = _stub_module("torchvision")
        tvd = _stub_module("torchvision.datasets")
        tvu = _stub_module("torchvision.datasets.utils")
        tvu.download_url = lambda *a, **k: None
        tvd.utils = tvu
        tvn.datasets = tvd
        sys.modules.update({"torchvision": tvn,
                            "torchvision.datasets": tvd,
                            "torchvision.datasets.utils": tvu})

    def _lazy_attr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return type(attr, (), {})

    for name in ("colossalai", "colossalai.booster",
                 "colossalai.checkpoint_io", "colossalai.cluster"):
        if name not in sys.modules:
            m = _stub_module(name)
            m.__getattr__ = _lazy_attr
            sys.modules[name] = m
    sys.modules["colossalai.booster"].Booster = object
    sys.modules["colossalai.checkpoint_io"].GeneralCheckpointIO = object
    sys.modules["colossalai.cluster"].DistCoordinator = object


@pytest.fixture(scope="module")
def ref_stdit():
    _stub_opensora_deps()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import videotuna.models.opensora.models.stdit.stdit as stdit
    return stdit


def test_stdit_block_parity(ref_stdit):
    from videotuna_tpu.models.opensora.stdit import STDiTBlock
    from videotuna_tpu.tools.convert_weights import (
        preprocess_split_fused, preprocess_split_fused_qkv, stdit_map,
        verify_tree_shapes)

    torch.manual_seed(0)
    dim, heads, d_t, d_s = 32, 4, 3, 16
    blk = ref_stdit.STDiTBlock(dim, heads, d_s=d_s, d_t=d_t).eval()
    x = torch.randn(1, d_t * d_s, dim)
    y = torch.randn(1, 6, dim)
    t6 = torch.randn(1, 6 * dim)
    with torch.no_grad():
        out_ref = blk(x, y, t6)

    ours = STDiTBlock(hidden=dim, heads=heads)
    xj = np.asarray(x.numpy()).reshape(1, d_t, d_s, dim)
    args = (xj, np.asarray(y.numpy()),
            np.asarray(t6.numpy()).reshape(1, 6, dim))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {f"blocks.0.{k}": v.numpy() for k, v in blk.state_dict().items()}
    sd = preprocess_split_fused_qkv(sd, r"attn\.qkv|attn_temp\.qkv")
    sd = preprocess_split_fused(sd, r"cross_attn\.kv_linear", "kv_linear",
                                ("k_linear", "v_linear"))
    tree = stdit_map(heads=heads).convert(sd, strict=True)["block_0"]
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    out = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(
        np.asarray(out).reshape(1, d_t * d_s, dim), out_ref.numpy(),
        atol=3e-4, rtol=1e-3)


HY_DIR = "/root/reference/videotuna/models/hunyuan/hyvideo_i2v"


def _fake_hy_attention(q, k, v, *a, **kw):
    """Stand-in for hyvideo attenion.attention(mode='torch') — SDPA then
    head-flatten (attenion.py:MEMORY_LAYOUT['torch'])."""
    import torch.nn.functional as F
    o = F.scaled_dot_product_attention(
        q.transpose(1, 2).float(), k.transpose(1, 2).float(),
        v.transpose(1, 2).float()).transpose(1, 2)
    return o.reshape(*o.shape[:2], -1)


@pytest.fixture(scope="module")
def ref_hy():
    _stub_diffusers()
    _stub_loguru()
    if "deepspeed" not in sys.modules:
        sys.modules["deepspeed"] = types.ModuleType("deepspeed")
    _make_pkg("refhy", HY_DIR)
    _make_pkg("refhy.modules", f"{HY_DIR}/modules")
    _make_pkg("refhy.utils", f"{HY_DIR}/utils")
    _load("refhy.constants", f"{HY_DIR}/constants.py")
    _load("refhy.utils.helpers", f"{HY_DIR}/utils/helpers.py")
    for m in ("activation_layers", "norm_layers", "attenion",
              "embed_layers", "mlp_layers", "modulate_layers",
              "posemb_layers", "token_refiner"):
        _load(f"refhy.modules.{m}", f"{HY_DIR}/modules/{m}.py")
    mod = _load("refhy.modules.models", f"{HY_DIR}/modules/models.py")
    mod.attention = _fake_hy_attention

    def _cpu_cu_seqlens(text_mask, img_len):
        bsz = text_mask.shape[0]
        text_len = text_mask.sum(dim=1)
        max_len = text_mask.shape[1] + img_len
        cu = torch.zeros([2 * bsz + 1], dtype=torch.int32)
        for i in range(bsz):
            cu[2 * i + 1] = i * max_len + text_len[i] + img_len
            cu[2 * i + 2] = (i + 1) * max_len
        return cu

    mod.get_cu_seqlens = _cpu_cu_seqlens
    return mod


def test_hunyuan_double_block_parity(ref_hy):
    from videotuna_tpu.models.hunyuan.dit import MMDoubleStreamBlock
    from videotuna_tpu.models.layers import rope_3d
    from videotuna_tpu.tools.convert_weights import (
        hunyuan_map, preprocess_split_fused_qkv, verify_tree_shapes)

    torch.manual_seed(0)
    dim, heads = 32, 4
    hd = dim // heads
    blk = ref_hy.MMDoubleStreamBlock(dim, heads, mlp_width_ratio=4.0,
                                     qkv_bias=True).eval()
    _perturb_(blk)          # ModulateDiT zero-inits → identity block
    f, h, w = 2, 4, 4
    L, Lt = f * h * w, 6
    img = torch.randn(1, L, dim)
    txt = torch.randn(1, Lt, dim)
    vec = torch.randn(1, dim)
    pe = sys.modules["refhy.modules.posemb_layers"]
    freqs = pe.get_nd_rotary_pos_embed([4, 2, 2], [f, h, w], use_real=True)
    cu = torch.tensor([0, L + Lt, 2 * (L + Lt)], dtype=torch.int32)
    with torch.no_grad():
        img_ref, txt_ref = blk(img, txt, vec, cu_seqlens_q=cu,
                               cu_seqlens_kv=cu, freqs_cis=freqs)

    ours = MMDoubleStreamBlock(dim=dim, heads=heads)
    cos, sin = rope_3d(4, 2, 2, f, h, w)
    args = ((np.asarray(img.numpy()), np.asarray(txt.numpy())),
            np.asarray(vec.numpy()), cos, sin)
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = preprocess_split_fused_qkv(
        {f"double_blocks.0.{k}": v.numpy()
         for k, v in blk.state_dict().items()}, r"attn_qkv")
    tree = hunyuan_map(heads=heads).convert(sd, strict=True)["double_0"]
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    img_o, txt_o = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(np.asarray(img_o), img_ref.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(txt_o), txt_ref.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_hunyuan_single_block_parity(ref_hy):
    from videotuna_tpu.models.hunyuan.dit import MMSingleStreamBlock
    from videotuna_tpu.models.layers import rope_3d
    from videotuna_tpu.tools.convert_weights import (
        hunyuan_map, verify_tree_shapes)

    torch.manual_seed(1)
    dim, heads = 32, 4
    blk = ref_hy.MMSingleStreamBlock(dim, heads,
                                     mlp_width_ratio=4.0).eval()
    _perturb_(blk)          # ModulateDiT zero-inits → identity block
    f, h, w = 2, 4, 4
    L, Lt = f * h * w, 6
    x = torch.randn(1, L + Lt, dim)
    vec = torch.randn(1, dim)
    pe = sys.modules["refhy.modules.posemb_layers"]
    freqs = pe.get_nd_rotary_pos_embed([4, 2, 2], [f, h, w], use_real=True)
    cu = torch.tensor([0, L + Lt, 2 * (L + Lt)], dtype=torch.int32)
    with torch.no_grad():
        out_ref = blk(x, vec, Lt, cu_seqlens_q=cu, cu_seqlens_kv=cu,
                      freqs_cis=freqs)

    ours = MMSingleStreamBlock(dim=dim, heads=heads)
    cos, sin = rope_3d(4, 2, 2, f, h, w)
    hd2 = cos.shape[-1]
    cos_full = np.concatenate([np.asarray(cos), np.ones((Lt, hd2),
                                                        np.float32)])
    sin_full = np.concatenate([np.asarray(sin), np.zeros((Lt, hd2),
                                                         np.float32)])
    args = (np.asarray(x.numpy()), np.asarray(vec.numpy()), cos_full,
            sin_full, L)
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {f"single_blocks.0.{k}": v.numpy()
          for k, v in blk.state_dict().items()}
    tree = hunyuan_map(heads=heads).convert(sd, strict=True)["single_0"]
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:8]

    out = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(),
                               atol=3e-4, rtol=1e-3)


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



def _perturb_(ref_module, scale=0.03, seed=123):
    """Add noise to EVERY reference parameter: DiT-style zero-init of
    adaLN/final layers otherwise makes whole-model outputs identically
    zero and the parity assertion vacuous."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p_ in ref_module.parameters():
            p_.add_(torch.randn(p_.shape, generator=g) * scale)


def test_stdit_whole_model_parity(ref_stdit):
    """WHOLE-MODEL STDiT parity: random-init reference (imported from
    /root/reference with timm/xformers stubs) -> stdit_map -> our STDiT
    reproduces the full forward (pos embeds, t_embedder, caption MLP,
    blocks, T2I final layer)."""
    from videotuna_tpu.models.opensora.stdit import STDiT
    from videotuna_tpu.tools.convert_weights import (
        preprocess_split_fused, preprocess_split_fused_qkv, stdit_map,
        verify_tree_shapes)

    torch.manual_seed(0)
    tt, hh, ww = 4, 8, 8
    kw = dict(input_size=(tt, hh, ww), in_channels=4,
              patch_size=(1, 2, 2), hidden_size=32, depth=2, num_heads=4,
              caption_channels=16, model_max_length=6, pred_sigma=True)
    ref = ref_stdit.STDiT(**kw, dtype=torch.float32).eval()
    _perturb_(ref)

    x = torch.randn(1, 4, tt, hh, ww)
    t = torch.tensor([500.0])
    y = torch.randn(1, 1, 6, 16)
    with torch.no_grad():
        out_ref = ref(x, t, y, mask=None).numpy()

    ours = STDiT(**{k: v for k, v in kw.items()
                    if k != "model_max_length"})
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(y[:, 0].numpy()))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd = preprocess_split_fused_qkv(sd, r"attn\.qkv|attn_temp\.qkv")
    sd = preprocess_split_fused(sd, r"cross_attn\.kv_linear", "kv_linear",
                                ("k_linear", "v_linear"))
    tree = stdit_map(heads=4).convert(sd, strict=False)
    missing = verify_tree_shapes(tree, init)
    # pos_embed buffers are recomputed on device, not converted
    missing = [m for m in missing if "pos_embed" not in m]
    assert not missing, missing[:10]

    out = ours.apply({"params": tree}, *args)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert float(np.std(out_ref)) > 1e-3      # non-vacuous
    np.testing.assert_allclose(out_np, out_ref, atol=5e-4, rtol=2e-3)


def test_hunyuan_whole_model_parity(ref_hy):
    """WHOLE-MODEL HYVideoDiT parity: patch embed, token-refiner text-in,
    time/vector/guidance embedders, double+single blocks, final layer —
    random-init reference → hunyuan_map → identical forward
    (latent_concat mode; token_replace i2v conditioning not implemented)."""
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.tools.convert_weights import (
        hunyuan_map, preprocess_split_fused_qkv, verify_tree_shapes)

    torch.manual_seed(0)
    dim, heads = 32, 4
    ref = ref_hy.HYVideoDiffusionTransformer(
        in_channels=4, out_channels=4, patch_size=[1, 2, 2],
        hidden_size=dim, heads_num=heads, mlp_width_ratio=4.0,
        mm_double_blocks_depth=1, mm_single_blocks_depth=1,
        rope_dim_list=[2, 4, 2], qkv_bias=True, guidance_embed=True,
        text_states_dim=16, text_states_dim_2=12,
        i2v_condition_type="latent_concat",
        dtype=torch.float32).eval()
    _perturb_(ref)

    f, h, w = 2, 8, 8
    x = torch.randn(1, 4, f, h, w)
    t = torch.tensor([500.0])
    txt = torch.randn(1, 6, 16)
    mask = torch.ones(1, 6, dtype=torch.int64)
    pooled = torch.randn(1, 12)
    g = torch.tensor([6000.0])
    pe = sys.modules["refhy.modules.posemb_layers"]
    freqs_cos, freqs_sin = pe.get_nd_rotary_pos_embed(
        [2, 4, 2], [f, h // 2, w // 2], use_real=True)
    with torch.no_grad():
        out_ref = ref(x, t, txt, mask, pooled, freqs_cos, freqs_sin,
                      guidance=g, return_dict=False)
    if isinstance(out_ref, (tuple, list)):
        out_ref = out_ref[0]
    out_ref = out_ref.numpy()

    ours = HYVideoDiT(in_channels=4, out_channels=4, dim=dim, heads=heads,
                      double_blocks=1, single_blocks=1, text_dim=16,
                      pooled_dim=12, guidance_embed=True,
                      rope_dim_list=(2, 4, 2))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(txt.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(mask.numpy()).astype(bool),
            jnp.asarray([6000.0]))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = preprocess_split_fused_qkv(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        r"attn_qkv|linear1_qkv|self_attn_qkv")
    tree = hunyuan_map(heads=heads, out_ch=4).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:10]

    out = ours.apply({"params": tree}, *args)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert float(np.std(out_ref)) > 1e-3      # non-vacuous
    np.testing.assert_allclose(out_np, out_ref, atol=5e-4, rtol=2e-3)


def test_hunyuan_token_replace_parity(ref_hy):
    """token_replace i2v conditioning (the released HunyuanVideo-I2V
    default): first-latent-frame tokens modulated at timestep 0 — whole
    model vs the reference in token_replace mode."""
    from videotuna_tpu.models.hunyuan.dit import HYVideoDiT
    from videotuna_tpu.tools.convert_weights import (
        hunyuan_map, preprocess_split_fused_qkv, verify_tree_shapes)

    torch.manual_seed(3)
    dim, heads = 32, 4
    ref = ref_hy.HYVideoDiffusionTransformer(
        in_channels=4, out_channels=4, patch_size=[1, 2, 2],
        hidden_size=dim, heads_num=heads, mlp_width_ratio=4.0,
        mm_double_blocks_depth=1, mm_single_blocks_depth=1,
        rope_dim_list=[2, 4, 2], qkv_bias=True, guidance_embed=False,
        text_states_dim=16, text_states_dim_2=12,
        i2v_condition_type="token_replace",
        dtype=torch.float32).eval()

    f, h, w = 2, 8, 8
    x = torch.randn(1, 4, f, h, w)
    t = torch.tensor([500.0])
    txt = torch.randn(1, 6, 16)
    mask = torch.ones(1, 6, dtype=torch.int64)
    pooled = torch.randn(1, 12)
    pe = sys.modules["refhy.modules.posemb_layers"]
    freqs_cos, freqs_sin = pe.get_nd_rotary_pos_embed(
        [2, 4, 2], [f, h // 2, w // 2], use_real=True)
    with torch.no_grad():
        out_ref = ref(x, t, txt, mask, pooled, freqs_cos, freqs_sin,
                      return_dict=False)
    if isinstance(out_ref, (tuple, list)):
        out_ref = out_ref[0]

    ours = HYVideoDiT(in_channels=4, out_channels=4, dim=dim, heads=heads,
                      double_blocks=1, single_blocks=1, text_dim=16,
                      pooled_dim=12, guidance_embed=False,
                      rope_dim_list=(2, 4, 2),
                      i2v_condition_type="token_replace")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(txt.numpy()),
            jnp.asarray(pooled.numpy()),
            jnp.asarray(mask.numpy()).astype(bool))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = preprocess_split_fused_qkv(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        r"attn_qkv|linear1_qkv|self_attn_qkv")
    tree = hunyuan_map(heads=heads, out_ch=4).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:10]

    # the reference zero-inits adaLN/final layers, which makes the whole
    # forward identically zero at random init — perturb everything
    _perturb_(ref)
    with torch.no_grad():
        out_ref = ref(x, t, txt, mask, pooled, freqs_cos, freqs_sin,
                      return_dict=False)
    if isinstance(out_ref, (tuple, list)):
        out_ref = out_ref[0]
    sd = preprocess_split_fused_qkv(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        r"attn_qkv|linear1_qkv|self_attn_qkv")
    tree = hunyuan_map(heads=heads, out_ch=4).convert(sd, strict=True)

    out = ours.apply({"params": tree}, *args)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_np, out_ref.numpy(), atol=5e-4,
                               rtol=2e-3)

    # sanity: token_replace must actually change the output now
    base = HYVideoDiT(in_channels=4, out_channels=4, dim=dim, heads=heads,
                      double_blocks=1, single_blocks=1, text_dim=16,
                      pooled_dim=12, guidance_embed=False,
                      rope_dim_list=(2, 4, 2))
    assert float(np.std(out_ref.numpy())) > 1e-3
    out_base = base.apply({"params": tree}, *args)
    assert float(jnp.abs(out_base - out).max()) > 1e-5


@pytest.fixture(scope="module")
def ref_stdit8():
    _stub_opensora_deps()
    # faithful rotary_embedding_torch stand-in: interleaved-pair rotation
    # with theta-10000 inverse frequencies over the seq dim (-2), matching
    # the library's defaults used by stdit8 temporal attention
    import torch as _t
    ret = sys.modules["rotary_embedding_torch"]

    class RotaryEmbedding:
        def __init__(self, dim, *a, **k):
            self.inv = 1.0 / (10000.0 ** (_t.arange(0, dim, 2).float()
                                          / dim))

        def rotate_queries_or_keys(self, x, seq_dim=-2):
            n = x.shape[-2]
            freqs = _t.arange(n).float()[:, None] * self.inv[None]
            cos, sin = freqs.cos(), freqs.sin()
            x1, x2 = x[..., 0::2], x[..., 1::2]
            o1 = x1 * cos - x2 * sin
            o2 = x1 * sin + x2 * cos
            return _t.stack([o1, o2], dim=-1).flatten(-2)

    ret.RotaryEmbedding = RotaryEmbedding
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    import videotuna.models.opensora.models.stdit.stdit8 as s8
    importlib.reload(s8)      # rebind the faithful RotaryEmbedding
    return s8


def test_stdit8_whole_model_parity(ref_stdit8):
    """WHOLE-MODEL stdit8 (OpenSora-1.2 paired layout) parity: random-init
    reference → stdit8_map → our STDiT(paired_blocks=True)."""
    from videotuna_tpu.models.opensora.stdit import STDiT
    from videotuna_tpu.tools.convert_weights import (
        preprocess_split_fused, preprocess_split_fused_qkv, stdit8_map,
        verify_tree_shapes)

    torch.manual_seed(0)
    cfg = ref_stdit8.STDiT8Config(
        input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
        hidden_size=32, depth=2, num_heads=2, caption_channels=16,
        model_max_length=6, qk_norm=True, pred_sigma=False,
        enable_flash_attn=False, enable_layernorm_kernel=False,
        enable_sequence_parallelism=False)
    ref = ref_stdit8.STDiT8(cfg).eval()
    _perturb_(ref)

    x = torch.randn(1, 4, 4, 8, 8)
    t = torch.tensor([500.0])
    y = torch.randn(1, 1, 6, 16)
    fps = torch.tensor([24.0])
    hh_px = torch.tensor([64.0])
    ww_px = torch.tensor([64.0])
    with torch.no_grad():
        out_ref = ref(x, t, y, fps=fps, height=hh_px,
                      width=ww_px).numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = STDiT(input_size=(4, 8, 8), in_channels=4, hidden_size=32,
                 depth=2, num_heads=2, caption_channels=16,
                 pred_sigma=False, paired_blocks=True, qk_norm=True,
                 temporal_rope=True, dynamic_pos_embed=True,
                 input_sq_size=512.0)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    kw8 = dict(fps=jnp.asarray([24.0]), height=jnp.asarray([64.0]),
               width=jnp.asarray([64.0]))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(y[:, 0].numpy()))
    init = ours.init(jax.random.key(0), *args, **kw8)["params"]

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd = preprocess_split_fused_qkv(sd, r"attn\.qkv")
    sd = preprocess_split_fused(sd, r"cross_attn\.kv_linear", "kv_linear",
                                ("k_linear", "v_linear"))
    tree = stdit8_map(heads=2).convert(sd, strict=False)
    missing = [m for m in verify_tree_shapes(tree, init)
               if "pos_embed" not in m]
    assert not missing, missing[:10]

    out = ours.apply({"params": tree}, *args, **kw8)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_np, out_ref, atol=1e-3, rtol=5e-3)


def test_stdit8_mixed_frame_mask_parity(ref_stdit8):
    """stdit8 with a MIXED x_mask (first frame conditioned at timestep 0):
    the t_mask_select path must match the reference numerically."""
    from videotuna_tpu.models.opensora.stdit import STDiT
    from videotuna_tpu.tools.convert_weights import (
        preprocess_split_fused, preprocess_split_fused_qkv, stdit8_map)

    torch.manual_seed(5)
    cfg = ref_stdit8.STDiT8Config(
        input_size=(4, 8, 8), in_channels=4, patch_size=(1, 2, 2),
        hidden_size=32, depth=2, num_heads=2, caption_channels=16,
        model_max_length=6, qk_norm=True, pred_sigma=False,
        enable_flash_attn=False, enable_layernorm_kernel=False,
        enable_sequence_parallelism=False)
    ref = ref_stdit8.STDiT8(cfg).eval()
    _perturb_(ref)

    x = torch.randn(1, 4, 4, 8, 8)
    t = torch.tensor([500.0])
    y = torch.randn(1, 1, 6, 16)
    fps = torch.tensor([24.0])
    hp, wp = torch.tensor([64.0]), torch.tensor([64.0])
    x_mask = torch.tensor([[False, True, True, True]])
    with torch.no_grad():
        out_ref = ref(x, t, y, x_mask=x_mask, fps=fps, height=hp,
                      width=wp).numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = STDiT(input_size=(4, 8, 8), in_channels=4, hidden_size=32,
                 depth=2, num_heads=2, caption_channels=16,
                 pred_sigma=False, paired_blocks=True, qk_norm=True,
                 temporal_rope=True, dynamic_pos_embed=True)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(y[:, 0].numpy()))
    kw = dict(fps=jnp.asarray([24.0]), height=jnp.asarray([64.0]),
              width=jnp.asarray([64.0]),
              x_mask=jnp.asarray([[False, True, True, True]]))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd = preprocess_split_fused_qkv(sd, r"attn\.qkv")
    sd = preprocess_split_fused(sd, r"cross_attn\.kv_linear", "kv_linear",
                                ("k_linear", "v_linear"))
    tree = stdit8_map(heads=2).convert(sd, strict=False)

    out = ours.apply({"params": tree}, *args, **kw)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_np, out_ref, atol=1e-3, rtol=5e-3)
