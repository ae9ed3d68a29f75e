"""Wan family conversion: synthetic torch-named state dict → WanModel tree
with exact shape verification and a live forward."""

import numpy as np
import pytest

from videotuna_tpu.tools.convert_weights import (verify_tree_shapes,
                                                 wan_map)


def make_wan_torch_sd(layers=2, dim=32, ffn=64, heads=4, text_dim=24,
                      freq_dim=256, zc=16, patch=(1, 2, 2)):
    rng = np.random.default_rng(0)
    g = lambda *s: rng.normal(size=s).astype(np.float32) * 0.02
    sd = {
        "patch_embedding.weight": g(dim, zc, *patch),
        "patch_embedding.bias": g(dim),
        "text_embedding.0.weight": g(dim, text_dim),
        "text_embedding.0.bias": g(dim),
        "text_embedding.2.weight": g(dim, dim),
        "text_embedding.2.bias": g(dim),
        "time_embedding.0.weight": g(dim, freq_dim),
        "time_embedding.0.bias": g(dim),
        "time_embedding.2.weight": g(dim, dim),
        "time_embedding.2.bias": g(dim),
        "time_projection.1.weight": g(6 * dim, dim),
        "time_projection.1.bias": g(6 * dim),
        "head.head.weight": g(np.prod(patch) * zc, dim),
        "head.head.bias": g(np.prod(patch) * zc),
        "head.modulation": g(1, 2, dim),
    }
    for i in range(layers):
        p = f"blocks.{i}."
        sd[p + "modulation"] = g(1, 6, dim)
        sd[p + "norm3.weight"] = np.ones(dim, np.float32)
        sd[p + "norm3.bias"] = np.zeros(dim, np.float32)
        for attn in ("self_attn", "cross_attn"):
            for proj in "qkv":
                sd[p + f"{attn}.{proj}.weight"] = g(dim, dim)
                sd[p + f"{attn}.{proj}.bias"] = g(dim)
            sd[p + f"{attn}.o.weight"] = g(dim, dim)
            sd[p + f"{attn}.o.bias"] = g(dim)
            sd[p + f"{attn}.norm_q.weight"] = np.ones(dim, np.float32)
            sd[p + f"{attn}.norm_k.weight"] = np.ones(dim, np.float32)
        sd[p + "ffn.0.weight"] = g(ffn, dim)
        sd[p + "ffn.0.bias"] = g(ffn)
        sd[p + "ffn.2.weight"] = g(dim, ffn)
        sd[p + "ffn.2.bias"] = g(dim)
    return sd


class TestWanConversion:
    def test_convert_verify_and_run(self):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.models.wan.dit import WanModel

        model = WanModel(in_channels=16, out_channels=16, dim=32,
                         ffn_dim=64, num_layers=2, heads=4, text_dim=24)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([100.0]), jnp.zeros((1, 6, 24)))
        target = model.init(jax.random.key(0), *args)["params"]

        sd = make_wan_torch_sd()
        tree = wan_map(heads=4).convert(sd, strict=True)
        problems = verify_tree_shapes(tree, target)
        assert problems == [], problems[:10]

        out = model.apply({"params": tree}, *args)
        assert out.shape == (1, 2, 8, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_strict_flags_unknown_keys(self):
        sd = make_wan_torch_sd()
        sd["blocks.0.unknown_thing.weight"] = np.zeros((4, 4), np.float32)
        with pytest.raises(KeyError, match="unknown_thing"):
            wan_map(heads=4).convert(sd, strict=True)


def test_wan_whole_model_parity():
    """WHOLE-MODEL parity: random-init reference WanModel (imported from
    /root/reference, flash attention stubbed to SDPA) -> wan_map -> our
    WanModel reproduces the t2v forward end to end."""
    import sys
    import numpy as np
    import torch
    sys.path.insert(0, ".")
    from tests.test_dit_block_parity import ref_wan as _fixture  # noqa
    import tests.test_dit_block_parity as P
    P._stub_diffusers()
    P._make_pkg("refwan", P.WAN_DIR)
    P._load("refwan.attention", f"{P.WAN_DIR}/attention.py")
    mod = P._load("refwan.model", f"{P.WAN_DIR}/model.py")
    mod.flash_attention = P._sdpa_flash

    import jax
    import jax.numpy as jnp
    from videotuna_tpu.models.wan.dit import WanModel
    from videotuna_tpu.tools.convert_weights import (wan_map,
                                                     verify_tree_shapes)

    torch.manual_seed(0)
    dim, heads, ffn, layers, tdim = 32, 4, 64, 2, 16
    ref = mod.WanModel(model_type="t2v", patch_size=(1, 2, 2), text_len=6,
                       in_dim=4, dim=dim, ffn_dim=ffn, freq_dim=32,
                       text_dim=tdim, out_dim=4, num_heads=heads,
                       num_layers=layers, qk_norm=True,
                       cross_attn_norm=True, eps=1e-6).eval()
    # the reference zero-inits its head (init_weights) — perturb every
    # parameter so the whole-model comparison is non-vacuous
    g = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn(p_.shape, generator=g) * 0.03)

    f, h, w = 3, 8, 8
    x = torch.randn(4, f, h, w)
    ctx = torch.randn(6, tdim)
    t = torch.tensor([500.0])
    L = f * (h // 2) * (w // 2)
    with torch.no_grad():
        out_ref = ref([x], t, [ctx], seq_len=L)[0].numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = WanModel(in_channels=4, out_channels=4, dim=dim, ffn_dim=ffn,
                    num_layers=layers, heads=heads, text_dim=tdim,
                    freq_dim=32)
    xj = jnp.asarray(x.numpy().transpose(1, 2, 3, 0))[None]
    args = (xj, jnp.asarray([500.0]), jnp.asarray(ctx.numpy())[None])
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = wan_map(heads=heads).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:10]

    out = ours.apply({"params": tree}, *args)
    # ours: (B, F, H, W, C) -> reference (C, F, H, W)
    out_np = np.asarray(out)[0].transpose(3, 0, 1, 2)
    np.testing.assert_allclose(out_np, out_ref, atol=5e-4, rtol=2e-3)
