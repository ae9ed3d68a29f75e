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
