"""Hunyuan conversion: synthetic torch state dict (fused qkv) → HYVideoDiT
double/single block tree with shape verification + live forward."""

import numpy as np
import pytest

from videotuna_tpu.tools.convert_weights import (hunyuan_map,
                                                 preprocess_split_fused_qkv,
                                                 verify_tree_shapes)


def make_hy_torch_sd(double=1, single=2, dim=32, heads=2, text_dim=24,
                     pooled=12, zc=16, mlp_ratio=4, patch=(1, 2, 2)):
    rng = np.random.default_rng(0)
    g = lambda *s: rng.normal(size=s).astype(np.float32) * 0.02
    hd = dim // heads
    mlp = dim * mlp_ratio
    sd = {
        "img_in.proj.weight": g(dim, zc, *patch),
        "img_in.proj.bias": g(dim),
        "time_in.mlp.0.weight": g(dim, 256),
        "time_in.mlp.0.bias": g(dim),
        "time_in.mlp.2.weight": g(dim, dim),
        "time_in.mlp.2.bias": g(dim),
        "vector_in.in_layer.weight": g(dim, pooled),
        "vector_in.in_layer.bias": g(dim),
        "vector_in.out_layer.weight": g(dim, dim),
        "vector_in.out_layer.bias": g(dim),
        "guidance_in.mlp.0.weight": g(dim, 256),
        "guidance_in.mlp.0.bias": g(dim),
        "guidance_in.mlp.2.weight": g(dim, dim),
        "guidance_in.mlp.2.bias": g(dim),
        "final_layer.linear.weight": g(np.prod(patch) * zc, dim),
        "final_layer.linear.bias": g(np.prod(patch) * zc),
        "final_layer.adaLN_modulation.1.weight": g(2 * dim, dim),
        "final_layer.adaLN_modulation.1.bias": g(2 * dim),
    }
    for i in range(double):
        p = f"double_blocks.{i}."
        for s in ("img", "txt"):
            sd[p + f"{s}_mod.linear.weight"] = g(6 * dim, dim)
            sd[p + f"{s}_mod.linear.bias"] = g(6 * dim)
            sd[p + f"{s}_attn_qkv.weight"] = g(3 * dim, dim)
            sd[p + f"{s}_attn_qkv.bias"] = g(3 * dim)
            sd[p + f"{s}_attn_proj.weight"] = g(dim, dim)
            sd[p + f"{s}_attn_proj.bias"] = g(dim)
            sd[p + f"{s}_attn_q_norm.weight"] = np.ones(hd, np.float32)
            sd[p + f"{s}_attn_k_norm.weight"] = np.ones(hd, np.float32)
            sd[p + f"{s}_mlp.fc1.weight"] = g(mlp, dim)
            sd[p + f"{s}_mlp.fc1.bias"] = g(mlp)
            sd[p + f"{s}_mlp.fc2.weight"] = g(dim, mlp)
            sd[p + f"{s}_mlp.fc2.bias"] = g(dim)
    for i in range(single):
        p = f"single_blocks.{i}."
        sd[p + "linear1.weight"] = g(3 * dim + mlp, dim)
        sd[p + "linear1.bias"] = g(3 * dim + mlp)
        sd[p + "linear2.weight"] = g(dim, dim + mlp)
        sd[p + "linear2.bias"] = g(dim)
        sd[p + "q_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "k_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "modulation.linear.weight"] = g(3 * dim, dim)
        sd[p + "modulation.linear.bias"] = g(3 * dim)
    return sd


class TestHunyuanConversion:
    def test_convert_verify_and_run(self):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.models.hunyuan.dit import HYVideoDiT

        model = HYVideoDiT(in_channels=16, out_channels=16, dim=32,
                           heads=2, double_blocks=1, single_blocks=2,
                           text_dim=24, pooled_dim=12, guidance_embed=True)
        x = jnp.zeros((1, 2, 8, 8, 16))
        args = (x, jnp.array([500.0]), jnp.zeros((1, 6, 24)),
                jnp.zeros((1, 12)), jnp.ones((1, 6), bool),
                jnp.array([6000.0]))
        target = dict(model.init(jax.random.key(0), *args)["params"])

        sd = preprocess_split_fused_qkv(make_hy_torch_sd(),
                                        r"double_blocks.*attn_qkv")
        tree = hunyuan_map(heads=2).convert(sd, strict=True)
        # token refiner (txt_in) uses our own layout — graft target's
        target_main = {k: v for k, v in target.items() if k != "txt_in"}
        problems = verify_tree_shapes(tree, target_main)
        assert problems == [], problems[:10]

        tree["txt_in"] = target["txt_in"]
        out = model.apply({"params": tree}, *args)
        assert out.shape == (1, 2, 8, 8, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_fused_split_preprocess(self):
        sd = {"double_blocks.0.img_attn_qkv.weight":
              np.arange(12).reshape(6, 2).astype(np.float32)}
        out = preprocess_split_fused_qkv(sd, r"attn_qkv")
        assert set(out) == {"double_blocks.0.img_attn_q.weight",
                            "double_blocks.0.img_attn_k.weight",
                            "double_blocks.0.img_attn_v.weight"}
        np.testing.assert_array_equal(
            out["double_blocks.0.img_attn_q.weight"],
            sd["double_blocks.0.img_attn_qkv.weight"][:2])
