"""Weight-conversion tests: layout transforms, STDiT end-to-end conversion
against a synthetic torch state dict, LoRA conversion, inflation."""

import numpy as np
import pytest

from videotuna_tpu.tools.convert_weights import (ConversionMap,
                                                 convert_lora_safetensors,
                                                 inflate_conv2d_to_3d,
                                                 merge_into_tree,
                                                 stack_blocks_for_scan,
                                                 stdit_map, strip_prefixes,
                                                 t_conv, t_dense_general,
                                                 t_linear,
                                                 verify_tree_shapes)


class TestTransforms:
    def test_linear_transpose(self):
        w = np.arange(6).reshape(2, 3).astype(np.float32)  # (out=2, in=3)
        assert t_linear(w).shape == (3, 2)

    def test_conv_layout(self):
        w = np.zeros((8, 4, 3, 3))  # torch (out, in, kh, kw)
        assert t_conv(w).shape == (3, 3, 4, 8)
        w3 = np.zeros((8, 4, 1, 2, 2))
        assert t_conv(w3).shape == (1, 2, 2, 4, 8)

    def test_dense_general_heads(self):
        w = np.arange(24).reshape(6, 4).astype(np.float32)  # (H·hd=6, in=4)
        out = t_dense_general(2)(w)
        assert out.shape == (4, 2, 3)
        # head 0 row 0 must equal torch rows 0..2 of column 0
        np.testing.assert_array_equal(out[0, 0], w[:3, 0])

    def test_inflation_center_identity(self):
        w2d = np.random.default_rng(0).normal(size=(3, 3, 4, 8)).astype(
            np.float32)
        w3d = inflate_conv2d_to_3d(w2d, kt=3)
        assert w3d.shape == (3, 3, 3, 4, 8)
        np.testing.assert_array_equal(w3d[1], w2d)
        np.testing.assert_array_equal(w3d[0], 0)

    def test_strip_prefixes_all_keys_only(self):
        sd = {"module.a.w": np.zeros(1), "module.b.w": np.zeros(1)}
        out = strip_prefixes(sd)
        assert set(out) == {"a.w", "b.w"}
        mixed = {"module.a": np.zeros(1), "b": np.zeros(1)}
        assert set(strip_prefixes(mixed)) == {"module.a", "b"}


class TestSTDiTConversion:
    def make_torch_sd(self, depth=2, hidden=64, heads=4, cap=32):
        rng = np.random.default_rng(0)
        g = lambda *s: rng.normal(size=s).astype(np.float32)
        sd = {
            "x_embedder.proj.weight": g(hidden, 4, 1, 2, 2),
            "x_embedder.proj.bias": g(hidden),
            "t_embedder.mlp.0.weight": g(hidden, 256),
            "t_embedder.mlp.0.bias": g(hidden),
            "t_embedder.mlp.2.weight": g(hidden, hidden),
            "t_embedder.mlp.2.bias": g(hidden),
            "t_block.1.weight": g(6 * hidden, hidden),
            "t_block.1.bias": g(6 * hidden),
            "y_embedder.y_proj.fc1.weight": g(hidden, cap),
            "y_embedder.y_proj.fc1.bias": g(hidden),
            "y_embedder.y_proj.fc2.weight": g(hidden, hidden),
            "y_embedder.y_proj.fc2.bias": g(hidden),
            "final_layer.scale_shift_table": g(2, hidden),
            "final_layer.linear.weight": g(32, hidden),
            "final_layer.linear.bias": g(32),
        }
        for i in range(depth):
            p = f"blocks.{i}."
            sd[p + "scale_shift_table"] = g(6, hidden)
            for attn in ("attn", "attn_temp"):
                for proj in "qkv":
                    sd[p + f"{attn}.{proj}.weight"] = g(hidden, hidden)
                    sd[p + f"{attn}.{proj}.bias"] = g(hidden)
                sd[p + f"{attn}.proj.weight"] = g(hidden, hidden)
                sd[p + f"{attn}.proj.bias"] = g(hidden)
            sd[p + "cross_attn.q_linear.weight"] = g(hidden, hidden)
            sd[p + "cross_attn.q_linear.bias"] = g(hidden)
            sd[p + "cross_attn.proj.weight"] = g(hidden, hidden)
            sd[p + "cross_attn.proj.bias"] = g(hidden)
            sd[p + "mlp.fc1.weight"] = g(4 * hidden, hidden)
            sd[p + "mlp.fc1.bias"] = g(4 * hidden)
            sd[p + "mlp.fc2.weight"] = g(hidden, 4 * hidden)
            sd[p + "mlp.fc2.bias"] = g(hidden)
        return sd

    def test_convert_and_verify_against_real_module(self):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.models.opensora.stdit import STDiT

        model = STDiT(input_size=(4, 16, 16), in_channels=4, hidden_size=64,
                      depth=2, num_heads=4, caption_channels=32,
                      pred_sigma=True)
        x = jnp.zeros((1, 4, 16, 16, 4))
        target = model.init(jax.random.key(0), x, jnp.array([1]),
                            jnp.zeros((1, 8, 32)),
                            jnp.ones((1, 8), bool))["params"]

        sd = self.make_torch_sd()
        # cross_attn kv in the reference is a fused kv_linear; emulate the
        # caller splitting it into k/v entries first:
        rng = np.random.default_rng(1)
        for i in range(2):
            kv = rng.normal(size=(128, 64)).astype(np.float32)
            sd[f"blocks.{i}.cross_attn.k.weight"] = kv[:64]
            sd[f"blocks.{i}.cross_attn.v.weight"] = kv[64:]
            sd[f"blocks.{i}.cross_attn.k.bias"] = np.zeros(64, np.float32)
            sd[f"blocks.{i}.cross_attn.v.bias"] = np.zeros(64, np.float32)
        cmap = stdit_map(heads=4)
        extra = ConversionMap([
            (r"blocks\.(\d+)\.cross_attn\.k\.weight",
             r"block_\1/cross_attn/k/kernel", t_dense_general(4)),
            (r"blocks\.(\d+)\.cross_attn\.v\.weight",
             r"block_\1/cross_attn/v/kernel", t_dense_general(4)),
            (r"blocks\.(\d+)\.cross_attn\.k\.bias",
             r"block_\1/cross_attn/k/bias",
             lambda b: b.reshape(4, -1)),
            (r"blocks\.(\d+)\.cross_attn\.v\.bias",
             r"block_\1/cross_attn/v/bias",
             lambda b: b.reshape(4, -1)),
        ])
        tree = cmap.convert(sd)
        tree = merge_into_tree(tree, extra.convert(sd))
        problems = verify_tree_shapes(tree, target)
        assert problems == [], problems[:10]

        # the converted tree must actually run
        out = model.apply({"params": tree}, x, jnp.array([5]),
                          jnp.zeros((1, 8, 32)), jnp.ones((1, 8), bool))
        assert out.shape == (1, 4, 16, 16, 8)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_stack_for_scan(self):
        sd = self.make_torch_sd()
        rng = np.random.default_rng(1)
        for i in range(2):
            sd[f"blocks.{i}.cross_attn.k.weight"] = rng.normal(
                size=(64, 64)).astype(np.float32)
            sd[f"blocks.{i}.cross_attn.v.weight"] = rng.normal(
                size=(64, 64)).astype(np.float32)
            sd[f"blocks.{i}.cross_attn.k.bias"] = np.zeros(64, np.float32)
            sd[f"blocks.{i}.cross_attn.v.bias"] = np.zeros(64, np.float32)
        extra = ConversionMap([
            (r"blocks\.(\d+)\.cross_attn\.(k|v)\.weight",
             r"block_\1/cross_attn/\2/kernel", t_dense_general(4)),
            (r"blocks\.(\d+)\.cross_attn\.(k|v)\.bias",
             r"block_\1/cross_attn/\2/bias", lambda b: b.reshape(4, -1)),
        ])
        tree = merge_into_tree(stdit_map(4).convert(self.make_torch_sd()),
                               extra.convert(sd))
        stacked = stack_blocks_for_scan(tree)
        assert "blocks" in stacked and "block_0" not in stacked
        assert stacked["blocks"]["mlp"]["fc1"]["kernel"].shape == (2, 64, 256)


class TestLoraConversion:
    def test_peft_layout(self):
        sd = {
            "unet.attn.q.lora_A.weight": np.zeros((4, 64), np.float32),
            "unet.attn.q.lora_B.weight": np.zeros((64, 4), np.float32),
            "unet.attn.k.lora_down.weight": np.zeros((4, 64), np.float32),
            "unet.attn.k.lora_up.weight": np.zeros((64, 4), np.float32),
        }
        out = convert_lora_safetensors(sd)
        assert set(out) == {"unet.attn.q", "unet.attn.k"}
        assert out["unet.attn.q"]["a"].shape == (64, 4)
        assert out["unet.attn.q"]["b"].shape == (4, 64)


def test_split_lightning_components():
    """Monolithic Lightning ckpt → per-component sub-dicts (the reference
    tools/videocrafter_checkpoint_converter.py semantics)."""
    import numpy as np
    from videotuna_tpu.tools.convert_weights import \
        split_lightning_components
    sd = {
        "model.diffusion_model.input_blocks.0.weight": np.zeros(2),
        "first_stage_model.encoder.conv_in.weight": np.zeros(3),
        "cond_stage_model.transformer.h.0.weight": np.zeros(4),
        "img_cond_stage_model.visual.proj": np.zeros(5),
        "betas": np.zeros(6),
    }
    comps = split_lightning_components(sd)
    assert set(comps) == {"denoiser", "first_stage", "cond_stage",
                          "cond_stage_2", "other"}
    assert list(comps["denoiser"]) == ["input_blocks.0.weight"]
    assert list(comps["first_stage"]) == ["encoder.conv_in.weight"]
    assert list(comps["cond_stage"]) == ["transformer.h.0.weight"]
    assert list(comps["cond_stage_2"]) == ["visual.proj"]
    assert list(comps["other"]) == ["betas"]
