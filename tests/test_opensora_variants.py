"""Open-Sora 1.1/1.2 variant smoke tests: STDiT2 (qk-norm, IDDPM spaced)
and STDiT3 (temporal RoPE, rectified flow) — tiny shapes, full train-loss +
sample paths (reference models/opensora/models/stdit/stdit2…stdit3,
configs mirrored in configs/003_opensora/)."""

import jax
import jax.numpy as jnp
import numpy as np

from videotuna_tpu.core.config import load_configs
from videotuna_tpu.core.registry import instantiate


def _tiny(cfg, **overrides):
    p = cfg["flow"]["params"]
    d = p["denoiser_config"]["params"]
    d.update({"input_size": [2, 8, 8], "hidden_size": 32, "depth": 2,
              "num_heads": 2, "caption_channels": 16, "dtype": "float32",
              "scan_blocks": False, "remat": False})
    p["first_stage_config"] = None
    p["cond_stage_config"] = None
    d.update(overrides)
    return instantiate(cfg["flow"])


def _batch(key, flow):
    z = jax.random.normal(key, (1, 2, 8, 8, 4))
    return {"latents": z,
            "text_states": jnp.zeros((1, 8, 16)),
            "text_mask": jnp.ones((1, 8), bool)}


def test_stdit2_iddpm_train_and_sample():
    cfg = load_configs(["configs/003_opensora/"
                        "opensorav11_stdit2_multires.yaml"])
    flow = _tiny(cfg)
    assert flow.denoiser.qk_norm
    params = flow.init_params(0)
    loss, aux = flow.training_loss(params, _batch(jax.random.key(1), flow),
                                   jax.random.key(2))
    assert np.isfinite(float(loss))
    # spaced-IDDPM sampling: learned-variance path
    def denoise(x, t):
        return flow.denoise_apply(params, x, t,
                                  {"y": jnp.zeros((1, 8, 16)),
                                   "mask": jnp.ones((1, 8), bool)})
    out = flow.scheduler.sample(denoise, (1, 2, 8, 8, 4), jax.random.key(3))
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_stdit3_rectified_flow_train_and_sample():
    cfg = load_configs(["configs/003_opensora/"
                        "opensorav12_stdit3_720p.yaml"])
    flow = _tiny(cfg, pred_sigma=False)
    assert flow.denoiser.temporal_rope and flow.denoiser.qk_norm
    params = flow.init_params(0)
    loss, aux = flow.training_loss(params, _batch(jax.random.key(1), flow),
                                   jax.random.key(2))
    assert np.isfinite(float(loss))

    def denoise(x, t):
        return flow.denoise_apply(params, x, t,
                                  {"y": jnp.zeros((1, 8, 16)),
                                   "mask": jnp.ones((1, 8), bool)})
    out = flow.scheduler.sample(denoise, (1, 2, 8, 8, 4), jax.random.key(3))
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_stdit57_temporal_mod_and_frame_mask():
    """STDiT5-7 features: separate temporal adaLN (scale_shift_table_temporal
    + t_block_temp, reference stdit5.py:104-176) and masked-frame
    conditioning (x_mask -> timestep-0 modulation, :118-209)."""
    from videotuna_tpu.models.opensora.stdit import STDiT
    kw = dict(input_size=(4, 8, 8), in_channels=4, hidden_size=32,
              depth=2, num_heads=2, caption_channels=16,
              pred_sigma=False, temporal_mod=True)
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8, 4))
    t = jnp.array([500])
    y = jax.random.normal(jax.random.key(2), (1, 6, 16))

    for scan in (False, True):
        m = STDiT(**kw, scan_blocks=scan)
        p = m.init(jax.random.key(0), x, t, y)["params"]
        blocks = p["blocks"] if scan else p["block_0"]
        assert "scale_shift_table_temporal" in blocks
        assert "t_block_temp" in p

        out = m.apply({"params": p}, x, t, y)
        assert out.shape == (1, 4, 8, 8, 4)

        # all-frames-real mask must reproduce the unmasked forward
        full = jnp.ones((1, 4), bool)
        out_m = m.apply({"params": p}, x, t, y, x_mask=full)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out),
                                   atol=1e-5)

        # masking a frame must change (only) something
        part = jnp.array([[False, True, True, True]])
        out_p = m.apply({"params": p}, x, t, y, x_mask=part)
        assert float(jnp.abs(out_p - out).max()) > 1e-4


def test_stdit8_paired_blocks():
    """STDiT8/OpenSora-1.2 paired layout: scan == loop, x_mask works, and
    stdit8_map converts a synthetic paired state dict with exact shapes."""
    from videotuna_tpu.models.opensora.stdit import STDiT
    from videotuna_tpu.tools.convert_weights import (stdit8_map,
                                                     verify_tree_shapes)
    import torch
    import torch.nn as tnn

    kw = dict(input_size=(4, 8, 8), in_channels=4, hidden_size=32,
              depth=2, num_heads=2, caption_channels=16,
              pred_sigma=False, paired_blocks=True, qk_norm=True,
              temporal_rope=True)
    x = jax.random.normal(jax.random.key(1), (1, 4, 8, 8, 4))
    t = jnp.array([500])
    y = jax.random.normal(jax.random.key(2), (1, 6, 16))

    m1 = STDiT(**kw, scan_blocks=False)
    p1 = m1.init(jax.random.key(0), x, t, y)["params"]
    o1 = m1.apply({"params": p1}, x, t, y)

    m2 = STDiT(**kw, scan_blocks=True)
    import numpy as _np
    p2 = dict(m2.init(jax.random.key(0), x, t, y)["params"])
    p2["pairs"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[p1[f"pair_{i}"] for i in range(2)])
    for k in p1:
        if not k.startswith("pair_"):
            p2[k] = p1[k]
    o2 = m2.apply({"params": p2}, x, t, y)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    # masked-frame conditioning in paired mode
    mask_full = jnp.ones((1, 4), bool)
    om = m1.apply({"params": p1}, x, t, y, x_mask=mask_full)
    np.testing.assert_allclose(np.asarray(om), np.asarray(o1), atol=1e-5)

    # conversion: synthetic torch state dict in the stdit8 layout
    torch.manual_seed(0)
    sd = {}
    sd["x_embedder.proj.weight"] = torch.randn(32, 4, 1, 2, 2).numpy()
    sd["x_embedder.proj.bias"] = torch.randn(32).numpy()
    for nm, shapes in (("t_embedder.mlp.0", (32, 256)),
                       ("t_embedder.mlp.2", (32, 32)),
                       ("t_block.1", (192, 32)),
                       ("y_embedder.y_proj.fc1", (32, 16)),
                       ("y_embedder.y_proj.fc2", (32, 32)),
                       ("final_layer.linear", (4 * 4, 32))):
        sd[f"{nm}.weight"] = torch.randn(*shapes).numpy()
        sd[f"{nm}.bias"] = torch.randn(shapes[0]).numpy()
    sd["final_layer.scale_shift_table"] = torch.randn(2, 32).numpy()
    for root in ("spatial_blocks", "temporal_blocks"):
        for i in range(2):
            p = f"{root}.{i}"
            sd[f"{p}.scale_shift_table"] = torch.randn(6, 32).numpy()
            for a in ("attn.q", "attn.k", "attn.v", "attn.proj",
                      "cross_attn.q_linear", "cross_attn.k_linear",
                      "cross_attn.v_linear", "cross_attn.proj"):
                sd[f"{p}.{a}.weight"] = torch.randn(32, 32).numpy()
                sd[f"{p}.{a}.bias"] = torch.randn(32).numpy()
            sd[f"{p}.attn.q_norm.weight"] = torch.randn(16).numpy()
            sd[f"{p}.attn.k_norm.weight"] = torch.randn(16).numpy()
            sd[f"{p}.mlp.fc1.weight"] = torch.randn(128, 32).numpy()
            sd[f"{p}.mlp.fc1.bias"] = torch.randn(128).numpy()
            sd[f"{p}.mlp.fc2.weight"] = torch.randn(32, 128).numpy()
            sd[f"{p}.mlp.fc2.bias"] = torch.randn(32).numpy()
    tree = stdit8_map(heads=2).convert(sd, strict=True)
    probs = verify_tree_shapes(tree, p1)
    assert not probs, probs[:8]
