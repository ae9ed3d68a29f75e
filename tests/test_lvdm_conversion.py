"""VideoCrafter/lvdm UNet3D: WHOLE-MODEL conversion parity vs the
imported reference ``UNetModel`` (openaimodel3d.py) at a tiny VC2-style
config (use_linear, temporal conv+attention, addition_attention, fps
conditioning, no relative position)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def ref_unet_mod():
    import types
    if "omegaconf" not in sys.modules:   # pulled in via videotuna.utils
        oc = types.ModuleType("omegaconf")

        class OmegaConf:
            pass

        oc.OmegaConf = OmegaConf
        oc.DictConfig = dict
        oc.ListConfig = list
        sys.modules["omegaconf"] = oc
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, _):
                return lambda *a, **k: None

        lg.logger = _L()
        sys.modules["loguru"] = lg
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import videotuna.models.lvdm.modules.attention as ref_att
    # other parity tests stub `xformers` into sys.modules, which would
    # flip the reference CrossAttention onto efficient_forward and crash
    # against the stub's signature — force the plain einsum path
    ref_att.XFORMERS_IS_AVAILBLE = False
    import videotuna.models.lvdm.modules.networks.openaimodel3d as om
    return om


CFG = dict(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
           attention_resolutions=(1, 2), num_head_channels=16)


def _build_ref(ref_unet_mod, use_relative_position=False):
    torch.manual_seed(0)
    return ref_unet_mod.UNetModel(
        in_channels=4, model_channels=CFG["model_channels"],
        out_channels=4, num_res_blocks=CFG["num_res_blocks"],
        attention_resolutions=list(CFG["attention_resolutions"]),
        channel_mult=list(CFG["channel_mult"]),
        num_head_channels=CFG["num_head_channels"],
        transformer_depth=1, context_dim=24, use_linear=True,
        use_checkpoint=False, temporal_conv=True, temporal_attention=True,
        temporal_selfatt_only=True,
        use_relative_position=use_relative_position,
        use_causal_attention=False, temporal_length=4,
        addition_attention=True, fps_cond=True).eval()


@pytest.mark.parametrize("use_rel", [False, True])
def test_lvdm_whole_model_parity(ref_unet_mod, use_rel):
    from videotuna_tpu.models.lvdm.unet3d import UNet3D
    from videotuna_tpu.tools.convert_weights import (lvdm_map,
                                                     verify_tree_shapes)

    try:
        ref = _build_ref(ref_unet_mod, use_relative_position=use_rel)
    except TypeError:
        # constructor kwarg name differs across revisions
        pytest.skip("reference UNetModel signature mismatch")

    # perturb everything: zero_module'd proj_out/conv_out otherwise make
    # parts of the comparison vacuous
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn(p_.shape, generator=g) * 0.03)

    b, t, hh, ww = 1, 4, 16, 16
    x = torch.randn(b, 4, t, hh, ww)
    ts = torch.tensor([500.0])
    ctx = torch.randn(b, 6, 24)
    with torch.no_grad():
        out_ref = ref(x, ts, context=ctx, fps=16).numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = UNet3D(in_channels=4, out_channels=4,
                  model_channels=CFG["model_channels"],
                  num_res_blocks=CFG["num_res_blocks"],
                  attention_resolutions=CFG["attention_resolutions"],
                  channel_mult=CFG["channel_mult"],
                  num_head_channels=CFG["num_head_channels"],
                  context_dim=24, temporal_conv=True,
                  temporal_attention=True, temporal_length=4,
                  use_relative_position=use_rel, addition_attention=True,
                  fps_cond=True)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(ctx.numpy()))
    init = ours.init(jax.random.key(0), *args,
                     fps=jnp.asarray([16.0]))["params"]

    cmap = lvdm_map(model_channels=CFG["model_channels"],
                    channel_mult=CFG["channel_mult"],
                    num_res_blocks=CFG["num_res_blocks"],
                    attention_resolutions=CFG["attention_resolutions"],
                    num_head_channels=CFG["num_head_channels"],
                    temporal_conv=True, temporal_attention=True,
                    addition_attention=True,
                    use_relative_position=use_rel)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = cmap.convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:12]

    out = ours.apply({"params": tree}, *args, fps=jnp.asarray([16.0]))
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_np, out_ref, atol=1e-3, rtol=5e-3)


def test_dynamicrafter_image_cross_parity(ref_unet_mod):
    """DynamiCrafter i2v: img_cross_attention shares the query, adds
    to_k_ip/to_v_ip inside attn2, and sums before the output projection
    (attention.py:81-170; context packed as [77 text; image tokens])."""
    from videotuna_tpu.models.lvdm.unet3d import UNet3D
    from videotuna_tpu.tools.convert_weights import (lvdm_map,
                                                     verify_tree_shapes)
    torch.manual_seed(1)
    ref = ref_unet_mod.UNetModel(
        in_channels=4, model_channels=CFG["model_channels"],
        out_channels=4, num_res_blocks=CFG["num_res_blocks"],
        attention_resolutions=list(CFG["attention_resolutions"]),
        channel_mult=list(CFG["channel_mult"]),
        num_head_channels=CFG["num_head_channels"],
        transformer_depth=1, context_dim=24, use_linear=True,
        use_checkpoint=False, temporal_conv=True, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=4,
        addition_attention=True, use_image_attention=True,
        fps_cond=False).eval()
    g = torch.Generator().manual_seed(9)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn(p_.shape, generator=g) * 0.03)

    b, t, hh, ww = 1, 4, 16, 16
    x = torch.randn(b, 4, t, hh, ww)
    ts = torch.tensor([500.0])
    txt = torch.randn(b, 77, 24)          # text_context_len is fixed 77
    img_tok = torch.randn(b, 16, 24)
    ctx = torch.cat([txt, img_tok], dim=1)
    with torch.no_grad():
        out_ref = ref(x, ts, context=ctx).numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = UNet3D(in_channels=4, out_channels=4,
                  model_channels=CFG["model_channels"],
                  num_res_blocks=CFG["num_res_blocks"],
                  attention_resolutions=CFG["attention_resolutions"],
                  channel_mult=CFG["channel_mult"],
                  num_head_channels=CFG["num_head_channels"],
                  context_dim=24, temporal_conv=True,
                  temporal_attention=True, temporal_length=4,
                  use_relative_position=False, addition_attention=True,
                  use_image_attention=True, fps_cond=False)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    args = (xj, jnp.asarray([500.0]), jnp.asarray(txt.numpy()))
    kw = dict(context_img=jnp.asarray(img_tok.numpy()))
    init = ours.init(jax.random.key(0), *args, **kw)["params"]

    cmap = lvdm_map(model_channels=CFG["model_channels"],
                    channel_mult=CFG["channel_mult"],
                    num_res_blocks=CFG["num_res_blocks"],
                    attention_resolutions=CFG["attention_resolutions"],
                    num_head_channels=CFG["num_head_channels"],
                    temporal_conv=True, temporal_attention=True,
                    addition_attention=True, use_relative_position=False,
                    use_image_attention=True)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    tree = cmap.convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:12]

    out = ours.apply({"params": tree}, *args, **kw)
    out_np = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out_np, out_ref, atol=1e-3, rtol=5e-3)
