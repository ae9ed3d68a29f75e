"""Flux: WHOLE-MODEL parity against the reference BFL implementation.

The reference vendors the original black-forest-labs Flux source
(/root/reference/videotuna/models/flux/model.py, modules/layers.py) which
imports cleanly (torch + einops only) — so this is a true end-to-end
conversion gate: random-init reference Flux → ``flux_map`` → our
FluxModel reproduces its output."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

FLUX_DIR = "/root/reference/videotuna/models/flux"


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


@pytest.fixture(scope="module")
def ref_flux():
    _make_pkg("flux", FLUX_DIR)
    _load("flux.flux_math", f"{FLUX_DIR}/flux_math.py")
    _make_pkg("flux.modules", f"{FLUX_DIR}/modules")
    _load("flux.modules.layers", f"{FLUX_DIR}/modules/layers.py")
    return _load("flux.model", f"{FLUX_DIR}/model.py")


def test_flux_whole_model_parity(ref_flux):
    from videotuna_tpu.models.flux.dit import FluxModel
    from videotuna_tpu.tools.convert_weights import (
        flux_map, preprocess_split_fused_qkv, verify_tree_shapes)

    torch.manual_seed(0)
    hh = ww = 4
    params_ref = ref_flux.FluxParams(
        in_channels=8, vec_in_dim=12, context_in_dim=16, hidden_size=64,
        mlp_ratio=4.0, num_heads=4, depth=2, depth_single_blocks=2,
        axes_dim=[4, 6, 6], theta=10000, qkv_bias=True,
        guidance_embed=True)
    ref = ref_flux.Flux(params_ref).eval()

    img = torch.randn(1, hh * ww, 8)
    txt = torch.randn(1, 6, 16)
    y = torch.randn(1, 12)
    t = torch.tensor([0.5])
    g = torch.tensor([4.0])
    img_ids = torch.zeros(1, hh * ww, 3)
    img_ids[..., 1] = torch.arange(hh).repeat_interleave(ww)
    img_ids[..., 2] = torch.arange(ww).repeat(hh)
    txt_ids = torch.zeros(1, 6, 3)
    gen = torch.Generator().manual_seed(123)
    with torch.no_grad():
        for p_ in ref.parameters():
            p_.add_(torch.randn(p_.shape, generator=gen) * 0.02)
    with torch.no_grad():
        out_ref = ref(img, img_ids, txt, txt_ids, t, y, g).numpy()
    assert float(np.std(out_ref)) > 1e-3

    ours = FluxModel(in_channels=8, dim=64, heads=4, double_blocks=2,
                     single_blocks=2, text_dim=16, pooled_dim=12,
                     guidance_embed=True, rope_dims=(4, 6, 6))
    xj = jnp.asarray(img.numpy()).reshape(1, hh, ww, 8)
    args = (xj, jnp.asarray([0.5]), jnp.asarray(txt.numpy()),
            jnp.asarray(y.numpy()), jnp.asarray([4.0]))
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = preprocess_split_fused_qkv(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        r"(img|txt)_attn\.qkv")
    tree = flux_map(heads=4).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:10]

    out = ours.apply({"params": tree}, *args)
    np.testing.assert_allclose(
        np.asarray(out).reshape(1, hh * ww, 8), out_ref,
        atol=5e-4, rtol=2e-3)
