"""Swin (Tag2Text visual encoder) whole-model conversion parity vs the
imported reference torch module
(/root/reference/eval/vbench/third_party/tag2Text/swin_transformer.py).

Random-initialized reference weights (incl. the zero-init relative
position bias tables, perturbed so the bias path is non-vacuous).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SWIN_FILE = Path("/root/reference/eval/vbench/third_party/tag2Text/"
                 "swin_transformer.py")

pytestmark = pytest.mark.skipif(not SWIN_FILE.exists(),
                                reason="reference tag2Text unavailable")


def _stub(name: str, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_swin():
    class _DropPath(torch.nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0.0, std)
        return t

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_DropPath, to_2tuple=to_2tuple,
          trunc_normal_=trunc_normal_)
    spec = importlib.util.spec_from_file_location("ref_swin", SWIN_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_swin"] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model.eval()


def _run_parity(ref_swin, img_size, window, embed_dim, depths, heads,
                seed):
    from videotuna_tpu.evalkit.swin import (SwinTransformer,
                                            convert_swin_state_dict)
    ref = ref_swin.SwinTransformer(
        img_size=img_size, patch_size=4, in_chans=3, embed_dim=embed_dim,
        depths=list(depths), num_heads=list(heads), window_size=window,
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, drop_path_rate=0.0,
        ape=False, patch_norm=True, use_checkpoint=False)
    _randomize(ref, seed)
    params = convert_swin_state_dict(ref.state_dict(), depths=depths,
                                     heads=heads)
    model = SwinTransformer(img_size=img_size, embed_dim=embed_dim,
                            depths=depths, heads=heads, window=window)
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((2, img_size, img_size, 3)) \
        .astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, img))
    assert got.shape == want.shape
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err


def test_swin_small_parity_shifted_windows(ref_swin):
    # res 32→16→8→4: shifts active in stages 0-2, full-window stage 3
    _run_parity(ref_swin, img_size=128, window=4, embed_dim=16,
                depths=(2, 2, 2, 2), heads=(2, 4, 8, 16), seed=0)


def test_swin_b384_geometry_parity(ref_swin):
    # the real Tag2Text config at reduced depth (full width, window 12,
    # real 96→48→24→12 resolution ladder)
    _run_parity(ref_swin, img_size=384, window=12, embed_dim=128,
                depths=(2, 2, 2, 2), heads=(4, 8, 16, 32), seed=1)
