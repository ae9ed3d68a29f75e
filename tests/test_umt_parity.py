"""UMT (VideoMAE ViT) whole-model conversion parity vs the imported
reference torch module
(/root/reference/eval/vbench/third_party/umt/models/modeling_finetune.py)
plus the exact sinusoid-position-table semantics (8-frame checkpoint
table linearly interpolated in time).

All reference parameters are randomly initialized; the head (init-scaled
to ~0 by the reference) is perturbed so the logits are non-vacuous.
"""

import importlib.util
import sys
import types
from functools import partial
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

UMT_FILE = Path("/root/reference/eval/vbench/third_party/umt/models/"
                "modeling_finetune.py")

pytestmark = pytest.mark.skipif(not UMT_FILE.exists(),
                                reason="reference UMT unavailable")


def _stub(name: str, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_umt():
    def drop_path(x, p=0.0, training=False):
        return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0.0, std)
        return t

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", drop_path=drop_path, to_2tuple=to_2tuple,
          trunc_normal_=trunc_normal_)
    _stub("timm.models.registry", register_model=lambda f: f)
    spec = importlib.util.spec_from_file_location("ref_umt_finetune",
                                                  UMT_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_umt_finetune"] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name == "pos_embed":
                # the interpolated sinusoid table registers as a
                # Parameter in these geometries; it is structural (the
                # conversion regenerates it), so keep its value
                continue
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model.eval()


def test_sinusoid_table_parity(ref_umt):
    from videotuna_tpu.evalkit.umt import sinusoid_pos_embed
    for num_patches, cur_frame, pre_n in ((3136, 16, 1568), (1568, 8, 1568),
                                          (16, 4, 1568)):
        want = ref_umt.get_sinusoid_encoding_table(
            num_patches, 64, cur_frame, pre_n_position=pre_n)
        if isinstance(want, torch.nn.Parameter):
            want = want.data
        got = sinusoid_pos_embed(16 if num_patches == 16 else num_patches,
                                 64, cur_frame, pre_n_position=pre_n)
        want = want.numpy()[:, :got.shape[1]]
        err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
        assert err < 1e-5, (num_patches, cur_frame, err)


def test_umt_whole_model_parity(ref_umt):
    from videotuna_tpu.evalkit.umt import UMTViT, convert_umt_state_dict
    ref = ref_umt.VisionTransformer(
        img_size=32, patch_size=16, num_classes=10, embed_dim=48, depth=2,
        num_heads=4, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        all_frames=4, tubelet_size=1, use_mean_pooling=True)
    _randomize(ref, seed=0)
    params = convert_umt_state_dict(ref.state_dict(), depth=2, heads=4)
    model = UMTViT(dim=48, depth=2, heads=4, patch=16, tubelet=1,
                   num_classes=10, num_frames=4)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(
            video.transpose(0, 4, 1, 2, 3))).numpy()
    got = np.asarray(model.apply({"params": params}, video))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err


def test_umt_full_geometry_parity(ref_umt):
    """One pass at the real ViT-L/16 K400 geometry (16×224², 24 layers
    is too heavy for CI — use 3 layers at full width/resolution, which
    exercises the real token count and pos-table path)."""
    from videotuna_tpu.evalkit.umt import UMTViT, convert_umt_state_dict
    ref = ref_umt.VisionTransformer(
        img_size=224, patch_size=16, num_classes=400, embed_dim=1024,
        depth=3, num_heads=16, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        all_frames=16, tubelet_size=1, use_mean_pooling=True)
    _randomize(ref, seed=1)
    params = convert_umt_state_dict(ref.state_dict(), depth=3, heads=16)
    model = UMTViT(depth=3, num_frames=16)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 16, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(
            video.transpose(0, 4, 1, 2, 3))).numpy()
    got = np.asarray(model.apply({"params": params}, video))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err


def test_action_protocol():
    from videotuna_tpu.evalkit.umt import (parse_action_label,
                                           preprocess_video_umt)
    assert parse_action_label(
        "a person is archery-0.mp4") == "archery"
    assert parse_action_label(
        "/x/y/A person is riding a bike-3.mp4") == "riding a bike"
    rng = np.random.default_rng(0)
    v = rng.integers(0, 255, (40, 270, 480, 3)).astype(np.uint8)
    out = preprocess_video_umt(v)
    assert out.shape == (1, 16, 224, 224, 3)
    assert abs(float(out.mean())) < 1.5
