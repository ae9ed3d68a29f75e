"""ViCLIP whole-model conversion parity vs the imported reference torch
modules (/root/reference/eval/vbench/third_party/ViCLIP/viclip_vision.py
clip_joint_l14, viclip_text.py clip_text_l14) plus exact-BPE tokenizer
parity vs the reference SimpleTokenizer.

All reference parameters are randomly initialized (the towers have no
zero-init layers, but we still perturb the zero-init temporal positional
embedding so the temporal path is non-vacuous).
"""

import importlib.util
import shutil
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

VICLIP_DIR = Path("/root/reference/eval/vbench/third_party/ViCLIP")
BPE_ASSET = Path(
    "/root/reference/tools/data_process/caption/llava/model/"
    "multimodal_encoder/dev_eva_clip/eva_clip/"
    "bpe_simple_vocab_16e6.txt.gz")

pytestmark = pytest.mark.skipif(
    not (VICLIP_DIR.exists() and BPE_ASSET.exists()),
    reason="reference ViCLIP unavailable")


def _stub(name: str, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    # the reference tokenizer default-arg downloads to CACHE_DIR at module
    # exec time; pre-seed the asset so no network is attempted
    cache = tmp_path_factory.mktemp("viclip_cache")
    (cache / "ViCLIP").mkdir()
    shutil.copy(BPE_ASSET, cache / "ViCLIP" / "bpe_simple_vocab_16e6.txt.gz")
    _stub("ftfy", fix_text=lambda t: t)
    _stub("vbench")
    _stub("vbench.utils", CACHE_DIR=str(cache))
    import packaging
    _stub("pkg_resources", packaging=packaging)

    class _DropPath(torch.nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=_DropPath)
    _stub("timm.models.registry", register_model=lambda f: f)

    pkg = types.ModuleType("refviclip")
    pkg.__path__ = [str(VICLIP_DIR)]
    sys.modules["refviclip"] = pkg
    mods = {}
    for sub in ("simple_tokenizer", "viclip_text", "viclip_vision"):
        name = f"refviclip.{sub}"
        if name not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                name, VICLIP_DIR / f"{sub}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        mods[sub] = sys.modules[name]
    return mods


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
    return module.eval()


def _combined_state_dict(vis, txt):
    sd = {f"vision_encoder.{k}": v for k, v in vis.state_dict().items()}
    sd.update({f"text_encoder.{k}": v
               for k, v in txt.state_dict().items()
               if not k.startswith("_tokenizer")})
    sd["temp"] = torch.ones(())
    # attn_mask buffers are structural, not weights
    return {k: v for k, v in sd.items() if "attn_mask" not in k}


def test_tokenizer_exact_parity(ref_modules):
    ref = ref_modules["simple_tokenizer"].SimpleTokenizer(
        bpe_path=str(BPE_ASSET))
    from videotuna_tpu.evalkit.clip_bpe import ClipBPE
    mine = ClipBPE(str(BPE_ASSET))
    prompts = [
        "a person is surfing on a huge wave",
        "In the style of Van Gogh, a starry night over the city.",
        "Close-up, 4K  HDR!  a   cat &amp; dog playing -- 100%",
        "the quick brown fox jumps over 12 lazy dogs' tails",
        "café naïve jalapeño",
    ]
    for p in prompts:
        assert ref.encode(p) == mine.encode(p), p
    assert mine.sot_id == ref.encoder["<|startoftext|>"]
    assert mine.eot_id == ref.encoder["<|endoftext|>"]


def test_text_tower_whole_model_parity(ref_modules):
    from videotuna_tpu.evalkit.viclip import (ViCLIPText,
                                              convert_viclip_state_dict,
                                              clip_bpe_tokenize)
    vt = ref_modules["viclip_text"]
    ref = _randomize(vt.clip_text_l14(context_length=32, pretrained=False),
                     seed=1)
    vis = ref_modules["viclip_vision"].VisionTransformer(
        input_resolution=28, patch_size=14, width=32, layers=1, heads=2,
        output_dim=16, num_frames=2)
    _, text_params = convert_viclip_state_dict(
        _combined_state_dict(vis, ref),
        vision_layers=1, vision_heads=2)
    ids = clip_bpe_tokenize(
        ["a cat playing piano in the rain",
         "cinematic drone shot of a mountain lake"],
        str(BPE_ASSET), 32)
    with torch.no_grad():
        want = ref(torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(ViCLIPText().apply({"params": text_params}, ids))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err


def test_vision_tower_whole_model_parity(ref_modules):
    from videotuna_tpu.evalkit.viclip import (ViCLIPVision,
                                              convert_viclip_state_dict)
    vv = ref_modules["viclip_vision"]
    ref = _randomize(vv.VisionTransformer(
        input_resolution=56, patch_size=14, width=64, layers=3, heads=4,
        output_dim=32, num_frames=4), seed=2)
    # temporal pos-embed is zero-init in the reference → perturb so the
    # frame-mixing path is actually tested
    with torch.no_grad():
        ref.temporal_positional_embedding.copy_(
            torch.randn(ref.temporal_positional_embedding.shape,
                        generator=torch.Generator().manual_seed(3)) * 0.1)
    txt = _randomize(ref_modules["viclip_text"].clip_text_l14(
        context_length=32, transformer_width=24, transformer_heads=2,
        transformer_layers=1, embed_dim=8, pretrained=False), seed=4)
    vision_params, _ = convert_viclip_state_dict(
        _combined_state_dict(ref, txt),
        vision_layers=3, vision_heads=4, text_layers=1, text_heads=2)
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 4, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        # reference eats (B, C, T, H, W)
        want = ref(torch.from_numpy(
            video.transpose(0, 4, 1, 2, 3))).numpy()
    model = ViCLIPVision(width=64, layers=3, heads=4, output_dim=32,
                         num_frames=4)
    got = np.asarray(model.apply({"params": vision_params}, video))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err


def test_vision_full_geometry_parity(ref_modules):
    """One pass at the real ViT-L/14 geometry (8×224², 24 layers)."""
    from videotuna_tpu.evalkit.viclip import (ViCLIPVision,
                                              convert_viclip_state_dict)
    vv = ref_modules["viclip_vision"]
    ref = _randomize(vv.clip_joint_l14(pretrained=False), seed=5)
    with torch.no_grad():
        ref.temporal_positional_embedding.copy_(
            torch.randn(ref.temporal_positional_embedding.shape,
                        generator=torch.Generator().manual_seed(6)) * 0.05)
    txt = _randomize(ref_modules["viclip_text"].clip_text_l14(
        context_length=32, transformer_width=24, transformer_heads=2,
        transformer_layers=1, embed_dim=8, pretrained=False), seed=7)
    vision_params, _ = convert_viclip_state_dict(
        _combined_state_dict(ref, txt), text_layers=1, text_heads=2)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 8, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(
            video.transpose(0, 4, 1, 2, 3))).numpy()
    got = np.asarray(ViCLIPVision().apply({"params": vision_params},
                                          video))
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-8)
    assert err < 5e-3, err
