"""WHOLE-MODEL StepVideo DiT parity vs the imported reference module.

Loads /root/reference/videotuna/models/stepvideo/stepvideo/modules/model.py
(the module the released pipeline instantiates, stepvideo/__init__.py:7)
with a functional diffusers-config shim and an identity ``with_empty_init``
(so standard torch init runs), converts its random-init state dict through
tools/convert_weights.stepvideo_map, and asserts forward parity — including
the CLIP branch (encoder_hidden_states_2) and a ragged caption attention
mask.
"""

import importlib.util
import inspect
import sys
import types
from functools import wraps

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

STEP_DIR = "/root/reference/videotuna/models/stepvideo/stepvideo"


def _functional_register_to_config(init):
    """diffusers' decorator semantics the reference model relies on:
    bind init args (with defaults) into ``self.config`` BEFORE running the
    body (model.py:760 reads self.config.num_attention_heads inside
    __init__)."""
    @wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self.config = types.SimpleNamespace(**cfg)
        init(self, *args, **kwargs)
    return wrapper


def _make_pkg(name, path):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_step():
    import torch.nn as tnn

    # diffusers shim (may already exist from other parity tests — always
    # override register_to_config with the functional version, which is a
    # strict superset of the pass-through behavior)
    d = sys.modules.setdefault("diffusers", types.ModuleType("diffusers"))
    cu = sys.modules.setdefault(
        "diffusers.configuration_utils",
        types.ModuleType("diffusers.configuration_utils"))
    cu.ConfigMixin = getattr(cu, "ConfigMixin", object)
    cu.register_to_config = _functional_register_to_config
    dm = sys.modules.setdefault("diffusers.models",
                                types.ModuleType("diffusers.models"))
    mu = sys.modules.setdefault(
        "diffusers.models.modeling_utils",
        types.ModuleType("diffusers.models.modeling_utils"))
    mu.ModelMixin = tnn.Module
    dm.modeling_utils = mu
    d.configuration_utils = cu
    d.models = dm

    _make_pkg("refstep", STEP_DIR)
    _make_pkg("refstep.modules", f"{STEP_DIR}/modules")
    # identity with_empty_init: the real one skips torch init (meta-style);
    # we WANT standard init so the parity comparison is non-vacuous
    utils = types.ModuleType("refstep.utils")
    utils.with_empty_init = lambda f: f
    sys.modules["refstep.utils"] = utils

    spec = importlib.util.spec_from_file_location(
        "refstep.modules.model", f"{STEP_DIR}/modules/model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refstep.modules.model"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stepvideo_whole_model_parity(ref_step):
    from videotuna_tpu.models.stepvideo.dit import StepVideoModel
    from videotuna_tpu.tools.convert_weights import (
        preprocess_split_headwise, stepvideo_map, verify_tree_shapes)

    torch.manual_seed(0)
    heads, hd = 2, 128            # head_dim MUST be 128: the reference
    dim = heads * hd              # hardcodes rope_ch_split=[64,32,32]
    ref = ref_step.StepVideoModel(
        num_attention_heads=heads, attention_head_dim=hd,
        in_channels=8, out_channels=8, num_layers=2, patch_size=1,
        caption_channels=[32, 16]).eval()

    b, f, h, w = 2, 2, 4, 4
    x = torch.randn(b, f, 8, h, w)
    t = torch.tensor([0.5, 0.7])           # reference rescales ×1000
    cap = torch.randn(b, 6, 32)            # StepLLM states
    clip = torch.randn(b, 3, 16)           # CLIP states (concat'd first)
    # attention mask over the CONCATENATED context (3 clip + 6 caption);
    # second sample has 2 caption tokens masked out
    enc_mask = torch.tensor([[1] * 9, [1] * 7 + [0] * 2])
    with torch.no_grad():
        out_ref = ref(x, encoder_hidden_states=cap,
                      encoder_hidden_states_2=clip, timestep=t,
                      encoder_attention_mask=enc_mask,
                      return_dict=False).numpy()
    assert float(np.std(out_ref)) > 1e-3   # non-vacuous

    ours = StepVideoModel(in_channels=8, out_channels=8, dim=dim,
                          ffn_dim=4 * dim, num_layers=2, heads=heads,
                          text_dim=32, clip_dim=16)
    xj = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))  # b f c h w → bfhwc
    cap_mask = jnp.asarray(enc_mask[:, 3:].numpy()).astype(bool)
    args = (xj, jnp.asarray(t.numpy()) * 1000.0, jnp.asarray(cap.numpy()),
            jnp.asarray(clip.numpy()), cap_mask)
    init = ours.init(jax.random.key(0), *args)["params"]

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd = preprocess_split_headwise(sd, r"attn1\.wqkv", "wqkv",
                                   ("wq", "wk", "wv"), heads=heads)
    sd = preprocess_split_headwise(sd, r"attn2\.wkv", "wkv",
                                   ("wk", "wv"), heads=heads)
    tree = stepvideo_map(heads=heads).convert(sd, strict=True)
    assert not verify_tree_shapes(tree, init), \
        verify_tree_shapes(tree, init)[:10]

    out = ours.apply({"params": tree}, *args)
    out_np = np.asarray(out).transpose(0, 1, 4, 2, 3)     # bfhwc → b f c h w
    np.testing.assert_allclose(out_np, out_ref, atol=5e-4, rtol=2e-3)

    # the mask must matter: full-visibility output differs for sample 2
    full = ours.apply({"params": tree}, *args[:-1],
                      jnp.ones_like(cap_mask))
    assert float(jnp.abs(full[1] - out[1]).max()) > 1e-5


def test_stepvideo_scan_matches_loop(ref_step):
    """scan_blocks=True (stacked params) reproduces the per-block loop."""
    from videotuna_tpu.models.stepvideo.dit import StepVideoModel
    from videotuna_tpu.tools.convert_weights import stack_blocks_for_scan

    heads, hd = 2, 128
    dim = heads * hd
    kw = dict(in_channels=8, out_channels=8, dim=dim, ffn_dim=4 * dim,
              num_layers=2, heads=heads, text_dim=32, clip_dim=16)
    loop = StepVideoModel(**kw)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 4, 4, 8),
                    jnp.float32)
    t = jnp.asarray([500.0])
    cap = jnp.asarray(np.random.RandomState(1).randn(1, 6, 32), jnp.float32)
    params = loop.init(jax.random.key(0), x, t, cap)["params"]
    out_loop = loop.apply({"params": params}, x, t, cap)

    scanned = StepVideoModel(**kw, scan_blocks=True)
    stacked = stack_blocks_for_scan(params)
    out_scan = scanned.apply({"params": stacked}, x, t, cap)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               atol=1e-5, rtol=1e-5)


def test_stepvideo_flow_dual_encoder_inference(tmp_path):
    """StepVideoFlow end-to-end with BOTH text towers (reference
    encode_prompt: Step-1 LLM + HunyuanClip, clip states concatenated
    before caption tokens inside the model) through the unified
    inference() to an mp4."""
    from videotuna_tpu.flows.stepvideo import StepVideoFlow

    flow = StepVideoFlow(
        denoiser_config={
            "target": "videotuna_tpu.models.stepvideo.StepVideoModel",
            "params": dict(in_channels=8, out_channels=8, dim=64,
                           ffn_dim=128, num_layers=2, heads=2,
                           text_dim=16, clip_dim=12)},
        scheduler_config={
            "target": "videotuna_tpu.schedulers.FlowMatchSchedule",
            "params": dict(num_steps=3, shift=3.0)},
        first_stage_config={
            "target": "videotuna_tpu.models.CausalVAE3D",
            "params": dict(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                           z_channels=8, embed_dim=8)},
        cond_stage_config={
            "target": "videotuna_tpu.models.StepLLMEncoder",
            "params": dict(vocab_size=30002, dim=16, heads=2, groups=1,
                           num_layers=1)},
        cond_stage_2_config={
            "target": "videotuna_tpu.models.CLIPTextEncoder",
            "params": dict(vocab_size=30002, dim=12, heads=2,
                           num_layers=1, max_len=8)},
        num_inference_steps=3, model_max_length=8)
    # tiny geometry: align the flow's latent contract with the tiny VAE
    flow.latent_channels = 8
    flow.vae_spatial_ratio = 2
    flow.vae_temporal_ratio = 2
    flow.init_params(seed=0)

    cond = flow.encode_text(flow.params, ["a cat"])
    assert "y2" in cond and cond["y2"].shape[-1] == 12
    assert cond["y_mask"] is not None

    cfg = {"inference": {"savedir": str(tmp_path), "prompt": "a cat",
                         "bs": 1, "height": 16, "width": 16, "frames": 4,
                         "seed": 1, "unconditional_guidance_scale": 2.0}}
    result = flow.inference(cfg)
    assert len(result["videos"]) == 1
    import os
    assert os.path.exists(result["videos"][0])
