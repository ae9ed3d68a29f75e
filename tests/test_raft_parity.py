"""RAFT whole-model conversion parity vs the imported reference torch
module (/root/reference/eval/vbench/third_party/RAFT/core/raft.py).

All reference parameters are randomly initialized (kaiming convs) and the
batch-norm running stats are perturbed so the comparison is non-vacuous.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

RAFT_CORE = Path("/root/reference/eval/vbench/third_party/RAFT/core")

pytestmark = pytest.mark.skipif(not RAFT_CORE.exists(),
                                reason="reference RAFT unavailable")


def _make_pkg(name, path):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [str(path)]
        sys.modules[name] = m
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_raft_module():
    _make_pkg("refraftcore", RAFT_CORE)
    _make_pkg("refraftcore.utils_core", RAFT_CORE / "utils_core")
    for sub in ("utils_core.utils", "corr", "extractor", "update", "raft"):
        name = f"refraftcore.{sub}"
        if name in sys.modules:
            continue
        file = RAFT_CORE / (sub.replace(".", "/") + ".py")
        spec = importlib.util.spec_from_file_location(name, file)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refraftcore.raft"]


class _Args(dict):
    """args object with attribute access + `in` (the reference uses both)."""
    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


@pytest.fixture(scope="module")
def ref_model(ref_raft_module):
    torch.manual_seed(0)
    args = _Args(small=False, mixed_precision=False, alternate_corr=False,
                 dropout=0)
    model = ref_raft_module.RAFT(args)
    # perturb batch-norm running stats away from the (0,1) defaults so BN
    # conversion is actually exercised
    g = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) * 0.5 + 0.75)
    model.eval()
    return model


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(3)
    # structured content so flow iterations do something: shifted noise.
    # ≥128px so the coarsest correlation-pyramid level is ≥2px — the
    # reference's bilinear_sampler divides by (W−1) and NaNs on 1×1
    # levels (real VBench inputs are ≥256px, so that path never runs).
    base = rng.uniform(0, 255, (128, 160, 3)).astype(np.float32)
    img1 = base
    img2 = np.roll(base, shift=(2, 3), axis=(0, 1))
    return img1[None], img2[None]


ITERS = 6  # keep the CPU test fast; iteration math is identical per step


class TestRaftParity:
    def test_whole_model_flow_parity(self, ref_model, frames):
        import jax
        from videotuna_tpu.evalkit.raft import RAFT, convert_raft_state_dict
        img1, img2 = frames
        with torch.no_grad():
            t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
            t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
            _, ref_flow = ref_model(t1, t2, iters=ITERS, test_mode=True)
        ref_flow = ref_flow.permute(0, 2, 3, 1).numpy()

        params = convert_raft_state_dict(
            {k: v.numpy() for k, v in ref_model.state_dict().items()})
        model = RAFT(iters=ITERS)
        # shape gate: converted tree must exactly match a fresh init
        from videotuna_tpu.tools.convert_weights import verify_tree_shapes
        init = model.init(jax.random.key(0), img1, img2)["params"]
        problems = verify_tree_shapes(params, init)
        assert not problems, problems[:10]

        got = np.asarray(model.apply({"params": params}, img1, img2))
        assert got.shape == ref_flow.shape
        scale = np.maximum(np.abs(ref_flow).max(), 1e-3)
        err = np.abs(got - ref_flow).max() / scale
        assert err < 5e-3, f"rel-max-err {err}"

    def test_bilinear_sampler_matches_grid_sample(self):
        import jax.numpy as jnp
        import torch.nn.functional as F
        from videotuna_tpu.evalkit.raft import bilinear_sampler
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
        # coords include in-range, boundary, and out-of-range points
        coords = rng.uniform(-2, 13, size=(2, 5, 7, 2)).astype(np.float32)
        got = np.asarray(bilinear_sampler(jnp.asarray(img),
                                          jnp.asarray(coords)))
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        x = torch.from_numpy(coords[..., 0])
        y = torch.from_numpy(coords[..., 1])
        H, W = 9, 11
        grid = torch.stack([2 * x / (W - 1) - 1, 2 * y / (H - 1) - 1], -1)
        want = F.grid_sample(timg, grid, align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_pad_to_8_matches_input_padder(self, ref_raft_module):
        from videotuna_tpu.evalkit.raft import pad_to_8, unpad
        import jax.numpy as jnp
        utils = sys.modules["refraftcore.utils_core.utils"]
        rng = np.random.default_rng(1)
        img = rng.normal(size=(1, 67, 93, 3)).astype(np.float32)
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        padder = utils.InputPadder(timg.shape)
        (ref_padded,) = padder.pad(timg)
        got, pads = pad_to_8(jnp.asarray(img))
        np.testing.assert_allclose(
            np.asarray(got), ref_padded.permute(0, 2, 3, 1).numpy(),
            atol=1e-6)
        back = unpad(got, pads)
        np.testing.assert_allclose(np.asarray(back), img, atol=1e-6)
