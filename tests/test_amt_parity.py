"""AMT-S whole-model conversion parity vs the imported reference torch
module (/root/reference/eval/vbench/third_party/amt/networks/AMT-S.py) —
the VBench motion_smoothness backbone."""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

AMT_ROOT = Path("/root/reference/eval/vbench/third_party/amt")

pytestmark = pytest.mark.skipif(not AMT_ROOT.exists(),
                                reason="reference AMT unavailable")


def _make_pkg(name, path):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = [str(path)]
        sys.modules[name] = m
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_amt_module():
    # the reference uses absolute `vbench.third_party.amt...` imports
    ref_eval = Path("/root/reference/eval")
    _make_pkg("vbench", ref_eval / "vbench")
    _make_pkg("vbench.third_party", ref_eval / "vbench/third_party")
    _make_pkg("vbench.third_party.amt", AMT_ROOT)
    _make_pkg("vbench.third_party.amt.utils", AMT_ROOT / "utils")
    _make_pkg("vbench.third_party.amt.networks", AMT_ROOT / "networks")
    _make_pkg("vbench.third_party.amt.networks.blocks",
              AMT_ROOT / "networks/blocks")
    for sub, file in [
        ("vbench.third_party.amt.utils.flow_utils",
         AMT_ROOT / "utils/flow_utils.py"),
        ("vbench.third_party.amt.networks.blocks.feat_enc",
         AMT_ROOT / "networks/blocks/feat_enc.py"),
        ("vbench.third_party.amt.networks.blocks.ifrnet",
         AMT_ROOT / "networks/blocks/ifrnet.py"),
        ("vbench.third_party.amt.networks.blocks.multi_flow",
         AMT_ROOT / "networks/blocks/multi_flow.py"),
        ("vbench.third_party.amt.networks.blocks.raft",
         AMT_ROOT / "networks/blocks/raft.py"),
        ("vbench.third_party.amt.networks.amts",
         AMT_ROOT / "networks/AMT-S.py"),
    ]:
        if sub in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(sub, file)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[sub] = mod
        spec.loader.exec_module(mod)
    return sys.modules["vbench.third_party.amt.networks.amts"]


@pytest.fixture(scope="module")
def ref_model(ref_amt_module):
    torch.manual_seed(0)
    model = ref_amt_module.Model(corr_radius=3, corr_lvls=4, num_flows=3)
    model.eval()
    return model


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    # ≥128 px so the coarsest correlation level is ≥2 px (same /0 quirk
    # as RAFT's bilinear_sampler); divisible by 16 per the protocol
    base = rng.uniform(0, 1, (1, 128, 160, 3)).astype(np.float32)
    img0 = base
    img1 = np.roll(base, shift=(3, -2), axis=(1, 2))
    return img0, img1


class TestAMTParity:
    def test_whole_model_interp_parity(self, ref_model, frames):
        import jax
        from videotuna_tpu.evalkit.amt import AMT_S, convert_amt_state_dict
        from videotuna_tpu.tools.convert_weights import verify_tree_shapes
        img0, img1 = frames
        t0 = torch.from_numpy(img0).permute(0, 3, 1, 2)
        t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        embt = torch.full((1, 1, 1, 1), 0.5)
        with torch.no_grad():
            ref = ref_model(t0, t1, embt, eval=True)["imgt_pred"]
        ref = ref.permute(0, 2, 3, 1).numpy()

        params = convert_amt_state_dict(
            {k: v.numpy() for k, v in ref_model.state_dict().items()})
        model = AMT_S()
        init = model.init(jax.random.key(0), img0, img1,
                          np.full((1,), 0.5, np.float32))["params"]
        problems = verify_tree_shapes(params, init)
        assert not problems, problems[:10]

        got = np.asarray(model.apply({"params": params}, img0, img1,
                                     np.full((1,), 0.5, np.float32)))
        assert got.shape == ref.shape
        err = np.abs(got - ref).max()
        assert err < 5e-3, f"abs-max-err {err}"

    def test_warp_matches_grid_sample(self):
        import jax.numpy as jnp
        import torch.nn.functional as F
        from videotuna_tpu.evalkit.amt import warp
        rng = np.random.default_rng(0)
        img = rng.normal(size=(2, 10, 12, 3)).astype(np.float32)
        flow = (rng.normal(size=(2, 10, 12, 2)) * 4).astype(np.float32)
        got = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))
        # reference warp (flow_utils.py:9-29)
        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
        B, _, H, W = tflow.shape
        xx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, -1, H, -1)
        yy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, -1, -1, W)
        grid = torch.cat([xx, yy], 1)
        flow_ = torch.cat([tflow[:, 0:1] / ((W - 1) / 2),
                           tflow[:, 1:2] / ((H - 1) / 2)], 1)
        want = F.grid_sample((timg), (grid + flow_).permute(0, 2, 3, 1),
                             mode="bilinear", padding_mode="border",
                             align_corners=True)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_resize_matches_interpolate(self):
        import jax.numpy as jnp
        import torch.nn.functional as F
        from videotuna_tpu.evalkit.amt import resize_bilinear
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 8, 12, 4)).astype(np.float32)
        for sf in (2.0, 0.5):
            got = np.asarray(resize_bilinear(jnp.asarray(x), sf))
            want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                                 scale_factor=sf, mode="bilinear",
                                 align_corners=False)
            want = want.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    def test_conv_transpose_matches_torch(self):
        import jax
        import jax.numpy as jnp
        from videotuna_tpu.evalkit.amt import TorchConvTranspose
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 6, 7, 5)).astype(np.float32)
        tconv = torch.nn.ConvTranspose2d(5, 8, 4, 2, 1, bias=True)
        with torch.no_grad():
            want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).detach().numpy()
        w = tconv.weight.detach().numpy()
        kern = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
        params = {"kernel": jnp.asarray(kern),
                  "bias": jnp.asarray(tconv.bias.detach().numpy())}
        mod = TorchConvTranspose(8)
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_motion_smoothness_protocol_runs(self, ref_model):
        """Protocol smoke: faithful scorer over converted weights."""
        from videotuna_tpu.evalkit.amt import (convert_amt_state_dict,
                                               motion_smoothness_score)
        params = convert_amt_state_dict(
            {k: v.numpy() for k, v in ref_model.state_dict().items()})
        rng = np.random.default_rng(3)
        video = rng.uniform(-1, 1, (6, 128, 128, 3)).astype(np.float32)
        score = motion_smoothness_score(video, params)
        assert 0.0 <= score <= 1.0
