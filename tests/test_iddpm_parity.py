"""SpacedDiffusion / IDDPM sampler parity vs the imported reference.

Loads the reference iddpm3d.py (/root/reference/videotuna/models/opensora/
models/iddpm3d.py) with dependency shims and gates, step by step along a
deterministic respaced trajectory:

- ``space_timesteps`` (iddpm3d.py:816) equality,
- the SpacedDiffusion respaced-beta computation (iddpm3d.py:888-896),
- ``IDDPMScheduler.p_mean_variance`` (iddpm3d.py:346: LEARNED_RANGE
  log-variance interpolation, eps → x0 (clipped) → posterior mean),
- the ``_WrappedModel`` spaced→original timestep mapping (iddpm3d.py:934),
- the ancestral sample formula (p_sample, iddpm3d.py:262).

Randomness is injected: the same numpy ε drives both sides each step, so
the comparison is exact trajectory parity, not distributional.
(VERDICT r3 Missing #2.)"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/videotuna"
IDDPM3D = f"{REF}/models/opensora/models/iddpm3d.py"


def _stub_all():
    from tests.test_ddim_parity import _stub_pl_and_common
    _stub_pl_and_common()
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    # iddpm3d imports DDPMFlow from the (heavy, Lightning) ddpm3d module —
    # the classes under test never touch it, so stub the symbol
    if "videotuna.models.lvdm.ddpm3d" not in sys.modules:
        dd = types.ModuleType("videotuna.models.lvdm.ddpm3d")

        class DDPMFlow:   # placeholder base; IDDPM itself is not driven
            def __init__(self, *a, **k):
                pass

        dd.DDPMFlow = DDPMFlow
        sys.modules["videotuna.models.lvdm.ddpm3d"] = dd


def _load(name, file):
    if name in sys.modules and getattr(sys.modules[name], "__file__", None):
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _ref_iddpm():
    _stub_all()
    from tests.test_ddim_parity import _ref_modules
    _ref_modules()   # diffusion_schedulers + ddim under videotuna.*
    _load("videotuna.utils.distributions", f"{REF}/utils/distributions.py")
    # mean_flat pulls nothing heavy; iddpm3d's module-level imports are now
    # all resolvable
    return _load("videotuna.models.opensora.models.iddpm3d", IDDPM3D)


SHAPE_T = (1, 4, 2, 6, 6)    # torch layout (B, C, T, H, W)


def _w():
    rng = np.random.default_rng(5)
    return rng.standard_normal((6, 6)).astype(np.float32) * 0.3


def _oracle_np(x_np, t_orig_np):
    """Shared oracle evaluated in numpy: eps channels from a fixed linear
    map; variance channels a bounded function of x (exercises the
    LEARNED_RANGE interpolation). x: (B, C, T, H, W)."""
    w = _w()
    tt = (t_orig_np.astype(np.float32) / 1000.0).reshape(-1, 1, 1, 1, 1)
    eps = np.tanh(x_np @ w) * (1.0 + 0.2 * tt)
    var_v = np.tanh(x_np[:, ::-1].copy() @ w.T)
    return np.concatenate([eps, var_v], axis=1).astype(np.float32)


def test_space_timesteps_matches_reference():
    mod = _ref_iddpm()
    from videotuna_tpu.schedulers.iddpm import space_timesteps
    for spec in ["100", "50", "ddim25", "10,15,20"]:
        ref = sorted(mod.space_timesteps(1000, spec))
        ours = space_timesteps(1000, spec)
        assert ours == ref, f"space_timesteps({spec}) diverges"


def test_spaced_betas_match_reference():
    """Respaced betas: reference SpacedDiffusion.__init__ computation
    (iddpm3d.py:888-896) over its own IDDPMScheduler alphas_cumprod."""
    mod = _ref_iddpm()
    # the opensora config path computes betas with the LDM sqrt-linear
    # make_beta_schedule (diffusion_utils; DDPMFlow feeds them to
    # SpacedDiffusion as given_betas) — NOT the legacy named schedule
    du = sys.modules["videotuna.utils.diffusion_utils"]
    betas_full = du.make_beta_schedule("linear", 1000, linear_start=1e-4,
                                       linear_end=2e-2)
    betas_full = np.asarray(betas_full, np.float64)
    sched_full = mod.IDDPMScheduler(given_betas=betas_full.tolist(),
                                    timesteps=1000)
    use = mod.space_timesteps(1000, "50")
    last, new_betas = 1.0, []
    for i, ac in enumerate(sched_full.alphas_cumprod.numpy()):
        if i in use:
            new_betas.append(1.0 - ac / last)
            last = ac
    from videotuna_tpu.schedulers.iddpm import SpacedSchedule
    ours = SpacedSchedule.create(1000, "50", beta_schedule="linear",
                                 linear_start=1e-4, linear_end=2e-2)
    np.testing.assert_allclose(np.asarray(ours.base.betas),
                               np.asarray(new_betas, np.float32),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("spec", ["25", "ddim25"])
def test_spaced_learned_variance_trajectory(spec):
    """Deterministic respaced ancestral trajectory: reference
    IDDPMScheduler.p_mean_variance + p_sample formula with _WrappedModel
    timestep mapping vs our SpacedSchedule, same injected noise."""
    mod = _ref_iddpm()
    du = sys.modules["videotuna.utils.diffusion_utils"]
    betas_full = np.asarray(du.make_beta_schedule(
        "linear", 1000, linear_start=1e-4, linear_end=2e-2), np.float64)
    # reference respacing (SpacedDiffusion.__init__ loop)
    sched_full = mod.IDDPMScheduler(given_betas=betas_full.tolist(),
                                    timesteps=1000)
    use = mod.space_timesteps(1000, spec)
    tmap, last, new_betas = [], 1.0, []
    for i, ac in enumerate(sched_full.alphas_cumprod.numpy()):
        if i in use:
            new_betas.append(float(1.0 - ac / last))
            last = ac
            tmap.append(i)
    sched = mod.IDDPMScheduler(given_betas=new_betas,
                               timesteps=len(new_betas))
    sched.model_mean_type = mod.ModelMeanType.EPSILON
    sched.model_var_type = mod.ModelVarType.LEARNED_RANGE
    # reference bug bridge: IDDPMScheduler.p_mean_variance (iddpm3d.py:427)
    # calls predict_start_from_noise(..., eps=...) but the method's
    # parameter is named ``noise`` — a latent TypeError on the EPSILON
    # path. Bridge the keyword only; the numerics stay the reference's.
    # (OpenSoraScheduler.p_mean_variance at :497-501 additionally has the
    # START_X/EPSILON branches swapped — x_recon = model_output under
    # EPSILON — so it is not a usable oracle either.)
    _orig_psfn = sched.predict_start_from_noise
    sched.predict_start_from_noise = \
        lambda x_t, t, eps=None, noise=None: _orig_psfn(
            x_t, t, eps if eps is not None else noise)
    map_tensor = torch.tensor(tmap)

    # _WrappedModel semantics: the model sees ORIGINAL timesteps
    def wrapped_model(x, ts, **kw):
        new_ts = map_tensor[ts]
        return torch.from_numpy(_oracle_np(x.numpy(), new_ts.numpy()))

    sched.model = wrapped_model

    rng = np.random.default_rng(21)
    x_t = torch.from_numpy(rng.standard_normal(SHAPE_T)
                           .astype(np.float32))
    n = len(new_betas)
    noises = [rng.standard_normal(SHAPE_T).astype(np.float32)
              for _ in range(n)]
    x = x_t.clone()
    with torch.no_grad():
        for i in range(n - 1, -1, -1):
            t = torch.full((1,), i, dtype=torch.long)
            mean, _, logv = sched.p_mean_variance(x, t,
                                                  clip_denoised=True)
            nz = 1.0 if i != 0 else 0.0
            x = mean + nz * torch.exp(0.5 * logv) * \
                torch.from_numpy(noises[n - 1 - i])
    ref_final = x.numpy()

    # ours (channel-last): same respacing spec from the same base chain
    from videotuna_tpu.schedulers.iddpm import SpacedSchedule
    ours_s = SpacedSchedule.create(1000, spec, beta_schedule="linear",
                                   linear_start=1e-4, linear_end=2e-2)
    assert list(np.asarray(ours_s.timestep_map)) == tmap

    def denoise(xc, t_orig):
        # channel-last (B, T, H, W, C) → oracle operates channel-first
        x_cf = np.moveaxis(np.asarray(xc), -1, 1)
        out = _oracle_np(x_cf, np.asarray(t_orig))
        return jnp.asarray(np.moveaxis(out, 1, -1))

    xj = jnp.asarray(np.moveaxis(x_t.numpy(), 1, -1))
    for step_i, i in enumerate(range(n - 1, -1, -1)):
        t = jnp.full((1,), i, jnp.int32)
        t_orig = jnp.full((1,), tmap[i], jnp.int32)
        out = denoise(xj, t_orig)
        mean, log_var = ours_s.p_mean_variance(out, xj, t)
        nz = 1.0 if i != 0 else 0.0
        eps_np = jnp.asarray(np.moveaxis(noises[step_i], 1, -1))
        xj = mean + nz * jnp.exp(0.5 * log_var) * eps_np
    ours_final = np.moveaxis(np.asarray(xj), -1, 1)

    err = np.abs(ours_final - ref_final).max()
    assert err <= 1e-4, f"spaced learned-variance trajectory err {err:.2e}"
