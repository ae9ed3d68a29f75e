"""CogVideoX scheduler numerics: SNR shift, trailing grid, SDE-DPM++(2M).

The reference's 004/005 configs instantiate diffusers
``CogVideoXDPMScheduler`` (/root/reference/configs/004_cogvideox/
cogvideo5b.yaml:38-42) and thread ``old_pred_original_sample`` through its
step() (/root/reference/videotuna/models/cogvideo_hf/cogvideo_pl.py:732-744).
diffusers is NOT importable in this environment, so — unlike the Wan/IDDPM
solver gates, which drive the imported reference classes — these gates pin
the repo's scan implementation against an INDEPENDENT fp64 NumPy twin of
the published update equations (SDE-DPM-Solver++(2M), Lu et al.
arXiv:2211.01095 §4, data prediction; the CogVideoX variant's per-step
algebra is spelled out in videotuna_tpu/schedulers/cogvideox_dpm.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.schedulers import (CogVideoXDPMSchedule, DDPMSchedule,
                                      build_cogvideox_ddim)
from videotuna_tpu.schedulers.common import make_trailing_timesteps

N_TRAIN = 200   # small train grid keeps the fp32/fp64 drift tiny


# ------------------------------------------------------------- fp64 twin
def twin_alphas_cumprod(n=N_TRAIN, start=0.00085, end=0.012, s=3.0,
                        zero_snr=True):
    """diffusers scheduling_ddim_cogvideox __init__ order of ops, fp64."""
    betas = np.linspace(start ** 0.5, end ** 0.5, n, dtype=np.float64) ** 2
    acp = np.cumprod(1.0 - betas)
    acp = acp / (s + (1.0 - s) * acp)                  # SNR shift (SD3)
    if zero_snr:                                        # on ᾱ directly
        sq = np.sqrt(acp)
        sq = (sq - sq[-1]) * sq[0] / (sq[0] - sq[-1])
        acp = sq ** 2
    return acp


def twin_model(x, t_scalar):
    """Deterministic v-prediction stand-in, identical math in np/jnp."""
    return 0.9 * x - 0.3 * np.roll(x, 1, axis=-1) + 0.01 * (
        t_scalar / N_TRAIN)


def twin_dpm_sample(acp, x, num_steps, noises):
    """fp64 SDE-DPM++(2M) loop: trailing grid, set_alpha_to_one, v-pred,
    first-order on the first and final steps, 2M in between."""
    n_train = acp.shape[0]
    ts = make_trailing_timesteps(num_steps, n_train)
    old_x0 = None
    with np.errstate(divide="ignore", invalid="ignore"):
        for i, t in enumerate(ts):
            a_t = acp[t]
            prev_t = t - n_train // num_steps
            a_prev = acp[prev_t] if prev_t >= 0 else np.float64(1.0)
            v = twin_model(x, float(t))
            x0 = np.sqrt(a_t) * x - np.sqrt(1.0 - a_t) * v
            lam = np.log(np.sqrt(a_t / (1.0 - a_t)))
            lam_next = np.log(np.sqrt(a_prev / (1.0 - a_prev)))
            h = lam_next - lam
            mult1 = np.sqrt((1.0 - a_prev) / (1.0 - a_t)) * np.exp(-h)
            mult2 = np.expm1(-2.0 * h) * np.sqrt(a_prev)
            mult_noise = np.sqrt(1.0 - a_prev) * np.sqrt(
                -np.expm1(-2.0 * h))
            if old_x0 is None or prev_t < 0:
                d = x0
            else:
                lam_back = np.log(np.sqrt(acp[ts[i - 1]]
                                          / (1.0 - acp[ts[i - 1]])))
                r = (lam - lam_back) / h
                c2 = 1.0 / (2.0 * r)
                d = (1.0 + c2) * x0 - c2 * old_x0
            x = mult1 * x - mult2 * d + mult_noise * noises[i]
            old_x0 = x0
    return x


def make_base(**kw):
    kw.setdefault("timesteps", N_TRAIN)
    kw.setdefault("beta_schedule", "scaled_linear")
    kw.setdefault("linear_start", 0.00085)
    kw.setdefault("linear_end", 0.012)
    kw.setdefault("parameterization", "v")
    kw.setdefault("rescale_betas_zero_snr", True)
    kw.setdefault("snr_shift_scale", 3.0)
    return DDPMSchedule.create(**kw)


class TestSNRShiftSchedule:
    def test_alphas_match_fp64_twin(self):
        base = make_base()
        got = np.asarray(base.alphas_cumprod, np.float64)
        want = twin_alphas_cumprod()
        assert got[-1] == 0.0, "zero-terminal-SNR must be exact"
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_shift_divides_snr(self):
        # without the zero-SNR rescale the shift is exactly SNR/s
        base = make_base(rescale_betas_zero_snr=False)
        acp = np.asarray(base.alphas_cumprod, np.float64)
        betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, N_TRAIN,
                            dtype=np.float64) ** 2
        raw = np.cumprod(1.0 - betas)
        np.testing.assert_allclose(acp / (1.0 - acp),
                                   raw / (1.0 - raw) / 3.0, rtol=1e-4)

    def test_noop_without_shift(self):
        a = DDPMSchedule.create(timesteps=50, snr_shift_scale=1.0)
        b = DDPMSchedule.create(timesteps=50)
        np.testing.assert_array_equal(np.asarray(a.alphas_cumprod),
                                      np.asarray(b.alphas_cumprod))


class TestTrailingGrid:
    def test_grid_values(self):
        ts = make_trailing_timesteps(50, 1000)
        assert ts[0] == 999 and ts[-1] == 19
        assert np.array_equal(ts, np.arange(999, 18, -20))

    def test_dpm_schedule_tables(self):
        base = make_base()
        sched = CogVideoXDPMSchedule.create(base, 10)
        assert sched.timesteps[0] == N_TRAIN - 1
        # set_alpha_to_one: the step past the grid end targets ᾱ=1
        assert float(sched.alphas_prev[-1]) == 1.0
        assert bool(sched.is_final[-1]) and not bool(sched.is_final[0])


class TestCogVideoXDDIM:
    def test_atbt_equivalence(self):
        """The published CogVideoXDDIM a_t/b_t update equals η=0 DDIM:
        a_t·x + b_t·x₀ == √ᾱ⁺·x₀ + √(1−ᾱ⁺)·ε, fp64."""
        rng = np.random.default_rng(0)
        a = np.sort(rng.uniform(0.01, 0.99, 8))
        x = rng.standard_normal((2, 5))
        x0 = rng.standard_normal((2, 5))
        for i in range(7):
            a_t, a_prev = a[i], a[i + 1]
            eps = (x - np.sqrt(a_t) * x0) / np.sqrt(1.0 - a_t)
            ddim = np.sqrt(a_prev) * x0 + np.sqrt(1.0 - a_prev) * eps
            at = np.sqrt((1.0 - a_prev) / (1.0 - a_t))
            bt = np.sqrt(a_prev) - np.sqrt(a_t) * at
            np.testing.assert_allclose(at * x + bt * x0, ddim, rtol=1e-12)

    def test_trailing_ddim_trajectory(self):
        """build_cogvideox_ddim's η=0 scan vs an fp64 a_t/b_t loop."""
        base = make_base()
        steps = 8
        sched = build_cogvideox_ddim(base, steps)
        shape = (1, 4, 6)
        x_T = jax.random.normal(jax.random.key(1), shape)

        def denoise(x, t):
            tf = t.reshape(-1)[0].astype(jnp.float32)
            return (0.9 * x - 0.3 * jnp.roll(x, 1, axis=-1)
                    + 0.01 * (tf / N_TRAIN))

        got = np.asarray(
            sched.sample(denoise, shape, jax.random.key(2), x_T=x_T),
            np.float64)

        acp = twin_alphas_cumprod()
        ts = make_trailing_timesteps(steps, N_TRAIN)
        x = np.asarray(x_T, np.float64)
        for t in ts:
            a_t = acp[t]
            prev_t = t - N_TRAIN // steps
            a_prev = acp[prev_t] if prev_t >= 0 else np.float64(1.0)
            v = twin_model(x, float(t))
            x0 = np.sqrt(a_t) * x - np.sqrt(1.0 - a_t) * v
            at = np.sqrt((1.0 - a_prev) / (1.0 - a_t))
            bt = np.sqrt(a_prev) - np.sqrt(a_t) * at
            x = at * x + bt * x0
        np.testing.assert_allclose(got, x, atol=2e-4)


class TestDPMTrajectory:
    @pytest.mark.parametrize("steps", [4, 9])
    def test_trajectory_vs_fp64_twin(self, steps):
        base = make_base()
        sched = CogVideoXDPMSchedule.create(base, steps)
        shape = (1, 4, 6)
        x_T = jax.random.normal(jax.random.key(3), shape)
        noises = jax.random.normal(jax.random.key(4), (steps,) + shape)

        def denoise(x, t):
            tf = t.reshape(-1)[0].astype(jnp.float32)
            return (0.9 * x - 0.3 * jnp.roll(x, 1, axis=-1)
                    + 0.01 * (tf / N_TRAIN))

        got = np.asarray(
            sched.sample(denoise, shape, jax.random.key(5), x_T=x_T,
                         noises=noises), np.float64)
        want = twin_dpm_sample(twin_alphas_cumprod(),
                               np.asarray(x_T, np.float64), steps,
                               np.asarray(noises, np.float64))
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_first_order_mode(self):
        """second_order=False must reduce every step to DDIM-SDE."""
        base = make_base()
        s2 = CogVideoXDPMSchedule.create(base, 6, second_order=False)
        shape = (1, 3, 4)
        x_T = jax.random.normal(jax.random.key(6), shape)
        noises = jnp.zeros((6,) + shape)

        def denoise(x, t):
            return 0.5 * x

        got = np.asarray(s2.sample(denoise, shape, jax.random.key(7),
                                   x_T=x_T, noises=noises), np.float64)
        acp = twin_alphas_cumprod()
        ts = make_trailing_timesteps(6, N_TRAIN)
        x = np.asarray(x_T, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            for t in ts:
                a_t = acp[t]
                prev_t = t - N_TRAIN // 6
                a_prev = acp[prev_t] if prev_t >= 0 else np.float64(1.0)
                x0 = np.sqrt(a_t) * x - np.sqrt(1.0 - a_t) * (0.5 * x)
                h = (np.log(np.sqrt(a_prev / (1.0 - a_prev)))
                     - np.log(np.sqrt(a_t / (1.0 - a_t))))
                x = (np.sqrt((1.0 - a_prev) / (1.0 - a_t)) * np.exp(-h) * x
                     - np.expm1(-2.0 * h) * np.sqrt(a_prev) * x0)
        np.testing.assert_allclose(got, x, atol=2e-4)


class TestFlowWiring:
    def test_flow_accepts_dpm_scheduler(self):
        from videotuna_tpu.flows.cogvideo import CogVideoXFlow
        flow = CogVideoXFlow(
            denoiser_config={
                "target":
                    "videotuna_tpu.models.cogvideo.CogVideoXTransformer",
                "params": dict(in_channels=16, out_channels=16, dim=32,
                               num_layers=1, heads=2, text_dim=16,
                               patch_size=(1, 2, 2), use_rope=True),
            },
            scheduler_config={
                "target": "videotuna_tpu.schedulers.CogVideoXDPMSchedule",
                "params": dict(num_steps=4, timesteps=N_TRAIN,
                               beta_schedule="scaled_linear",
                               linear_start=0.00085, linear_end=0.012,
                               parameterization="v",
                               rescale_betas_zero_snr=True,
                               snr_shift_scale=3.0),
            },
            first_stage_config=None, cond_stage_config=None)
        assert isinstance(flow.scheduler, CogVideoXDPMSchedule)
        # training uses the SNR-shifted base ᾱ (reference add_noise path)
        assert float(flow.base_schedule.alphas_cumprod[-1]) == 0.0
        params = {"denoiser": flow.denoiser.init(
            jax.random.key(0), jnp.zeros((1, 2, 8, 8, 16)),
            jnp.array([10]), jnp.zeros((1, 6, 16)))["params"]}
        lat = flow.sample(params, {"y": jnp.zeros((1, 6, 16))}, None,
                          (1, 2, 8, 8, 16), jax.random.key(1),
                          cfg_scale=1.0)
        assert lat.shape == (1, 2, 8, 8, 16)
        assert np.isfinite(np.asarray(lat)).all()

    def test_ddim_path_uses_trailing_grid(self):
        from videotuna_tpu.flows.cogvideo import CogVideoXFlow
        flow = CogVideoXFlow(
            denoiser_config={
                "target":
                    "videotuna_tpu.models.cogvideo.CogVideoXTransformer",
                "params": dict(in_channels=16, out_channels=16, dim=32,
                               num_layers=1, heads=2, text_dim=16,
                               patch_size=(1, 2, 2), use_rope=True),
            },
            scheduler_config={
                "target": "videotuna_tpu.schedulers.DDPMSchedule",
                "params": dict(timesteps=N_TRAIN,
                               beta_schedule="scaled_linear",
                               parameterization="v",
                               rescale_betas_zero_snr=True),
            },
            first_stage_config=None, cond_stage_config=None,
            ddim_steps=10)
        ts = np.asarray(flow.scheduler.timesteps)
        assert ts[-1] == N_TRAIN - 1     # trailing: grid ends at T−1
        assert float(flow.scheduler.alphas_prev[0]) == 1.0
