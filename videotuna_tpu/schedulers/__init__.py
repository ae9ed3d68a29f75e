"""Schedulers: pure-function diffusion/flow samplers with scan loops.

Inventory vs reference (SURVEY.md §2.2):
- DDPM/LDM buffers + q_sample/p_sample           → ddpm.DDPMSchedule
- DDIM (+multi-cond CFG)                          → ddim.DDIMSchedule + cfg_*
- Flow-matching discrete Euler (Hunyuan/Step)     → flow_match.FlowMatchSchedule
- Flow UniPC / DPM-Solver++ multistep (Wan)       → fm_solvers.*
- IDDPM / SpacedDiffusion (Open-Sora)             → iddpm.SpacedSchedule
- CogVideoX SDE-DPM++(2M) + trailing DDIM         → cogvideox_dpm.*
"""

from videotuna_tpu.schedulers.common import (extract_into, make_beta_schedule,
                                             make_ddim_timesteps,
                                             rescale_noise_cfg,
                                             rescale_zero_terminal_snr)
from videotuna_tpu.schedulers.ddpm import DDPMSchedule
from videotuna_tpu.schedulers.cogvideox_dpm import (CogVideoXDPMSchedule,
                                                    build_cogvideox_ddim)
from videotuna_tpu.schedulers.ddim import (DDIMSchedule, cfg_denoise,
                                           dynamic_cfg_denoise,
                                           multicond_cfg_denoise)
from videotuna_tpu.schedulers.flow_match import (FlowMatchSchedule,
                                                 flow_interpolate, flow_target,
                                                 sample_sigmas, shift_sigmas)

__all__ = [
    "DDPMSchedule", "DDIMSchedule", "FlowMatchSchedule",
    "CogVideoXDPMSchedule", "build_cogvideox_ddim",
    "cfg_denoise", "dynamic_cfg_denoise", "multicond_cfg_denoise",
    "flow_interpolate", "flow_target", "sample_sigmas", "shift_sigmas",
    "extract_into", "make_beta_schedule", "make_ddim_timesteps",
    "rescale_noise_cfg", "rescale_zero_terminal_snr",
]

try:  # optional heavier solvers, imported for registry side effects
    from videotuna_tpu.schedulers.fm_solvers import (  # noqa: F401
        FlowDPMSolverSchedule, FlowUniPCSchedule)
    __all__ += ["FlowUniPCSchedule", "FlowDPMSolverSchedule"]
except ImportError:
    pass
try:
    from videotuna_tpu.schedulers.iddpm import SpacedSchedule  # noqa: F401
    __all__ += ["SpacedSchedule"]
except ImportError:
    pass
try:
    from videotuna_tpu.schedulers.edm import EDMSamplerFamily  # noqa: F401
    __all__ += ["EDMSamplerFamily"]
except ImportError:
    pass
