"""videotuna_tpu — a TPU-native video generation framework.

Re-implements the capabilities of VideoTuna (VideoVerses/VideoTuna-dev) as an
idiomatic JAX / XLA / Pallas / pjit stack:

- ``core``       config system (YAML ``target:``/``params:`` surface), registry,
                 mesh management, PRNG discipline, checkpointing, logging.
- ``kernels``    Pallas TPU kernels (flash spatio-temporal attention, ring
                 attention) with pure-JAX fallbacks for CPU tests.
- ``parallel``   mesh axes (dp/fsdp/sp/tp), sharding rules, ulysses all_to_all,
                 ring collectives via shard_map.
- ``schedulers`` DDPM/DDIM/IDDPM + flow-matching (Euler, UniPC, DPM-Solver++)
                 as pure functions with ``lax.scan`` sampling loops.
- ``models``     flax model zoo: lvdm UNet3D, STDiT, CogVideoX MMDiT, Hunyuan
                 double/single-stream DiT, Wan DiT, StepVideo DiT, Flux; VAEs
                 (2D KL and 3D-causal); text encoders.
- ``flows``      GenerationFlow composition (first_stage / cond_stage /
                 denoiser / scheduler) mirroring the reference's
                 ``videotuna/base/generation_base.py`` surface.
- ``data``       CSV/filelist datasets, dummy loaders with failure injection,
                 host decode, device-side transform pipeline.
- ``training``   pjit train loop, LoRA trees, EMA, callbacks, auto-resume.
- ``cli``        train/inference entry points preserving the YAML configs
                 public surface.
"""

__version__ = "0.1.0"
