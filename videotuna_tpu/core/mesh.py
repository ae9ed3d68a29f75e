"""Device mesh management — the single comm abstraction the reference lacks.

The reference scatters process-group bookkeeping across model families (NCCL
groups in flow/wanvideo.py:102-130, xfuser SP groups in flow/hunyuanvideo.py:
302-319, SAT mpu in cogvideo_sat/arguments.py:107, opensora's dict registry in
acceleration/parallel_states.py). Here one `Mesh` with named axes serves every
parallelism strategy:

- ``dp``   data parallel (reference P1: Lightning DDP)
- ``fsdp`` fully-sharded params/optimizer (P2 ZeRO / P3 FSDP)
- ``sp``   sequence parallel (P4 Ulysses / P5 Ulysses×ring)
- ``tp``   tensor parallel (P6 xfuser TP / SAT mpu)

XLA inserts all collectives; ICI carries fsdp/sp/tp traffic, DCN carries
cross-slice dp.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "sp", "tp")

# Logical → mesh-axis rules used with flax's logical partitioning idiom.
# Activations: batch on (dp, fsdp); sequence on sp; heads/model dims on tp.
DEFAULT_RULES: Tuple[Tuple[str, Optional[Tuple[str, ...]]], ...] = (
    ("batch", ("dp", "fsdp")),
    ("seq", ("sp",)),
    ("heads", ("tp",)),
    ("embed", None),
    ("mlp", ("tp",)),
    ("kv", None),
    ("vocab", ("tp",)),
)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.fsdp * self.sp * self.tp


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the global mesh.

    With no config, all devices go on ``dp``. Axis sizes must multiply to the
    device count (same invariant the reference asserts for ring×ulysses at
    flow/wanvideo.py:119).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if cfg is None:
        cfg = MeshConfig(dp=n)
    if cfg.size != n:
        raise ValueError(
            f"Mesh axes dp×fsdp×sp×tp = {cfg.size} != device count {n}")
    arr = np.array(devices).reshape(cfg.dp, cfg.fsdp, cfg.sp, cfg.tp)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(), devices=jax.devices()[:1])


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_ACTIVE_MESH: Optional[Mesh] = None


def get_mesh() -> Mesh:
    global _ACTIVE_MESH
    if _ACTIVE_MESH is None:
        _ACTIVE_MESH = make_mesh()
    return _ACTIVE_MESH


def set_mesh(mesh: Mesh) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init — replaces every ``dist.init_process_group("nccl")``
    site in the reference (P11). No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
