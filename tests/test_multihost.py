"""Multi-host path: 2-process CPU ``jax.distributed`` integration.

The reference's multi-host story is torchrun + NCCL process groups with
rank-0 weight loading and per-param broadcast
(/root/reference/videotuna/flow/hunyuanvideo.py:329-402,
flow/wanvideo.py:153-157). Ours is ``core.mesh.initialize_distributed``
(jax.distributed) + jax.Array sharding — this test actually EXERCISES it:
two subprocesses, each with 2 virtual CPU devices, form one 4-device dp
mesh, run a psum-reducing jitted step over a process-spanning sharding,
broadcast host-0 data, and write/restore a multi-process orbax
checkpoint (P10 in SURVEY §2.5)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

coord, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
from videotuna_tpu.core.mesh import initialize_distributed
initialize_distributed(coordinator_address=coord, num_processes=nproc,
                       process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 2, len(jax.devices())

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))

# host-0 decides, everyone receives (reference rank-0 broadcast parity)
seed = multihost_utils.broadcast_one_to_all(
    jnp.asarray(1234 if jax.process_index() == 0 else 0))
assert int(seed) == 1234, int(seed)

# a process-spanning data-parallel reduction: global batch 8 sharded over
# 4 devices on 2 hosts; the jitted mean must see every shard
sharding = NamedSharding(mesh, P("dp"))
local = np.full((4, 4), float(jax.process_index() + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (8, 4))

@jax.jit
def global_mean(x):
    return jnp.mean(x)

m = float(global_mean(garr))
assert abs(m - 1.5) < 1e-6, m    # mean of host values {1, 2}

# multi-process orbax checkpoint: every process participates
import orbax.checkpoint as ocp
state = {"w": garr}
path = f"{outdir}/step_1"
ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
ckptr.save(path, state, force=True)
multihost_utils.sync_global_devices("saved")

restored = ckptr.restore(
    path, item={"w": jax.ShapeDtypeStruct((8, 4), np.float32)},
    restore_args={"w": ocp.ArrayRestoreArgs(sharding=sharding)})
rv = float(global_mean(restored["w"]))
assert abs(rv - 1.5) < 1e-6, rv
print(f"proc {pid}: OK mean={m} restored={rv}")
"""


def test_two_process_distributed(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i), "2",
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK mean=1.5" in out, out[-2000:]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
