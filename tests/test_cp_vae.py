"""Context-parallel VAE tests: halo exchange correctness, sharded causal
conv parity with the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from videotuna_tpu.core.mesh import MeshConfig, make_mesh
from videotuna_tpu.parallel.cp_vae import (cp_causal_conv,
                                           halo_exchange_time,
                                           sharded_vae_apply)


class TestHaloExchange:
    def test_halo_contents(self, devices8):
        mesh = make_mesh(MeshConfig(sp=8), devices=devices8)
        t_total = 16
        x = jnp.arange(t_total, dtype=jnp.float32).reshape(
            1, t_total, 1, 1, 1)

        def local(xl):
            return halo_exchange_time(xl, halo=1, axis="sp")

        spec = P(None, "sp", None, None, None)
        out_spec = P(None, "sp", None, None, None)
        with mesh:
            out = shard_map(local, mesh=mesh, in_specs=(spec,),
                            out_specs=out_spec, check_vma=False)(x)
        # each shard of 2 frames now has 3; flattened: shard i starts with
        # frame (2i−1) except shard 0 which repeats frame 0
        out = np.asarray(out).ravel()
        assert out[0] == 0.0 and out[1] == 0.0 and out[2] == 1.0  # rank 0
        assert out[3] == 1.0 and out[4] == 2.0 and out[5] == 3.0  # rank 1

    def test_cp_causal_conv_matches_single_device(self, devices8):
        """A depth-3 temporal mean filter sharded over 8 ranks must equal
        the unsharded causal version exactly."""
        mesh = make_mesh(MeshConfig(sp=8), devices=devices8)
        kt = 3
        t_total = 16
        key = jax.random.key(0)
        x = jax.random.normal(key, (2, t_total, 4, 4, 3))

        def conv_nopad(v):
            # causal temporal mean over kt frames, valid in time
            stack = jnp.stack([v[:, i:i + t_local_plus(v) - kt + 1]
                               for i in range(kt)], 0)
            return jnp.mean(stack, axis=0)

        def t_local_plus(v):
            return v.shape[1]

        # single-device reference: edge-pad front then valid conv
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        ref = conv_nopad(jnp.concatenate([front, x], axis=1))
        assert ref.shape == x.shape

        def local(v):
            return cp_causal_conv(v, conv_nopad, kt, "sp")

        spec = P(None, "sp", None, None, None)
        with mesh:
            out = shard_map(local, mesh=mesh, in_specs=(spec,),
                            out_specs=spec, check_vma=False)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
