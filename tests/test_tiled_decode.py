"""Tiled VAE decode: shapes, and seam error shrinking with overlap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.models.vae3d import CausalVAE3D


@pytest.fixture(scope="module")
def vae_and_params():
    vae = CausalVAE3D(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1,
                      z_channels=4, embed_dim=4)
    params = vae.init(jax.random.key(0),
                      jnp.zeros((1, 5, 32, 32, 3)))["params"]
    return vae, params


class TestTiledDecode:
    def test_shapes_match_full(self, vae_and_params):
        vae, params = vae_and_params
        z = jax.random.normal(jax.random.key(1), (1, 2, 16, 16, 4))
        full = vae.apply({"params": params}, z, method=vae.decode)
        tiled = vae.apply({"params": params}, z, method=vae.decode_tiled,
                          spatial_tile=8, overlap=4)
        assert tiled.shape == full.shape

    def test_no_tiling_when_small(self, vae_and_params):
        vae, params = vae_and_params
        z = jax.random.normal(jax.random.key(2), (1, 2, 8, 8, 4))
        full = vae.apply({"params": params}, z, method=vae.decode)
        tiled = vae.apply({"params": params}, z, method=vae.decode_tiled,
                          spatial_tile=32, overlap=8)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                                   atol=1e-6)

    def test_temporal_chunked_exact_with_full_prefix(self, vae_and_params):
        """With context covering the whole causal prefix the chunked decode
        is BIT-EXACT (strict causality + per-frame norms) — no overlap
        blending needed, unlike the reference's tiled decoders."""
        vae, params = vae_and_params
        z = jax.random.normal(jax.random.key(5), (1, 7, 8, 8, 4))
        full = vae.apply({"params": params}, z, method=vae.decode)
        ch = vae.apply({"params": params}, z,
                       method=vae.decode_temporal_chunked, chunk=3,
                       context=100)
        np.testing.assert_array_equal(np.asarray(ch), np.asarray(full))

    def test_temporal_chunked_error_decreases_with_context(self,
                                                           vae_and_params):
        vae, params = vae_and_params
        z = jax.random.normal(jax.random.key(6), (1, 9, 8, 8, 4))
        full = vae.apply({"params": params}, z, method=vae.decode)
        errs = []
        for ctx in (1, 4):
            ch = vae.apply({"params": params}, z,
                           method=vae.decode_temporal_chunked, chunk=3,
                           context=ctx)
            assert ch.shape == full.shape
            errs.append(float(jnp.abs(ch - full).max()))
        assert errs[1] < errs[0], errs

    def test_seam_error_decreases_with_overlap(self, vae_and_params):
        vae, params = vae_and_params
        z = jax.random.normal(jax.random.key(3), (1, 2, 16, 16, 4))
        full = vae.apply({"params": params}, z, method=vae.decode)
        errs = []
        for ov in (2, 6):
            tiled = vae.apply({"params": params}, z,
                              method=vae.decode_tiled, spatial_tile=10,
                              overlap=ov)
            errs.append(float(jnp.abs(tiled - full).mean()))
        assert errs[1] < errs[0], errs


def test_streaming_decode_exact():
    """Conv-state-carry streaming decode must be bit-comparable to the
    full decode (per-frame norms make temporal chunking exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videotuna_tpu.models.vae3d import CausalVAE3D, streaming_decode

    vae = CausalVAE3D(ch=16, ch_mult=(1, 2), num_res_blocks=1,
                      z_channels=4, embed_dim=4)
    z = jax.random.normal(jax.random.key(0), (1, 5, 8, 8, 4))
    params = vae.init(jax.random.key(1), z, method="decode")["params"]
    full = vae.apply({"params": params}, z, method="decode")
    for chunk in (1, 2, 3):
        out = streaming_decode(vae, params, z, chunk=chunk)
        assert out.shape == full.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   atol=1e-5)
