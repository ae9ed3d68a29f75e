"""3D causal VAE tests: 4k+1↔k+1 frame mapping, causality, shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.models.vae3d import CausalConv3D, CausalVAE3D

TINY = dict(ch=8, ch_mult=(1, 2, 2), num_res_blocks=1, z_channels=4,
            embed_dim=4)


class TestCausalConv:
    def test_causality(self):
        """Output frame i must not depend on input frames > i."""
        conv = CausalConv3D(4, kernel=(3, 3, 3))
        x = jax.random.normal(jax.random.key(0), (1, 6, 8, 8, 2))
        params = conv.init(jax.random.key(1), x)["params"]
        y1 = conv.apply({"params": params}, x)
        x2 = x.at[:, 4:].set(99.0)  # perturb the future
        y2 = conv.apply({"params": params}, x2)
        np.testing.assert_allclose(y1[:, :4], y2[:, :4], atol=1e-5)
        assert float(jnp.abs(y1[:, 4:] - y2[:, 4:]).max()) > 1e-3

    def test_temporal_stride_length(self):
        conv = CausalConv3D(4, kernel=(3, 3, 3), strides=(2, 1, 1))
        x = jnp.zeros((1, 9, 4, 4, 2))
        params = conv.init(jax.random.key(0), x)["params"]
        y = conv.apply({"params": params}, x)
        assert y.shape[1] == 5  # ceil(9/2)


class TestCausalVAE3D:
    @pytest.fixture(scope="class")
    def tiny(self):
        vae = CausalVAE3D(**TINY)
        video = jnp.zeros((1, 5, 16, 16, 3))
        params = vae.init(jax.random.key(0), video)["params"]
        return vae, params

    def test_4kplus1_mapping(self, tiny):
        vae, params = tiny
        # 4k+1 = 9 frames → k+1 = 3 latent frames; spatial /4 (3 levels → 2 downs)
        video = jax.random.normal(jax.random.key(1), (1, 9, 16, 16, 3))
        moments = vae.apply({"params": params}, video, method=vae.encode)
        assert moments.shape == (1, 3, 4, 4, 8)  # 2·z=8 moments
        z = jnp.split(moments, 2, axis=-1)[0]
        rec = vae.apply({"params": params}, z, method=vae.decode)
        assert rec.shape == video.shape

    def test_single_frame_image(self, tiny):
        """k=0: a single frame maps to one latent frame (image support —
        the CogVideoX image-video joint training path)."""
        vae, params = tiny
        img = jnp.zeros((1, 1, 16, 16, 3))
        moments = vae.apply({"params": params}, img, method=vae.encode)
        assert moments.shape[1] == 1
        z = jnp.split(moments, 2, axis=-1)[0]
        rec = vae.apply({"params": params}, z, method=vae.decode)
        assert rec.shape == img.shape

    def test_encoder_causality(self, tiny):
        """Latent frame 0 (from input frame 0) must not see later frames."""
        vae, params = tiny
        v1 = jax.random.normal(jax.random.key(2), (1, 9, 16, 16, 3))
        v2 = v1.at[:, 5:].set(-5.0)
        m1 = vae.apply({"params": params}, v1, method=vae.encode)
        m2 = vae.apply({"params": params}, v2, method=vae.encode)
        np.testing.assert_allclose(m1[:, 0], m2[:, 0], atol=1e-4)


def test_mochi_geometry_6x_temporal():
    """temporal_factors (2,3): 6k+1 frames <-> k+1 latents, streaming
    decode stays exact with a factor-3 upsample stage."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from videotuna_tpu.models.vae3d import CausalVAE3D, streaming_decode

    vae = CausalVAE3D(ch=16, ch_mult=(1, 1, 2), num_res_blocks=1,
                      z_channels=4, embed_dim=4, temporal_factors=(2, 3))
    assert vae.temporal_ratio == 6
    x = jax.random.normal(jax.random.key(0), (1, 13, 16, 16, 3))
    pe = vae.init(jax.random.key(1), x, method="encode")["params"]
    moments = vae.apply({"params": pe}, x, method="encode")
    assert moments.shape[1] == 3                     # (13-1)/6+1

    z = jax.random.normal(jax.random.key(2), (1, 3, 4, 4, 4))
    pd = vae.init(jax.random.key(3), z, method="decode")["params"]
    out = vae.apply({"params": pd}, z, method="decode")
    assert out.shape[1] == 13                        # 6*(3-1)+1

    stream = streaming_decode(vae, pd, z, chunk=1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(out),
                               atol=1e-5)
