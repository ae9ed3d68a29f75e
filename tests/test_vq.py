"""VQ/LFQ quantizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotuna_tpu.models.vq import LFQ, VQVAE3D, VectorQuantizer


class TestVectorQuantizer:
    def test_quantized_from_codebook(self):
        vq = VectorQuantizer(codebook_size=16, dim=4)
        z = jax.random.normal(jax.random.key(0), (2, 3, 4))
        params = vq.init(jax.random.key(1), z)["params"]
        zq, aux = vq.apply({"params": params}, z)
        cb = params["codebook"]
        flat = np.asarray(zq).reshape(-1, 4)
        idx = np.asarray(aux["indices"]).ravel()
        np.testing.assert_allclose(flat, np.asarray(cb)[idx], atol=1e-6)
        assert float(aux["perplexity"]) > 1.0

    def test_straight_through_gradient(self):
        vq = VectorQuantizer(codebook_size=8, dim=4)
        z = jax.random.normal(jax.random.key(2), (4, 4))
        params = vq.init(jax.random.key(3), z)["params"]

        def loss(z):
            zq, _ = vq.apply({"params": params}, z)
            return jnp.sum(zq ** 2)

        g = jax.grad(loss)(z)
        assert float(jnp.abs(g).max()) > 0.0  # gradients pass through


class TestLFQ:
    def test_signs_and_codes(self):
        lfq = LFQ(dim=4)
        z = jnp.array([[0.5, -0.2, 1.0, -0.9]])
        out, aux = lfq.apply({}, z)  # LFQ is parameter-free
        np.testing.assert_array_equal(np.sign(np.asarray(out)),
                                      [[1, -1, 1, -1]])
        # code bits: 1,0,1,0 → 1 + 4 = 5
        assert int(aux["indices"][0]) == 0b0101

    def test_entropy_terms_finite(self):
        lfq = LFQ(dim=6)
        z = jax.random.normal(jax.random.key(1), (8, 2, 6))
        _, aux = lfq.apply({}, z)
        assert np.isfinite(float(aux["vq_loss"]))


class TestVQVAE3D:
    @pytest.mark.parametrize("quant", ["vq", "lfq"])
    def test_roundtrip_shapes(self, quant):
        vae = VQVAE3D(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_dim=4,
                      quantizer=quant, codebook_size=32)
        video = jnp.zeros((1, 5, 16, 16, 3))
        params = vae.init(jax.random.key(0), video)["params"]
        recon, aux = vae.apply({"params": params}, video)
        assert recon.shape == video.shape
        assert "vq_loss" in aux
