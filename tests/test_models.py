"""Embedding + NeRF MLP unit tests (formula checks, not golden files)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.models import (EmbeddingConfig, NeRFConfig, embed,
                                init_nerf_params, nerf_apply,
                                nerf_param_count)


class TestEmbedding:
    def test_out_channels(self):
        assert EmbeddingConfig(3, 10).out_channels == 63
        assert EmbeddingConfig(3, 4).out_channels == 27

    def test_formula_logscale(self):
        cfg = EmbeddingConfig(in_channels=2, N_freqs=3)
        x = jnp.array([[0.3, -1.2]])
        out = np.asarray(embed(x, cfg))
        assert out.shape == (1, 2 * (2 * 3 + 1))
        xn = np.array([0.3, -1.2])
        expected = [xn]
        for f in [1.0, 2.0, 4.0]:
            expected.append(np.sin(f * xn))
            expected.append(np.cos(f * xn))
        np.testing.assert_allclose(out[0], np.concatenate(expected), atol=1e-6)

    def test_linear_freq_bands(self):
        cfg = EmbeddingConfig(in_channels=1, N_freqs=4, logscale=False)
        np.testing.assert_allclose(cfg.freq_bands(), [1, 10 / 3, 17 / 3, 8],
                                   atol=1e-6)

    def test_batch_shapes(self):
        cfg = EmbeddingConfig(3, 10)
        x = jnp.zeros((7, 5, 3))
        assert embed(x, cfg).shape == (7, 5, 63)

    def test_zero_input(self):
        cfg = EmbeddingConfig(3, 4)
        out = np.asarray(embed(jnp.zeros((1, 3)), cfg))
        # x=0 -> [0,0,0] + per-freq [sin=0 (x3), cos=1 (x3)]
        np.testing.assert_allclose(out[0, :3], 0)
        sc = out[0, 3:].reshape(4, 2, 3)
        np.testing.assert_allclose(sc[:, 0], 0)
        np.testing.assert_allclose(sc[:, 1], 1)


class TestNeRF:
    def test_param_count_matches_reference_arch(self):
        # 8x256 trunk + skip at 4 + heads = 595,844 params / MLP < 600k
        # (x2 MLPs ~ 1.19M, the reference's "~5 MB portable scene").
        cfg = NeRFConfig()
        n = nerf_param_count(cfg)
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        actual = sum(int(np.prod(p.shape))
                     for layer in params.values() for p in layer.values())
        assert n == actual
        assert 590_000 < n < 600_000

    def test_forward_shapes(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        xyz = jnp.ones((5, 63))
        d = jnp.ones((5, 27))
        rgb, sigma = nerf_apply(params, xyz, d, cfg)
        assert rgb.shape == (5, 3) and sigma.shape == (5, 1)
        assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))

    def test_sigma_only_matches_full(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.PRNGKey(1), cfg)
        xyz = jax.random.normal(jax.random.PRNGKey(2), (9, 63))
        d = jax.random.normal(jax.random.PRNGKey(3), (9, 27))
        sigma_a = nerf_apply(params, xyz, None, cfg, sigma_only=True)
        _, sigma_b = nerf_apply(params, xyz, d, cfg)
        np.testing.assert_allclose(np.asarray(sigma_a), np.asarray(sigma_b),
                                   atol=1e-6)

    def test_rgb_depends_on_direction_sigma_does_not(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.PRNGKey(1), cfg)
        xyz = jax.random.normal(jax.random.PRNGKey(2), (4, 63))
        d1 = jax.random.normal(jax.random.PRNGKey(3), (4, 27))
        d2 = jax.random.normal(jax.random.PRNGKey(4), (4, 27))
        rgb1, s1 = nerf_apply(params, xyz, d1, cfg)
        rgb2, s2 = nerf_apply(params, xyz, d2, cfg)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))

    def test_broadcast_dir_over_samples(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        xyz = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 63))
        d = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 27))
        rgb, sigma = nerf_apply(params, xyz, d, cfg)
        assert rgb.shape == (2, 6, 3) and sigma.shape == (2, 6, 1)

    def test_skip_concat_happens(self):
        # A non-default skip location changes layer-4 input width.
        cfg = NeRFConfig(D=4, W=32, skips=(2,))
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        assert params["xyz_2"]["w"].shape == (32 + 63, 32)
        assert params["xyz_1"]["w"].shape == (32, 32)

    def test_bfloat16_compute_close_to_f32(self):
        cfg = NeRFConfig()
        params = init_nerf_params(jax.random.PRNGKey(0), cfg)
        xyz = jax.random.normal(jax.random.PRNGKey(1), (16, 63))
        d = jax.random.normal(jax.random.PRNGKey(2), (16, 27))
        rgb32, s32 = nerf_apply(params, xyz, d, cfg)
        rgb16, s16 = nerf_apply(params, xyz, d, cfg,
                                compute_dtype=jnp.bfloat16)
        assert np.max(np.abs(np.asarray(rgb32) - np.asarray(rgb16))) < 0.1
