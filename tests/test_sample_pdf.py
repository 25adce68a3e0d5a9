"""Inverse-CDF resampler property tests (SURVEY.md §4: match np.searchsorted)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.ops import sample_pdf, searchsorted_right


class TestSearchsorted:
    def test_matches_numpy_side_right(self, rng):
        for _ in range(5):
            seq = np.sort(rng.random((4, 17)), axis=-1).astype(np.float32)
            vals = rng.random((4, 9)).astype(np.float32)
            ours = np.asarray(searchsorted_right(jnp.array(seq), jnp.array(vals)))
            ref = np.stack([np.searchsorted(s, v, side="right")
                            for s, v in zip(seq, vals)])
            np.testing.assert_array_equal(ours, ref)

    def test_exact_hits_go_right(self):
        seq = jnp.array([[0.0, 0.5, 1.0]])
        vals = jnp.array([[0.5, 0.0, 1.0]])
        np.testing.assert_array_equal(
            np.asarray(searchsorted_right(seq, vals)), [[2, 1, 3]])


class TestSamplePdf:
    def test_deterministic_uniform_weights(self):
        # Uniform pdf over [0,1): det samples should be ~evenly spaced.
        R, B, M = 3, 8, 16
        bins = jnp.broadcast_to(jnp.linspace(0, 1, B + 1), (R, B + 1))
        weights = jnp.ones((R, B))
        s = np.asarray(sample_pdf(bins, weights, M, det=True))
        expected = np.linspace(0, 1, M)
        np.testing.assert_allclose(s, np.tile(expected, (R, 1)), atol=1e-4)

    def test_concentrated_weight(self):
        # All mass in bin k -> all samples inside that bin.
        R, B, M = 2, 10, 32
        bins = jnp.broadcast_to(jnp.linspace(0, 1, B + 1), (R, B + 1))
        w = np.full((R, B), 1e-8, np.float32)
        w[:, 4] = 1.0
        s = np.asarray(sample_pdf(bins, jnp.array(w), M, det=True, eps=1e-8))
        lo, hi = 4 / B, 5 / B
        # The det linspace includes u=0 and u=1 exactly, which resolve into
        # the first/last near-zero-mass bins — everything else must be inside.
        frac_inside = np.mean((s >= lo - 1e-3) & (s <= hi + 1e-3))
        assert frac_inside >= (M - 2) / M

    def test_stochastic_matches_distribution(self):
        R, B, M = 1, 4, 20000
        bins = jnp.broadcast_to(jnp.linspace(0, 1, B + 1), (R, B + 1))
        w = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        s = np.asarray(sample_pdf(bins, w, M, det=False,
                                  key=jax.random.PRNGKey(0)))
        # Empirical mass per bin ~ weight proportions.
        hist, _ = np.histogram(s, bins=np.linspace(0, 1, B + 1))
        np.testing.assert_allclose(hist / M, np.array([1, 2, 3, 4]) / 10,
                                   atol=0.02)

    def test_samples_within_bin_range(self, rng):
        R, B, M = 16, 62, 64
        edges = np.sort(rng.random((R, B + 1)) * 4 + 2, axis=-1).astype(np.float32)
        w = rng.random((R, B)).astype(np.float32)
        s = np.asarray(sample_pdf(jnp.array(edges), jnp.array(w), M,
                                  det=False, key=jax.random.PRNGKey(1)))
        assert np.all(s >= edges[:, :1] - 1e-5)
        assert np.all(s <= edges[:, -1:] + 1e-5)

    def test_requires_key_when_stochastic(self):
        bins = jnp.zeros((1, 5))
        w = jnp.ones((1, 4))
        with pytest.raises(ValueError):
            sample_pdf(bins, w, 4, det=False, key=None)

    def test_grad_through_weights_is_finite(self):
        # sample_pdf itself is differentiable (the caller stop_gradients it;
        # reference detaches at rendering.py:225-227).
        bins = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
        w = jnp.ones((2, 8))

        def f(w):
            return jnp.sum(sample_pdf(bins, w, 8, det=True))

        g = jax.grad(f)(w)
        assert np.all(np.isfinite(np.asarray(g)))
