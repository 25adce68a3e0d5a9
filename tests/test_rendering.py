"""Volume renderer tests: quadrature properties with synthetic densities,
plus end-to-end render_rays sanity (shapes, determinism, chunk equivalence)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.models import init_nerf_params
from nerf_pl_tpu.rendering import (ModelConfig, RenderConfig, render_rays,
                                   render_rays_chunked, volume_quadrature)


def make_params(key=0, fine=True):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    p = {"nerf_coarse": init_nerf_params(k1)}
    if fine:
        p["nerf_fine"] = init_nerf_params(k2)
    return p


def make_rays(n=8, near=2.0, far=6.0):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nf = np.concatenate([np.full((n, 1), near), np.full((n, 1), far)], 1)
    return jnp.array(np.concatenate([o, d, nf], 1).astype(np.float32))


class TestQuadrature:
    def test_empty_space_zero_opacity(self):
        R, S = 4, 16
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
        sigmas = jnp.full((R, S), -100.0)  # relu -> 0 density
        out = volume_quadrature(sigmas, z, jnp.ones((R, 1)), None,
                                jnp.ones((R, S, 3)) * 0.5, white_back=False)
        np.testing.assert_allclose(np.asarray(out["opacity"]), 0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["rgb"]), 0, atol=1e-6)

    def test_white_back_fills_empty(self):
        R, S = 4, 16
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
        sigmas = jnp.full((R, S), -100.0)
        out = volume_quadrature(sigmas, z, jnp.ones((R, 1)), None,
                                jnp.zeros((R, S, 3)), white_back=True)
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)

    def test_opaque_wall_depth(self):
        # A dense slab starting at sample k: depth ~ z_k, opacity ~ 1.
        R, S = 2, 64
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
        sigmas = np.full((R, S), -100.0, np.float32)
        k = 20
        sigmas[:, k:] = 1e4
        out = volume_quadrature(jnp.array(sigmas), z, jnp.ones((R, 1)), None,
                                jnp.ones((R, S, 3)), white_back=False)
        np.testing.assert_allclose(np.asarray(out["opacity"]), 1, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["depth"]),
                                   np.asarray(z[:, k]), atol=0.1)

    def test_weights_sum_le_one(self, rng):
        R, S = 16, 32
        z = jnp.broadcast_to(jnp.linspace(1, 5, S), (R, S))
        sigmas = jnp.array(rng.normal(size=(R, S)).astype(np.float32) * 5)
        out = volume_quadrature(sigmas, z, jnp.ones((R, 1)), None, None,
                                white_back=False)
        w = np.asarray(out["weights"])
        assert np.all(w >= 0)
        assert np.all(w.sum(-1) <= 1 + 1e-5)

    def test_direction_norm_scales_deltas(self):
        # Doubling dir norm doubles optical depth -> higher opacity.
        R, S = 1, 16
        z = jnp.broadcast_to(jnp.linspace(2, 6, S), (R, S))
        # last sample empty: the infinite final delta must not saturate
        sigmas = np.full((R, S), 0.5, np.float32)
        sigmas[:, -1] = -100.0
        sigmas = jnp.array(sigmas)
        o1 = volume_quadrature(sigmas, z, jnp.ones((R, 1)), None, None,
                               white_back=False)["opacity"]
        o2 = volume_quadrature(sigmas, z, 2 * jnp.ones((R, 1)), None, None,
                               white_back=False)["opacity"]
        assert float(o2[0]) > float(o1[0])


class TestRenderRays:
    def test_coarse_only_keys_and_shapes(self):
        params = make_params(fine=False)
        rays = make_rays(8)
        cfg = RenderConfig(N_samples=32, N_importance=0)
        out = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        assert set(out) == {"rgb_coarse", "depth_coarse", "opacity_coarse"}
        assert out["rgb_coarse"].shape == (8, 3)
        assert out["depth_coarse"].shape == (8,)

    def test_hierarchical_keys(self):
        params = make_params()
        rays = make_rays(4)
        cfg = RenderConfig(N_samples=16, N_importance=8, perturb=1.0,
                           noise_std=1.0)
        out = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        assert set(out) == {"rgb_coarse", "depth_coarse", "opacity_coarse",
                            "rgb_fine", "depth_fine", "opacity_fine"}

    def test_test_time_sigma_only_coarse(self):
        params = make_params()
        rays = make_rays(4)
        cfg = RenderConfig(N_samples=16, N_importance=8, test_time=True)
        out = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        assert "rgb_coarse" not in out
        assert "opacity_coarse" in out and "rgb_fine" in out

    def test_deterministic_when_no_perturb(self):
        params = make_params()
        rays = make_rays(4)
        cfg = RenderConfig(N_samples=16, N_importance=8)
        o1 = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        o2 = render_rays(params, rays, jax.random.PRNGKey(7), cfg)
        np.testing.assert_allclose(np.asarray(o1["rgb_fine"]),
                                   np.asarray(o2["rgb_fine"]), atol=1e-6)

    def test_perturb_changes_result(self):
        params = make_params(fine=False)
        rays = make_rays(4)
        cfg = RenderConfig(N_samples=16, perturb=1.0)
        o1 = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        o2 = render_rays(params, rays, jax.random.PRNGKey(1), cfg)
        assert not np.allclose(np.asarray(o1["rgb_coarse"]),
                               np.asarray(o2["rgb_coarse"]))

    def test_use_disp_sampling(self):
        params = make_params(fine=False)
        rays = make_rays(4, near=1.0, far=100.0)
        cfg = RenderConfig(N_samples=16, use_disp=True)
        out = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        assert np.all(np.isfinite(np.asarray(out["rgb_coarse"])))

    def test_chunked_equals_direct(self):
        params = make_params()
        rays = make_rays(10)  # not a multiple of chunk -> exercises padding
        cfg = RenderConfig(N_samples=16, N_importance=8)
        direct = render_rays(params, rays, jax.random.PRNGKey(0), cfg)
        chunked = render_rays_chunked(params, rays, jax.random.PRNGKey(0),
                                      cfg, chunk=4)
        for k in direct:
            np.testing.assert_allclose(np.asarray(direct[k]),
                                       np.asarray(chunked[k]), atol=1e-5)

    def test_gradients_flow(self):
        params = make_params()
        rays = make_rays(4)
        cfg = RenderConfig(N_samples=16, N_importance=8, perturb=1.0,
                           noise_std=1.0)

        def loss_fn(p):
            out = render_rays(p, rays, jax.random.PRNGKey(0), cfg)
            return (jnp.mean(out["rgb_coarse"] ** 2)
                    + jnp.mean(out["rgb_fine"] ** 2))

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # Both MLPs receive gradient.
        gc = np.asarray(grads["nerf_coarse"]["xyz_0"]["w"])
        gf = np.asarray(grads["nerf_fine"]["xyz_0"]["w"])
        assert np.abs(gc).max() > 0 and np.abs(gf).max() > 0

    def test_jit_once(self):
        params = make_params(fine=False)
        rays = make_rays(8)
        cfg = RenderConfig(N_samples=16)
        f = jax.jit(render_rays, static_argnames=("cfg", "mcfg"))
        out = f(params, rays, jax.random.PRNGKey(0), cfg, ModelConfig())
        assert out["rgb_coarse"].shape == (8, 3)
