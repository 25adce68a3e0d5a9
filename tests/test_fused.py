"""Pallas fused point-MLP tests (interpreter mode on the CPU mesh):
numerical parity with the reference jnp implementation, gradient parity
against the bf16 path, and renderer integration."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_pl_tpu.models import (EmbeddingConfig, NeRFConfig, embed,
                                init_nerf_params, nerf_apply)
from nerf_pl_tpu.ops.fused_mlp import (nerf_apply_fused, nerf_sigma_fused,
                                       pack_params)
from nerf_pl_tpu.rendering import ModelConfig, RenderConfig, render_rays


def setup():
    params = init_nerf_params(jax.random.PRNGKey(0))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (300, 3)) * 2
    dirs = jax.random.normal(jax.random.PRNGKey(2), (300, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return params, xyz, dirs


class TestFusedForward:
    def test_matches_reference(self):
        params, xyz, dirs = setup()
        x_emb = embed(xyz, EmbeddingConfig(3, 10))
        d_emb = embed(dirs, EmbeddingConfig(3, 4))
        rgb_ref, sig_ref = nerf_apply(params, x_emb, d_emb, NeRFConfig())
        rgb_f, sig_f = nerf_apply_fused(params, xyz, dirs, tile=128)
        # bf16 matmuls: absolute tolerance at bf16 resolution
        np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(sig_f), np.asarray(sig_ref),
                                   atol=5e-3)

    def test_sigma_only_kernel(self):
        params, xyz, _ = setup()
        x_emb = embed(xyz, EmbeddingConfig(3, 10))
        s_ref = nerf_apply(params, x_emb, None, NeRFConfig(),
                           sigma_only=True)
        s_f = nerf_sigma_fused(params, xyz, tile=128)
        np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_ref),
                                   atol=5e-3)

    def test_batch_shapes_and_dir_broadcast(self):
        params, xyz, dirs = setup()
        rgb, sig = nerf_apply_fused(params, xyz.reshape(3, 100, 3),
                                    dirs.reshape(3, 100, 3)[:, :1, :],
                                    tile=128)
        assert rgb.shape == (3, 100, 3) and sig.shape == (3, 100, 1)

    def test_non_tile_multiple_padding(self):
        params, xyz, dirs = setup()  # 300 points, tile 128 -> pad to 384
        rgb, _ = nerf_apply_fused(params, xyz, dirs, tile=128)
        assert rgb.shape == (300, 3)
        assert np.all(np.isfinite(np.asarray(rgb)))


class TestFusedGradients:
    def test_grads_match_bf16_reference(self):
        params, xyz, dirs = setup()
        x_emb = embed(xyz, EmbeddingConfig(3, 10))
        d_emb = embed(dirs, EmbeddingConfig(3, 4))

        def loss_ref(p):
            rgb, sig = nerf_apply(p, x_emb, d_emb, NeRFConfig(),
                                  compute_dtype=jnp.bfloat16)
            return jnp.mean(rgb ** 2) + jnp.mean(jax.nn.relu(sig))

        def loss_f(p):
            rgb, sig = nerf_apply_fused(p, xyz, dirs, tile=128)
            return jnp.mean(rgb ** 2) + jnp.mean(jax.nn.relu(sig))

        g_ref = jax.grad(loss_ref)(params)
        g_f = jax.grad(loss_f)(params)
        for name in g_ref:
            for leaf in ("w", "b"):
                a = np.asarray(g_ref[name][leaf])
                b = np.asarray(g_f[name][leaf])
                rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
                assert rel < 0.02, f"{name}/{leaf}: rel {rel}"

    def test_grad_accumulates_across_tiles(self):
        # Same points twice -> exactly double the gradient.
        params, xyz, dirs = setup()

        def loss(p, pts, ds):
            rgb, _ = nerf_apply_fused(p, pts, ds, tile=128)
            return jnp.sum(rgb)

        g1 = jax.grad(loss)(params, xyz, dirs)
        g2 = jax.grad(loss)(params, jnp.concatenate([xyz, xyz]),
                            jnp.concatenate([dirs, dirs]))
        a = np.asarray(g1["xyz_3"]["w"])
        b = np.asarray(g2["xyz_3"]["w"])
        np.testing.assert_allclose(b, 2 * a, rtol=1e-2, atol=1e-5)


class TestFusedRenderer:
    def test_render_rays_fused_close_to_unfused(self):
        params = {"nerf_coarse": init_nerf_params(jax.random.PRNGKey(0)),
                  "nerf_fine": init_nerf_params(jax.random.PRNGKey(1))}
        rng = np.random.default_rng(0)
        o = rng.normal(size=(64, 3)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.full((64, 1), 2, np.float32),
             np.full((64, 1), 6, np.float32)], 1))
        base = dict(N_samples=16, N_importance=8, white_back=True)
        out_ref = render_rays(params, rays, jax.random.PRNGKey(0),
                              RenderConfig(**base))
        out_f = render_rays(params, rays, jax.random.PRNGKey(0),
                            RenderConfig(**base, fused=True))
        np.testing.assert_allclose(np.asarray(out_f["rgb_fine"]),
                                   np.asarray(out_ref["rgb_fine"]),
                                   atol=2e-2)

    def test_test_time_fused_sigma_path(self):
        params = {"nerf_coarse": init_nerf_params(jax.random.PRNGKey(0)),
                  "nerf_fine": init_nerf_params(jax.random.PRNGKey(1))}
        rng = np.random.default_rng(0)
        o = rng.normal(size=(32, 3)).astype(np.float32)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.full((32, 1), 2, np.float32),
             np.full((32, 1), 6, np.float32)], 1))
        out = render_rays(params, rays, jax.random.PRNGKey(0),
                          RenderConfig(N_samples=16, N_importance=8,
                                       test_time=True, fused=True))
        assert "rgb_coarse" not in out
        assert np.all(np.isfinite(np.asarray(out["rgb_fine"])))

    def test_pack_params_roundtrip_structure(self):
        params = init_nerf_params(jax.random.PRNGKey(0))
        packed = pack_params(params)
        assert len(packed) == 17
        assert packed[4].shape == (7, 256, 256)  # trunk stack
        assert packed[5].shape == (8, 256)       # biases


class TestFusedRenderKernels:
    def _rays(self, R=40, S=32):
        rng = np.random.default_rng(0)
        o = rng.normal(size=(R, 3)).astype(np.float32)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.full((R, 1), 2, np.float32),
             np.full((R, 1), 6, np.float32)], 1))
        z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (R, S))
        return rays, z

    def _dense_params(self, key=0):
        p = init_nerf_params(jax.random.PRNGKey(key))
        # scale sigma head so the field is non-trivially opaque
        p["sigma"]["w"] = p["sigma"]["w"] * 50
        p["sigma"]["b"] = p["sigma"]["b"] + 2.0
        return p

    def test_full_render_matches_quadrature(self):
        from nerf_pl_tpu.ops.fused_render import fused_render_eval
        from nerf_pl_tpu.rendering.render import volume_quadrature
        params = self._dense_params()
        rays, z = self._rays()
        xyz = rays[:, None, :3] + rays[:, None, 3:6] * z[..., None]
        x_emb = embed(xyz, EmbeddingConfig(3, 10))
        d_emb = embed(rays[:, 3:6], EmbeddingConfig(3, 4))
        rgbs, sig = nerf_apply(params, x_emb, d_emb[:, None, :], NeRFConfig())
        dn = jnp.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
        q = volume_quadrature(sig[..., 0], z, dn, None, rgbs, True)
        out = fused_render_eval(params, rays, z, white_back=True,
                                points_per_tile=256)
        np.testing.assert_allclose(np.asarray(out["rgb"]),
                                   np.asarray(q["rgb"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(out["opacity"]),
                                   np.asarray(q["opacity"]), atol=1e-2)

    def test_sigma_render_weights(self):
        from nerf_pl_tpu.ops.fused_render import fused_sigma_render
        from nerf_pl_tpu.rendering.render import volume_quadrature
        params = self._dense_params()
        rays, z = self._rays()
        xyz = rays[:, None, :3] + rays[:, None, 3:6] * z[..., None]
        x_emb = embed(xyz, EmbeddingConfig(3, 10))
        sig = nerf_apply(params, x_emb, None, NeRFConfig(), sigma_only=True)
        dn = jnp.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)
        q = volume_quadrature(sig[..., 0], z, dn, None, None, False)
        w, op = fused_sigma_render(params, rays, z, points_per_tile=256)
        np.testing.assert_allclose(np.asarray(w), np.asarray(q["weights"]),
                                   atol=5e-3)

    def test_render_rays_fused_test_time_path(self):
        params = {"nerf_coarse": self._dense_params(0),
                  "nerf_fine": self._dense_params(1)}
        rays, _ = self._rays()
        base = dict(N_samples=32, N_importance=16, test_time=True,
                    white_back=True)
        o_ref = render_rays(params, rays, jax.random.PRNGKey(0),
                            RenderConfig(**base))
        o_f = render_rays(params, rays, jax.random.PRNGKey(0),
                          RenderConfig(**base, fused=True))
        assert set(o_ref) == set(o_f)
        for k in o_ref:
            np.testing.assert_allclose(np.asarray(o_f[k]),
                                       np.asarray(o_ref[k]), atol=2e-2)

    def test_ray_padding(self):
        from nerf_pl_tpu.ops.fused_render import fused_render_eval
        params = self._dense_params()
        rays, z = self._rays(R=13, S=32)  # not a multiple of the ray tile
        out = fused_render_eval(params, rays, z, white_back=False,
                                points_per_tile=256)
        assert out["rgb"].shape == (13, 3)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))
