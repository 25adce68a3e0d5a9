"""Occupancy-grid empty-space skipping: box building, ray/AABB culling,
and culled-vs-dense render parity on a trained tiny scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.models import EmbeddingConfig, NeRFConfig, init_nerf_params
from nerf_pl_tpu.rendering import (CulledRenderer, ModelConfig, RenderConfig,
                                   build_occupancy_grid, ray_box_hits,
                                   render_rays_chunked)
from nerf_pl_tpu.rendering.occupancy import (OccupancyGrid, _blocks_to_boxes,
                                             _sigma_block_map)


def small_mcfg():
    return ModelConfig(
        nerf=NeRFConfig(D=2, W=32, in_channels_xyz=27, in_channels_dir=15,
                        skips=(1,)),
        emb_xyz=EmbeddingConfig(3, 4),
        emb_dir=EmbeddingConfig(3, 2))


def brute_force_hits(boxes, rays):
    """Numpy reference: per-ray any-box slab test + union interval."""
    o, d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6], rays[:, 7]
    hit = np.zeros(len(rays), bool)
    tlo = np.full(len(rays), np.inf)
    thi = np.full(len(rays), -np.inf)
    for b in boxes:
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (b[0:3] - o) / d
            t2 = (b[3:6] - o) / d
        tmin = np.maximum(np.nanmin([t1, t2], axis=0).max(-1), near)
        tmax = np.minimum(np.nanmax([t1, t2], axis=0).min(-1), far)
        valid = tmax >= tmin
        hit |= valid
        tlo = np.where(valid, np.minimum(tlo, tmin), tlo)
        thi = np.where(valid, np.maximum(thi, tmax), thi)
    return hit, tlo, thi


class TestRayBoxHits:
    def test_matches_brute_force(self, rng):
        boxes = []
        for _ in range(13):
            lo = rng.uniform(-2, 1.5, 3)
            boxes.append(np.concatenate([lo, lo + rng.uniform(0.1, 1.0, 3)]))
        boxes = np.asarray(boxes, np.float32)
        R = 512
        o = rng.normal(size=(R, 3)).astype(np.float32) * 3
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.full((R, 1), 0.1, np.float32),
             np.full((R, 1), 8.0, np.float32)], 1)
        hit, tlo, thi = jax.jit(ray_box_hits)(jnp.asarray(boxes),
                                              jnp.asarray(rays))
        bf_hit, bf_tlo, bf_thi = brute_force_hits(boxes, rays)
        np.testing.assert_array_equal(np.asarray(hit), bf_hit)
        m = bf_hit
        np.testing.assert_allclose(np.asarray(tlo)[m], bf_tlo[m], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(thi)[m], bf_thi[m], rtol=1e-4)

    def test_scan_fallback_matches_unrolled(self, rng):
        """>_UNROLL_BOXES boxes takes the lax.scan path; both paths must
        agree exactly (same math, different scheduling)."""
        from nerf_pl_tpu.rendering import occupancy as occ_mod
        boxes = []
        for _ in range(7):
            lo = rng.uniform(-2, 1.5, 3)
            boxes.append(np.concatenate([lo, lo + rng.uniform(0.1, 1.0, 3)]))
        boxes = jnp.asarray(np.asarray(boxes, np.float32))
        R = 256
        o = rng.normal(size=(R, 3)).astype(np.float32) * 3
        d = rng.normal(size=(R, 3)).astype(np.float32)
        rays = jnp.asarray(np.concatenate(
            [o, d, np.full((R, 1), 0.1, np.float32),
             np.full((R, 1), 8.0, np.float32)], 1))
        unrolled = ray_box_hits(boxes, rays)
        orig = occ_mod._UNROLL_BOXES
        try:
            occ_mod._UNROLL_BOXES = 0
            scanned = ray_box_hits(boxes, rays)
            bits_s = occ_mod.ray_box_segment_bits(boxes, rays, 16)
        finally:
            occ_mod._UNROLL_BOXES = orig
        bits_u = occ_mod.ray_box_segment_bits(boxes, rays, 16)
        for a, b in zip(unrolled, scanned):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(bits_u), np.asarray(bits_s))

    def test_axis_aligned_ray(self):
        boxes = jnp.asarray([[-1, -1, -1, 1, 1, 1]], jnp.float32)
        rays = jnp.asarray([[0, 0, -5, 0, 0, 1, 0.1, 10.0],   # through
                            [0, 3, -5, 0, 0, 1, 0.1, 10.0],   # misses
                            [0, 0, -5, 0, 0, 1, 0.1, 2.0]],   # too short
                           jnp.float32)
        hit, tlo, thi = ray_box_hits(boxes, rays)
        assert list(np.asarray(hit)) == [True, False, False]
        np.testing.assert_allclose(float(tlo[0]), 4.0, atol=1e-5)
        np.testing.assert_allclose(float(thi[0]), 6.0, atol=1e-5)


class TestStableCountingArgsort:
    def test_matches_jnp_stable_argsort(self, rng):
        from nerf_pl_tpu.rendering.occupancy import stable_counting_argsort
        for n_keys in (2, 4, 5):
            key = jnp.asarray(rng.integers(0, n_keys, 1000), jnp.int32)
            got = np.asarray(stable_counting_argsort(key, n_keys))
            want = np.asarray(jnp.argsort(key, stable=True))
            np.testing.assert_array_equal(got, want)

    def test_single_key_is_identity(self):
        from nerf_pl_tpu.rendering.occupancy import stable_counting_argsort
        key = jnp.zeros(17, jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(stable_counting_argsort(key, 1)), np.arange(17))


class TestBoxBuilding:
    def test_boxes_cover_exactly(self, rng):
        """Voxelizing the merged boxes back must reproduce the block map."""
        B = 8
        lo = np.array([-1, -1, -1], np.float32)
        hi = np.array([1, 1, 1], np.float32)
        bm = (rng.random((B, B, B)) < 0.25).astype(np.uint8)
        boxes = _blocks_to_boxes(bm, lo, hi)
        size = (hi - lo) / B
        recon = np.zeros((B, B, B), np.uint8)
        for b in boxes:
            i0 = np.round((b[0:3] - lo) / size).astype(int)
            i1 = np.round((b[3:6] - lo) / size).astype(int)
            assert (recon[i0[0]:i1[0], i0[1]:i1[1], i0[2]:i1[2]] == 0).all(), \
                "boxes overlap"
            recon[i0[0]:i1[0], i0[1]:i1[1], i0[2]:i1[2]] = 1
        np.testing.assert_array_equal(recon, bm)

    def test_merging_reduces_count(self):
        bm = np.zeros((8, 8, 8), np.uint8)
        bm[2:6, 2:6, 2:6] = 1  # solid cube: 16 columns -> merge to 1 box
        boxes = _blocks_to_boxes(bm, np.zeros(3, np.float32),
                                 np.ones(3, np.float32))
        assert len(boxes) == 1
        np.testing.assert_allclose(boxes[0], [0.25, 0.25, 0.25,
                                              0.75, 0.75, 0.75], atol=1e-6)

    def test_empty_map(self):
        boxes = _blocks_to_boxes(np.zeros((4, 4, 4), np.uint8),
                                 np.zeros(3, np.float32),
                                 np.ones(3, np.float32))
        assert boxes.shape == (0, 6)


class TestSigmaBlockMap:
    def test_matches_direct_eval(self, rng):
        """Device block map == numpy-side thresholded+dilated+pooled grid."""
        from nerf_pl_tpu.models.embedding import embed
        from nerf_pl_tpu.models.nerf import nerf_apply
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(3), mcfg.nerf)
        N, block = 8, 4
        lo = jnp.asarray([-1.0, -1.0, -1.0])
        hi = jnp.asarray([1.0, 1.0, 1.0])
        thresh = 0.0  # random init: sigma straddles 0
        bm = np.asarray(_sigma_block_map(params, mcfg, N, block, lo, hi,
                                         thresh, chunk=64))
        # direct reference evaluation
        cell = (np.asarray(hi) - np.asarray(lo)) / N
        ax = np.arange(N)
        ix, iy, iz = np.meshgrid(ax, ax, ax, indexing="ij")
        pts = np.stack([ix, iy, iz], -1).reshape(-1, 3).astype(np.float32)
        xyz = np.asarray(lo) + (pts + 0.5) * cell
        sig = np.asarray(nerf_apply(
            params, embed(jnp.asarray(xyz), cfg=mcfg.emb_xyz), None,
            cfg=mcfg.nerf, sigma_only=True))[..., 0]
        occ = (sig > thresh).reshape(N, N, N)
        dil = occ
        for axis in range(3):
            dil = dil | np.roll(dil, 1, axis) | np.roll(dil, -1, axis)
        B = N // block
        expect = dil.reshape(B, block, B, block, B, block).any(
            axis=(1, 3, 5)).astype(np.uint8)
        np.testing.assert_array_equal(bm, expect)


class TestCoarsenOddN:
    @pytest.mark.filterwarnings("ignore:occupancy grid")
    def test_max_boxes_coarsening_non_power_of_two(self):
        """The box-cap coarsening must stay exact for any N pick_block
        accepts (block*=2 used to crash with a reshape error whenever it
        broke N % block == 0, e.g. N=27 -> block=1 -> 2)."""
        from nerf_pl_tpu.rendering.occupancy import build_occupancy_grid
        mcfg = small_mcfg()
        # random init: sigma straddles 0 -> noisy map with many boxes
        params = init_nerf_params(jax.random.PRNGKey(3), mcfg.nerf)
        occ = build_occupancy_grid(params, mcfg, N=27, block=1,
                                   sigma_threshold=0.0, chunk=729,
                                   max_boxes=4, auto_widen=0)
        # coarsening by the smallest factor of the edge count (27->9->3->1)
        # always terminates; the cap may overshoot only at the 1-block floor
        assert occ.n_boxes <= 4 or occ.block_map.shape == (1, 1, 1)
        assert occ.n_boxes >= 1


class TestResolveRangesArity:
    def test_rejects_wrong_arity(self):
        from nerf_pl_tpu.rendering.occupancy import resolve_ranges
        with pytest.raises(ValueError, match="--occ_range"):
            resolve_ranges([-1.5, 1.5, 2.0], None, None, aabb=None)


class TestCacheKeyAabb:
    def test_auto_key_varies_with_aabb(self, tmp_path):
        """An auto-ranged grid is capped by the caller's viewing-volume
        hull — a grid cached for one pose set must not serve another."""
        from nerf_pl_tpu.rendering.occupancy import _grid_cache_key
        p = tmp_path / "m.ckpt"
        p.write_bytes(b"x")
        a1 = (np.zeros(3, np.float32), np.ones(3, np.float32))
        a2 = (np.zeros(3, np.float32), np.full(3, 2.0, np.float32))
        k1 = _grid_cache_key(str(p), 8, None, 1.0, aabb=a1)
        k2 = _grid_cache_key(str(p), 8, None, 1.0, aabb=a2)
        assert k1 != k2
        # explicit ranges ignore the hull (it does not affect the build)
        e1 = _grid_cache_key(str(p), 8, [-1.5, 1.5], 1.0, aabb=a1)
        e2 = _grid_cache_key(str(p), 8, [-1.5, 1.5], 1.0, aabb=a2)
        assert e1 == e2


class TestBoundaryWarning:
    def test_warns_when_density_reaches_grid_edge(self):
        """Occupied blocks on the grid boundary mean the scene extends past
        `ranges` — out-of-grid rays get silently culled, so the build must
        warn (observed 5 dB loss from a too-narrow --occ_range)."""
        from nerf_pl_tpu.rendering.occupancy import build_occupancy_grid
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        # sigma positive everywhere -> every block occupied incl. boundary
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        with pytest.warns(UserWarning, match="grid boundary"):
            build_occupancy_grid(params, mcfg, N=8, block=4,
                                 sigma_threshold=0.5, chunk=64)


@pytest.mark.slow
class TestCulledRenderParity:
    def test_culled_matches_dense(self, tmp_path):
        """Train a tiny scene, build the grid, culled render ~= dense render
        (the VERDICT PSNR-delta contract, scaled down)."""
        import os
        from nerf_pl_tpu.config import Hparams
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=8,
                                  n_val=1, n_test=1, wh=(20, 20))
        os.chdir(tmp_path)
        hp = Hparams(root_dir=root, dataset_name="blender", img_wh=(20, 20),
                     N_samples=12, N_importance=6, perturb=1.0,
                     noise_std=1.0, batch_size=256, num_epochs=12,
                     lr=7e-4, decay_step=[100], scan_steps=96,
                     val_chunk=400, exp_name="occ_e2e")
        system = NeRFSystem(hp, enable_tb=False)
        system.fit()
        params_full = {k: v for k, v in system.state.params.items()}

        occ = build_occupancy_grid(
            params_full["nerf_fine"], system.mcfg, N=32, block=4,
            ranges=(-1.6, 1.6), sigma_threshold=0.5, chunk=2048)
        assert 0 < occ.n_boxes <= 512
        assert 0 < occ.occupied_fraction < 1.0

        rcfg = RenderConfig(N_samples=12, N_importance=6, test_time=True,
                            white_back=True)
        sample = system.val_dataset[0]
        rays = jnp.asarray(sample["rays"])
        dense = render_rays_chunked(params_full, rays, jax.random.PRNGKey(0),
                                    rcfg, system.mcfg, chunk=400)
        culled = CulledRenderer(occ, rcfg, system.mcfg, chunk=100)
        out, stats = culled(params_full, rays, return_stats=True)
        assert 0 < stats["n_survivors"] <= stats["n_rays"]

        rgb_d = np.asarray(dense["rgb_fine"])
        rgb_c = np.asarray(out["rgb_fine"])
        mse_delta = float(np.mean((rgb_d - rgb_c) ** 2))
        # culled pixels replace near-background values with exact background
        assert mse_delta < 1e-4, f"culled render deviates: mse {mse_delta}"
        # and the GT-PSNR must be essentially unchanged
        gt = np.asarray(sample["rgbs"])
        psnr = lambda a: -10 * np.log10(np.mean((a - gt) ** 2))
        assert abs(psnr(rgb_c) - psnr(rgb_d)) < 0.05


class TestPickBlock:
    def test_divisor_property(self):
        from nerf_pl_tpu.rendering import pick_block
        for N in (128, 100, 96, 64, 17, 16, 8, 3, 1):
            b = pick_block(N)
            assert N % b == 0 and b >= 1
        assert pick_block(128) == 8
        assert pick_block(100) == 5   # largest divisor <= 100//16 = 6
        assert pick_block(17) == 1


class TestRaysAabb:
    def test_hand_values(self):
        from nerf_pl_tpu.rendering import rays_aabb
        rays = np.asarray([
            [0, 0, 0,  1, 0, 0,  1.0, 3.0],    # spans x in [1, 3]
            [0, 2, 0,  0, -1, 0, 0.5, 2.5],    # spans y in [-0.5, 1.5]
        ], np.float32)
        lo, hi = rays_aabb(rays)
        np.testing.assert_allclose(lo, [0, -0.5, 0], atol=1e-6)
        np.testing.assert_allclose(hi, [3, 1.5, 0], atol=1e-6)


class TestAutoRanges:
    def test_dense_model_refits_inside_aabb(self):
        """sigma > threshold everywhere -> refit box clamps to the probe
        AABB (nothing outside the viewing volume is reachable by a ray)."""
        from nerf_pl_tpu.rendering import auto_ranges
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        aabb = (np.full(3, -2, np.float32), np.full(3, 2, np.float32))
        lo, hi = auto_ranges(params, mcfg, aabb, sigma_threshold=0.5,
                             probe_N=8)
        np.testing.assert_allclose(lo, -2, atol=1e-5)
        np.testing.assert_allclose(hi, 2, atol=1e-5)

    def test_empty_model_returns_aabb(self):
        from nerf_pl_tpu.rendering import auto_ranges
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] - 50.0
        aabb = (np.full(3, -2, np.float32), np.full(3, 2, np.float32))
        lo, hi = auto_ranges(params, mcfg, aabb, sigma_threshold=0.5,
                             probe_N=8)
        np.testing.assert_allclose(lo, aabb[0])
        np.testing.assert_allclose(hi, aabb[1])


class TestAutoWiden:
    def test_widens_on_boundary_contact(self):
        """Density reaching the grid edge auto-widens the box 1.3x per
        attempt before warning (the 5 dB --occ_range footgun, now
        self-correcting)."""
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0  # dense everywhere
        with pytest.warns(UserWarning, match="auto-widen"):
            occ = build_occupancy_grid(params, mcfg, N=8, block=4,
                                       ranges=(-1.0, 1.0),
                                       sigma_threshold=0.5, chunk=64,
                                       auto_widen=2)
        np.testing.assert_allclose(occ.lo, -1.69, atol=1e-5)
        np.testing.assert_allclose(occ.hi, 1.69, atol=1e-5)

    def test_no_widen_when_interior(self):
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] - 50.0  # empty
        occ = build_occupancy_grid(params, mcfg, N=8, block=4,
                                   ranges=(-1.0, 1.0),
                                   sigma_threshold=0.5, chunk=64)
        np.testing.assert_allclose(occ.lo, -1.0)
        np.testing.assert_allclose(occ.hi, 1.0)


class TestGridCache:
    def test_roundtrip_and_key_invalidation(self, tmp_path):
        from nerf_pl_tpu.rendering import load_or_build_grid
        from nerf_pl_tpu.rendering.occupancy import grid_cache_path
        import os
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        ckpt = tmp_path / "model.ckpt"
        ckpt.write_bytes(b"fake")
        occ1 = load_or_build_grid(str(ckpt), params, mcfg, N=8,
                                  occ_range=(-1.0, 1.0),
                                  sigma_threshold=0.5, verbose=False)
        import glob
        caches = glob.glob(grid_cache_path(str(ckpt)).replace(
            ".occ.npz", ".occ.*.npz"))
        assert len(caches) == 1    # per-key cache file (round 5)
        cache = caches[0]
        mtime = os.path.getmtime(cache)
        occ2 = load_or_build_grid(str(ckpt), params, mcfg, N=8,
                                  occ_range=(-1.0, 1.0),
                                  sigma_threshold=0.5, verbose=False)
        assert os.path.getmtime(cache) == mtime    # not rebuilt
        np.testing.assert_array_equal(occ1.boxes, occ2.boxes)
        np.testing.assert_array_equal(occ1.block_map, occ2.block_map)
        # different settings invalidate the cache
        occ3 = load_or_build_grid(str(ckpt), params, mcfg, N=16,
                                  occ_range=(-1.0, 1.0),
                                  sigma_threshold=0.5, verbose=False)
        assert occ3.block_map.shape != occ1.block_map.shape

    def test_stale_siblings_pruned_on_retrain(self, tmp_path):
        """Per-key cache files embed the ckpt mtime, so a retrain makes
        the old files permanently unmatchable — a rebuild prunes them
        (else they accumulate unbounded) while KEEPING same-mtime
        siblings (occ_N sweeps of the live checkpoint)."""
        from nerf_pl_tpu.rendering import load_or_build_grid
        import glob
        import os
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        ckpt = tmp_path / "model.ckpt"
        ckpt.write_bytes(b"fake")
        kw = dict(occ_range=(-1.0, 1.0), sigma_threshold=0.5, verbose=False)
        load_or_build_grid(str(ckpt), params, mcfg, N=8, **kw)
        load_or_build_grid(str(ckpt), params, mcfg, N=16, **kw)
        pat = str(ckpt) + ".occ.*.npz"
        assert len(glob.glob(pat)) == 2          # sweep siblings coexist
        # retrain: same bytes, new mtime -> every old key is dead
        os.utime(ckpt, ns=(os.stat(ckpt).st_atime_ns,
                           os.stat(ckpt).st_mtime_ns + 1_000_000))
        load_or_build_grid(str(ckpt), params, mcfg, N=8, **kw)
        left = glob.glob(pat)
        assert len(left) == 1                    # both stale files pruned
        z = np.load(left[0], allow_pickle=False)
        assert str(z["key"]).startswith(
            f"{os.stat(ckpt).st_mtime_ns}:{os.stat(ckpt).st_size}:")

    def test_glob_metachar_ckpt_path_is_literal(self, tmp_path):
        """A checkpoint named like 'sweep[lr].ckpt' must prune only ITS
        cache files: an unescaped glob would expand '[lr]' to the
        character class {l,r} and match (then delete) sweepl.ckpt's
        caches."""
        from nerf_pl_tpu.rendering import load_or_build_grid
        import glob
        import os
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        kw = dict(occ_range=(-1.0, 1.0), sigma_threshold=0.5, verbose=False)
        victim = tmp_path / "sweepl.ckpt"
        victim.write_bytes(b"fake")
        load_or_build_grid(str(victim), params, mcfg, N=8, **kw)
        vcache = glob.glob(glob.escape(str(victim)) + ".occ.*.npz")
        assert len(vcache) == 1
        meta = tmp_path / "sweep[lr].ckpt"
        meta.write_bytes(b"fake")
        load_or_build_grid(str(meta), params, mcfg, N=8, **kw)
        # retrain the metachar ckpt: its prune sweep runs with a live
        # cache file of its own; the victim's cache must survive
        os.utime(meta, ns=(os.stat(meta).st_atime_ns,
                           os.stat(meta).st_mtime_ns + 1_000_000))
        load_or_build_grid(str(meta), params, mcfg, N=8, **kw)
        assert os.path.exists(vcache[0]), \
            "sibling checkpoint's cache deleted by unescaped glob"
        assert len(glob.glob(glob.escape(str(meta)) + ".occ.*.npz")) == 1

    def test_legacy_keyless_cache_swept_when_stale(self, tmp_path):
        """Pre-round-5 keyless cache files (ckpt + '.occ.npz') join the
        staleness sweep: kept while their embedded key matches the live
        checkpoint, deleted once a retrain orphans them."""
        from nerf_pl_tpu.rendering import load_or_build_grid
        from nerf_pl_tpu.rendering.occupancy import grid_cache_path
        import os
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        kw = dict(occ_range=(-1.0, 1.0), sigma_threshold=0.5, verbose=False)
        ckpt = tmp_path / "model.ckpt"
        ckpt.write_bytes(b"fake")
        legacy = grid_cache_path(str(ckpt))
        np.savez(legacy, key="0:0:dead", boxes=np.zeros((1, 6), np.float32),
                 block_map=np.zeros((2, 2, 2), bool),
                 lo=np.zeros(3, np.float32), hi=np.ones(3, np.float32))
        load_or_build_grid(str(ckpt), params, mcfg, N=8, **kw)
        assert not os.path.exists(legacy), "stale legacy cache kept"


class TestCulledMesh:
    def test_mesh_sharded_matches_single(self):
        """--occ_grid composes with --num_chips: the mesh-sharded culled
        renderer must reproduce the single-chip culled output exactly."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from nerf_pl_tpu.parallel import make_mesh
        mcfg = small_mcfg()
        params_one = init_nerf_params(jax.random.PRNGKey(2), mcfg.nerf)
        params = {"nerf_coarse": params_one, "nerf_fine": params_one}
        occ = OccupancyGrid(
            boxes=np.asarray([[-1, -1, -1, 1, 1, 1],
                              [1.5, 1.5, 1.5, 2.0, 2.0, 2.0]], np.float32),
            block_map=np.ones((2, 2, 2), np.uint8),
            lo=np.full(3, -1, np.float32), hi=np.full(3, 2, np.float32))
        rng = np.random.default_rng(0)
        R = 1600
        o = rng.normal(size=(R, 3)).astype(np.float32) * 2
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.full((R, 1), 0.1, np.float32),
             np.full((R, 1), 8.0, np.float32)], 1)
        rcfg = RenderConfig(N_samples=8, N_importance=4, test_time=True)
        single = CulledRenderer(occ, rcfg, mcfg, chunk=100)
        out_s, st_s = single(params, jnp.asarray(rays), return_stats=True)
        mesh = make_mesh(num_data=8)
        params_r = jax.device_put(params, NamedSharding(mesh, P()))
        sharded = CulledRenderer(occ, rcfg, mcfg, chunk=100, mesh=mesh)
        out_m, st_m = sharded(params_r, jnp.asarray(rays), return_stats=True)
        assert st_s["n_survivors"] == st_m["n_survivors"]
        assert st_m["n_rendered"] % (8 * 100) == 0
        # Content parity on SURVIVING rays, judged against the dense render
        # (rays the grid culls may or may not fall inside a run's rendered
        # prefix — with this random-init model they render non-background,
        # which is exactly the near-parity caveat, so exclude them).
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        assert hit.sum() == st_s["n_survivors"]
        dense = render_rays_chunked(params, jnp.asarray(rays),
                                    jax.random.PRNGKey(0), rcfg, mcfg,
                                    chunk=100)
        # loose tolerance: different tile counts compile different XLA
        # programs whose float drift the inverse-CDF resampler amplifies
        for out in (out_s, out_m):
            for k in out:
                np.testing.assert_allclose(np.asarray(out[k])[hit],
                                           np.asarray(dense[k])[hit],
                                           atol=5e-3, rtol=5e-3)

    def test_mesh_sharded_budgets_segments_matches_single(self):
        """The full eval ladder (tighten+budgets+segments — the eval.py
        --occ_budgets --occ_segments path) sharded over the 8-device mesh
        reproduces the single-chip ladder on surviving rays."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from nerf_pl_tpu.parallel import make_mesh
        mcfg = small_mcfg()
        params_one = init_nerf_params(jax.random.PRNGKey(2), mcfg.nerf)
        params = {"nerf_coarse": params_one, "nerf_fine": params_one}
        occ = OccupancyGrid(
            boxes=np.asarray([[-0.2, -0.2, -0.2, 0.2, 0.2, 0.2],
                              [-2, -2, 2.0, 2, 2, 2.4]], np.float32),
            block_map=np.ones((2, 2, 2), np.uint8),
            lo=np.full(3, -2, np.float32), hi=np.full(3, 2.4, np.float32))
        rng = np.random.default_rng(1)
        R = 1600
        o = rng.normal(size=(R, 3)).astype(np.float32) * 2
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o[rng.random(R) < 0.2, 0] = 5.0   # miss rays
        rays = np.concatenate(
            [o, d, np.full((R, 1), 0.1, np.float32),
             np.full((R, 1), 10.0, np.float32)], 1)
        rcfg = RenderConfig(N_samples=16, N_importance=8, test_time=True)
        kw = dict(tighten=True, budgets=True, segments=16)
        single = CulledRenderer(occ, rcfg, mcfg, chunk=100, **kw)
        out_s, st_s = single(params, jnp.asarray(rays), return_stats=True)
        mesh = make_mesh(num_data=8)
        params_r = jax.device_put(params, NamedSharding(mesh, P()))
        sharded = CulledRenderer(occ, rcfg, mcfg, chunk=100, mesh=mesh, **kw)
        out_m, st_m = sharded(params_r, jnp.asarray(rays), return_stats=True)
        assert st_s["n_survivors"] == st_m["n_survivors"]
        assert sum(st_m["bucket_counts"]) == st_m["n_survivors"]
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        for k in out_s:
            a = np.asarray(out_m[k])[hit]
            b = np.asarray(out_s[k])[hit]
            # different tile counts compile different programs; budget
            # bucketing amplifies fp drift through the inverse-CDF
            assert np.mean((a - b) ** 2) < 1e-3, k

    def test_widen_capped_at_viewing_volume(self):
        """With max_ranges (the rays' AABB), boundary contact at the cap is
        harmless (nothing outside is reachable): no widen past it, no
        warning."""
        import warnings as _w
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(0), mcfg.nerf)
        params["sigma"]["b"] = params["sigma"]["b"] + 50.0
        cap = (np.full(3, -1.2, np.float32), np.full(3, 1.2, np.float32))
        with _w.catch_warnings():
            _w.simplefilter("error")
            occ = build_occupancy_grid(params, mcfg, N=8, block=4,
                                       ranges=(-1.0, 1.0),
                                       sigma_threshold=0.5, chunk=64,
                                       auto_widen=2, max_ranges=cap)
        np.testing.assert_allclose(occ.lo, -1.2, atol=1e-5)
        np.testing.assert_allclose(occ.hi, 1.2, atol=1e-5)


class TestBudgetedRenderer:
    def _setup(self):
        """Random-init model with an artificial 2-box grid; rays split into
        short-span (through the small box) and full-span groups."""
        mcfg = small_mcfg()
        p1 = init_nerf_params(jax.random.PRNGKey(2), mcfg.nerf)
        params = {"nerf_coarse": p1, "nerf_fine": p1}
        occ = OccupancyGrid(
            boxes=np.asarray([[-0.2, -0.2, -0.2, 0.2, 0.2, 0.2],
                              [-2, -2, 2.0, 2, 2, 2.4]], np.float32),
            block_map=np.ones((2, 2, 2), np.uint8),
            lo=np.full(3, -2, np.float32), hi=np.full(3, 2.4, np.float32))
        rng = np.random.default_rng(1)
        R = 800
        o = np.zeros((R, 3), np.float32)
        o[:, 2] = -5.0
        d = np.zeros((R, 3), np.float32)
        d[:, 2] = 1.0
        # half the rays offset to x=1 (hit only the big slab: longer span
        # relative to... both boxes are crossed quickly by +z rays, so
        # randomize some rays to miss everything via x=5
        o[rng.random(R) < 0.3, 0] = 1.0   # slab-only rays
        o[rng.random(R) < 0.2, 0] = 5.0   # miss rays
        rays = np.concatenate(
            [o, d, np.full((R, 1), 0.1, np.float32),
             np.full((R, 1), 10.0, np.float32)], 1)
        rcfg = RenderConfig(N_samples=64, N_importance=32, test_time=True)
        return mcfg, params, occ, rays, rcfg

    def test_buckets_and_quality(self):
        mcfg, params, occ, rays, rcfg = self._setup()
        cr = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                            budgets=True)
        out, st = cr(params, jnp.asarray(rays), return_stats=True)
        assert sum(st["bucket_counts"]) == st["n_survivors"]
        # short-span rays exist (0.4-long box over a 9.9 interval -> <1/4)
        assert st["bucket_counts"][0] > 0
        # budget render must track the full-sample tightened render closely
        # on SURVIVORS (misses: budgets give exact background, while the
        # full path's tile-rounding spillover renders some of them — its
        # documented near-parity quirk)
        cr_full = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True)
        ref, _ = cr_full(params, jnp.asarray(rays), return_stats=True)
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        for k in out:
            a, b = np.asarray(out[k])[hit], np.asarray(ref[k])[hit]
            assert np.mean((a - b) ** 2) < 1e-3, (k, np.mean((a - b) ** 2))
        # and misses keep the exact analytic background
        bg = np.asarray(out["rgb_fine"])[~hit]
        np.testing.assert_array_equal(bg, np.zeros_like(bg))

    def test_bucket_chunk_cost_capped(self):
        """Buckets costlier than _TILE_COST_REF samples/ray render in
        proportionally smaller ray tiles (tail tiles pad fewer wasted
        point-evals; working sets stay VMEM-friendly); cheap buckets keep
        full-size tiles. Multiples of 8, floored at 2048, never above the
        base chunk."""
        mcfg, params, occ, rays, rcfg = self._setup()
        cr = CulledRenderer(occ, rcfg, mcfg, chunk=40960, tighten=True,
                            budgets=True)
        # costs (N_s+N_i after frac scaling, floors at 8): 0.25 -> 16+8,
        # 0.5 -> 32+16, 1.0 -> 64+32
        assert cr._bucket_cost(0.25) == 24
        assert cr._bucket_cost(0.5) == 48
        assert cr._bucket_cost(1.0) == 96
        assert cr._chunk_for_bucket(40960, 0.25) == 40960  # cheap: full
        assert cr._chunk_for_bucket(40960, 0.5) == 27312   # 40960*32/48
        assert cr._chunk_for_bucket(40960, 1.0) == 13656   # 40960*32/96
        # multiple of 8, capped at chunk, floored at 2048
        assert cr._chunk_for_bucket(40960, 1.0) % 8 == 0
        assert cr._chunk_for_bucket(1000, 1.0) == 1000   # tiny chunk wins
        assert cr._chunk_for_bucket(4096, 1.0) == 2048   # floor engages
        # end-to-end at a size where the buckets really run with DIFFERENT
        # tile sizes (R > chunk so _chunk_for keeps 4096; frac 0.5 -> 2048,
        # frac 1.0 -> 2048 floor): exercises the dynamic-slice bounds of
        # the smaller-chunk programs against the shared padded arrays.
        big = np.tile(rays, (8, 1))                      # R = 6400 > 4096
        cr2 = CulledRenderer(occ, rcfg, mcfg, chunk=4096, tighten=True,
                             budgets=True)
        out, st = cr2(params, jnp.asarray(big), return_stats=True)
        assert sum(st["bucket_counts"]) == st["n_survivors"]
        assert st["n_rendered"] >= st["n_survivors"]
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(big))[0])
        bg = np.asarray(out["rgb_fine"])[~hit]
        np.testing.assert_array_equal(bg, np.zeros_like(bg))

    def test_budgets_require_tighten(self):
        mcfg, params, occ, rays, rcfg = self._setup()
        with pytest.raises(ValueError, match="tighten"):
            CulledRenderer(occ, rcfg, mcfg, budgets=True)

    def test_custom_bucket_fracs(self):
        """A 4-bucket ladder (extra 0.125 tier) renders survivors to the
        same values as the default 3-bucket one within budget tolerance,
        and bucket counts cover all survivors."""
        mcfg, params, occ, rays, rcfg = self._setup()
        cr = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                            budgets=True,
                            bucket_fracs=(0.125, 0.25, 0.5, 1.0))
        out, st = cr(params, jnp.asarray(rays), return_stats=True)
        assert len(st["bucket_counts"]) == 4
        assert sum(st["bucket_counts"]) == st["n_survivors"]
        cr_ref = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                                budgets=True)
        ref, _ = cr_ref(params, jnp.asarray(rays), return_stats=True)
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        for k in out:
            a, b = np.asarray(out[k])[hit], np.asarray(ref[k])[hit]
            assert np.mean((a - b) ** 2) < 1e-3, (k, np.mean((a - b) ** 2))

    def test_bucket_fracs_must_end_at_one(self):
        mcfg, params, occ, rays, rcfg = self._setup()
        with pytest.raises(ValueError, match="bucket_fracs"):
            CulledRenderer(occ, rcfg, mcfg, tighten=True, budgets=True,
                           bucket_fracs=(0.25, 0.5))

    def test_bucket_fracs_require_budgets(self):
        """bucket_fracs without budgets=True is a silent no-op -> reject."""
        mcfg, params, occ, rays, rcfg = self._setup()
        with pytest.raises(ValueError, match="budgets"):
            CulledRenderer(occ, rcfg, mcfg, tighten=True,
                           bucket_fracs=(0.25, 0.5, 1.0))

    def test_chunk_floor_rejected(self):
        """chunk=0 must be an error, not silently coerced to a default
        (ray tiles are 8-row-aligned; CLIs translate 'unset' themselves)."""
        mcfg, params, occ, rays, rcfg = self._setup()
        with pytest.raises(ValueError, match="chunk"):
            CulledRenderer(occ, rcfg, mcfg, chunk=0, tighten=True)

    def test_bucket_fracs_deduplicated(self):
        """Duplicate fracs would create permanently-empty buckets; the
        constructor normalizes (sort + dedupe) instead."""
        mcfg, params, occ, rays, rcfg = self._setup()
        cr = CulledRenderer(occ, rcfg, mcfg, tighten=True, budgets=True,
                            bucket_fracs=(0.5, 1.0, 0.5, 0.25))
        assert cr._BUCKET_FRACS == (0.25, 0.5, 1.0)


class TestSegmentBits:
    """Per-ray occupied-segment masks (ray_box_segment_bits) and the
    inverse-CDF sample placement driven by them (occupied_z_vals)."""

    def _rays_boxes(self, R=64, S=32, seed=0):
        rng = np.random.default_rng(seed)
        rays = np.zeros((R, 8), np.float32)
        rays[:, 0:3] = rng.normal(0, 2, (R, 3))
        d = rng.normal(0, 1, (R, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays[:, 3:6] = d
        rays[:, 6], rays[:, 7] = 0.5, 6.0
        boxes = np.array([[-1, -1, -1, 1, 1, 1],
                          [2, 2, 2, 3, 3, 3]], np.float32)
        return rays, boxes

    def test_bits_cover_brute_force(self):
        from nerf_pl_tpu.rendering.occupancy import (ray_box_segment_bits,
                                                     unpack_segment_bits)
        S = 32
        rays, boxes = self._rays_boxes(S=S)
        mask = np.asarray(ray_box_segment_bits(
            jnp.asarray(boxes), jnp.asarray(rays), S))
        bits = np.asarray(unpack_segment_bits(jnp.asarray(mask), S)) > 0.5
        # densely point-sampled reference: every segment containing an inside
        # point must be marked (the analytic test may mark MORE — grazing
        # overlaps — never less)
        for i in range(len(rays)):
            r = rays[i]
            near, far = r[6], r[7]
            h = (far - near) / S
            ts = np.linspace(near, far, 4000)
            pts = r[0:3] + np.outer(ts, r[3:6])
            ref = np.zeros(S, bool)
            for b in boxes:
                inside = np.all((pts >= b[0:3]) & (pts <= b[3:6]), axis=1)
                seg = np.clip(((ts - near) / h).astype(int), 0, S - 1)
                np.logical_or.at(ref, seg[inside], True)
            if not ref.any():
                ref[:] = True                       # miss -> all-ones
            assert not (ref & ~bits[i]).any(), f"ray {i} missing segments"

    def test_miss_rays_get_all_ones(self):
        from nerf_pl_tpu.rendering.occupancy import ray_box_segment_bits
        rays = np.zeros((8, 8), np.float32)
        rays[:, 0] = 100.0                          # far from every box
        rays[:, 5] = 1.0
        rays[:, 6], rays[:, 7] = 1.0, 2.0
        boxes = np.array([[-1, -1, -1, 1, 1, 1]], np.float32)
        mask = np.asarray(ray_box_segment_bits(
            jnp.asarray(boxes), jnp.asarray(rays), 32))
        assert np.all(mask == np.uint32(0xFFFFFFFF))

    def test_placement_concentrates_in_occupied(self):
        from nerf_pl_tpu.rendering.occupancy import (ray_box_segment_bits,
                                                     unpack_segment_bits)
        from nerf_pl_tpu.rendering.render import occupied_z_vals
        S, N = 32, 32
        rays, boxes = self._rays_boxes(S=S)
        mask = ray_box_segment_bits(jnp.asarray(boxes), jnp.asarray(rays), S)
        z = np.asarray(occupied_z_vals(
            jnp.asarray(rays), mask, S, N, 1.0, jax.random.PRNGKey(1)))
        assert np.all(np.diff(z, axis=1) >= -1e-5), "z not ascending"
        near, far = rays[:, 6:7], rays[:, 7:8]
        assert z.min() >= near.min() - 1e-4 and z.max() <= far.max() + 1e-4
        bits = np.asarray(unpack_segment_bits(mask, S)) > 0.5
        seg = np.clip(((z - near) / ((far - near) / S)).astype(int), 0, S - 1)
        in_occ = np.take_along_axis(bits, seg, axis=1)
        assert in_occ.mean() > 0.999

    def test_placement_keepalive_mixture(self):
        from nerf_pl_tpu.rendering.occupancy import (ray_box_segment_bits,
                                                     unpack_segment_bits)
        from nerf_pl_tpu.rendering.render import occupied_z_vals
        S, N = 32, 64
        rays, boxes = self._rays_boxes(S=S)
        mask = ray_box_segment_bits(jnp.asarray(boxes), jnp.asarray(rays), S)
        args = (jnp.asarray(rays), mask, S, N, 1.0, jax.random.PRNGKey(1))
        z0 = np.asarray(occupied_z_vals(*args, keepalive=0.0))
        zd = np.asarray(occupied_z_vals(*args))
        np.testing.assert_array_equal(z0, zd)       # 0 == default == off
        k = 0.25
        zk = np.asarray(occupied_z_vals(*args, keepalive=k))
        assert np.all(np.diff(zk, axis=1) >= -1e-5), "z not ascending"
        near, far = rays[:, 6:7], rays[:, 7:8]
        assert zk.min() >= near.min() - 1e-4 and zk.max() <= far.max() + 1e-4
        bits = np.asarray(unpack_segment_bits(mask, S)) > 0.5
        seg = np.clip(((zk - near) / ((far - near) / S)).astype(int),
                      0, S - 1)
        in_occ = np.take_along_axis(bits, seg, axis=1)
        # rays with at least one empty segment should place ~k of their
        # samples outside occupied segments: k * (1 - n_occ/S) of the mass
        partial = ~bits.all(axis=1)
        assert partial.any()
        n_occ = bits[partial].sum(axis=1)
        expect_out = k * (1.0 - n_occ / S)
        got_out = 1.0 - in_occ[partial].mean(axis=1)
        assert np.abs(got_out - expect_out).mean() < 0.05
        # occupied segments still get the dominant share
        assert in_occ[partial].mean() > 0.6

    def test_placement_det_and_uniform_fallback(self):
        from nerf_pl_tpu.rendering.render import occupied_z_vals
        R, S, N = 16, 32, 64
        rays = np.zeros((R, 8), np.float32)
        rays[:, 5] = 1.0
        rays[:, 6], rays[:, 7] = 2.0, 6.0
        m1 = jnp.full((R,), 0xFFFFFFFF, jnp.uint32)
        z_a = np.asarray(occupied_z_vals(jnp.asarray(rays), m1, S, N, 0.0,
                                         jax.random.PRNGKey(0)))
        z_b = np.asarray(occupied_z_vals(jnp.asarray(rays), m1, S, N, 0.0,
                                         jax.random.PRNGKey(9)))
        np.testing.assert_array_equal(z_a, z_b)     # det ignores the key
        # all-ones mask ~ uniform stratum-midpoint coverage of [near, far]
        expect = 2.0 + (np.arange(N) + 0.5) / N * 4.0
        assert np.abs(z_a - expect).max() < 1e-4


class TestSegmentRenderer:
    """CulledRenderer(segments=N): occupied-segment z placement at
    inference + occupied-length budget keying + mask dilation."""

    def _setup(self):
        return TestBudgetedRenderer._setup(self)

    def test_dilate_bits(self):
        from nerf_pl_tpu.rendering.occupancy import (dilate_segment_bits,
                                                     unpack_segment_bits)
        m = jnp.asarray([0b00100, 0b10001, 0b11111, 0], jnp.uint32)
        d = np.asarray(unpack_segment_bits(
            dilate_segment_bits(m, 5), 5)).astype(int)
        np.testing.assert_array_equal(d[0], [0, 1, 1, 1, 0])
        np.testing.assert_array_equal(d[1], [1, 1, 0, 1, 1])
        np.testing.assert_array_equal(d[2], [1, 1, 1, 1, 1])
        np.testing.assert_array_equal(d[3], [0, 0, 0, 0, 0])
        # bit n_seg-1 never leaks past the valid width
        m2 = jnp.asarray([1 << 4], jnp.uint32)
        d2 = np.asarray(dilate_segment_bits(m2, 5))
        assert d2[0] == (1 << 4) | (1 << 3)

    def test_segments_quality_and_background(self):
        mcfg, params, occ, rays, rcfg = self._setup()
        cr = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                            segments=32)
        out, st = cr(params, jnp.asarray(rays), return_stats=True)
        cr_full = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True)
        ref, _ = cr_full(params, jnp.asarray(rays), return_stats=True)
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        # segment placement concentrates samples differently, so compare
        # loosely on survivors — both are renders of the same smooth
        # random-init field
        for k in out:
            a, b = np.asarray(out[k])[hit], np.asarray(ref[k])[hit]
            assert np.mean((a - b) ** 2) < 5e-3, (k, np.mean((a - b) ** 2))
        # (no background assertion here: the non-budget path's tile-rounding
        # spillover renders some culled rays — documented near-parity quirk)

    def test_segments_tighten_budget_key(self):
        """A two-box ray (small box + far slab, big interior gap) has a
        LONG span but SHORT occupied length: segment keying must place it
        in a cheaper bucket than span keying does."""
        mcfg, params, occ, rays, rcfg = self._setup()
        cr_span = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                                 budgets=True)
        cr_seg = CulledRenderer(occ, rcfg, mcfg, chunk=100, tighten=True,
                                budgets=True, segments=32)
        _, st_span = cr_span(params, jnp.asarray(rays), return_stats=True)
        out, st_seg = cr_seg(params, jnp.asarray(rays), return_stats=True)
        assert sum(st_seg["bucket_counts"]) == st_seg["n_survivors"]
        # segment keying strictly moves rays toward cheaper buckets
        assert st_seg["bucket_counts"][0] >= st_span["bucket_counts"][0]
        assert st_seg["n_rendered"] <= st_span["n_rendered"]
        # both-box rays (x=0): occupied ~0.8+2*dilation of a ~9.9 span ->
        # cheapest bucket even though their span ratio is ~0.27
        assert st_seg["bucket_counts"][0] > st_seg["n_survivors"] // 2
        # budgets path gives culled rays the exact analytic background
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        bg = np.asarray(out["rgb_fine"])[~hit]
        np.testing.assert_array_equal(bg, np.zeros_like(bg))

    def test_segments_require_tighten(self):
        mcfg, params, occ, rays, rcfg = self._setup()
        with pytest.raises(ValueError, match="tighten"):
            CulledRenderer(occ, rcfg, mcfg, segments=32)


class TestPadBoxes:
    """Zero-volume pad boxes at 1e8 (spmd.tighten_store box-count
    bucketing) must be invisible to hits and segment masks."""

    def test_pad_invisible(self):
        from nerf_pl_tpu.rendering.occupancy import (ray_box_hits,
                                                     ray_box_segment_bits)
        rng = np.random.default_rng(0)
        o = rng.normal(size=(128, 3)).astype(np.float32)
        d = rng.normal(size=(128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.full((128, 1), 0.1, np.float32),
             np.full((128, 1), 10.0, np.float32)], 1)
        box = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        pad = np.full((63, 6), 1e8, np.float32)
        both = np.concatenate([box, pad], 0)
        h1, a1, b1 = ray_box_hits(jnp.asarray(box), jnp.asarray(rays))
        h2, a2, b2 = ray_box_hits(jnp.asarray(both), jnp.asarray(rays))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        hit = np.asarray(h1)
        np.testing.assert_allclose(np.asarray(a1)[hit], np.asarray(a2)[hit])
        np.testing.assert_allclose(np.asarray(b1)[hit], np.asarray(b2)[hit])
        m1 = ray_box_segment_bits(jnp.asarray(box), jnp.asarray(rays), 32)
        m2 = ray_box_segment_bits(jnp.asarray(both), jnp.asarray(rays), 32)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


class TestWeightMode:
    """Visibility-pruned (weight-mode) block maps: junk density behind an
    opaque surface prunes away, unoccluded density reduces to the plain
    sigma test, and cells no marched ray reaches are culled."""

    N, BLOCK = 32, 4
    LO = jnp.asarray([-1.0, -1.0, -1.0])
    HI = jnp.asarray([1.0, 1.0, 1.0])

    def _rays_along_x(self, y_lo=-0.95, y_hi=0.95, n_side=24):
        ys = np.linspace(y_lo, y_hi, n_side, dtype=np.float32)
        zs = np.linspace(-0.95, 0.95, n_side, dtype=np.float32)
        yy, zz = np.meshgrid(ys, zs)
        n = yy.size
        o = np.stack([np.full(n, -2.0, np.float32), yy.ravel(), zz.ravel()],
                     -1)
        d = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (n, 1))
        return np.concatenate(
            [o, d, np.full((n, 1), 0.5, np.float32),
             np.full((n, 1), 3.5, np.float32)], 1)

    def _grid(self, slabs):
        """sigma grid with x-axis slabs: list of (ix0, ix1, sigma)."""
        sig = np.zeros((self.N,) * 3, np.float32)
        for ix0, ix1, s in slabs:
            sig[ix0:ix1] = s
        return jnp.asarray(sig.reshape(-1))

    def _sigma_mode_bm(self, sigma_flat, thresh=1.0):
        """Host-side reference of the plain sigma criterion (same dilation
        + block reduction)."""
        occ = np.asarray(sigma_flat).reshape((self.N,) * 3) > thresh
        dil = occ
        for axis in range(3):
            dil = dil | np.roll(dil, 1, axis) | np.roll(dil, -1, axis)
        B = self.N // self.BLOCK
        return dil.reshape(B, self.BLOCK, B, self.BLOCK, B,
                           self.BLOCK).any(axis=(1, 3, 5))

    def _bm(self, sigma_flat, rays, thresh=1.0):
        from nerf_pl_tpu.rendering import weight_block_map_from_sigma
        return np.asarray(weight_block_map_from_sigma(
            sigma_flat, self.N, self.BLOCK, self.LO, self.HI,
            jnp.asarray(rays), jnp.float32(thresh),
            n_steps=128, ray_chunk=256)).astype(bool)

    def test_occluded_junk_pruned(self):
        """sigma mode keeps a high-density blob behind an opaque wall;
        weight mode culls it (transmittance ~ 0 there)."""
        sig = self._grid([(12, 15, 500.0), (20, 24, 50.0)])
        bm_w = self._bm(sig, self._rays_along_x())
        bm_s = self._sigma_mode_bm(sig)
        assert bm_s[5].any(), "sigma mode must keep the junk blob"
        assert bm_w[3].any(), "the wall itself must stay occupied"
        assert not bm_w[5].any(), "occluded junk must be pruned"
        assert not bm_w[6].any()

    def test_unoccluded_matches_sigma(self):
        """With nothing in front (T ~ 1) the weight criterion reduces to
        the sigma threshold: the blob is kept."""
        sig = self._grid([(20, 24, 50.0)])
        bm_w = self._bm(sig, self._rays_along_x())
        assert bm_w[5].any()
        assert not bm_w[:3].any(), "empty space ahead of the blob"

    def test_unobserved_cells_culled(self):
        """Cells no marched ray passes through are culled even at high
        sigma (the NerfAcc decay semantic)."""
        sig = self._grid([(12, 15, 500.0)])
        # upper-half rays only; y_hi stays off the grid edge because the
        # (intentionally conservative) dilation wraps across the boundary
        rays = self._rays_along_x(y_lo=0.15, y_hi=0.75)
        bm = self._bm(sig, rays)
        assert bm[3, 5:, :].any(), "observed wall half kept"
        assert not bm[3, :3, :].any(), "unobserved wall half culled"

    def test_threshold_semantics(self):
        """Free-space transmittance ~ 1: marked iff sigma > threshold."""
        sig = self._grid([(16, 20, 0.5)])
        assert not self._bm(sig, self._rays_along_x(), thresh=1.0).any()
        assert self._bm(sig, self._rays_along_x(), thresh=0.3)[4].any()

    def test_weight_subset_of_sigma_with_mlp(self, rng):
        """End-to-end build: mode='weight' marks a subset of mode='sigma'
        blocks (w = alpha*T <= alpha, identical dilation/reduction)."""
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(3), mcfg.nerf)
        o = rng.normal(size=(512, 3)).astype(np.float32) * 2
        d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, d, np.full((512, 1), 0.1, np.float32),
             np.full((512, 1), 4.0, np.float32)], 1).astype(np.float32)
        kw = dict(N=16, block=4, ranges=(-1.0, 1.0), sigma_threshold=0.5,
                  chunk=1024, auto_widen=0)
        occ_s = build_occupancy_grid(params, mcfg, **kw)
        occ_w = build_occupancy_grid(params, mcfg, mode="weight",
                                     vis_rays=rays, vis_steps=64, **kw)
        s = occ_s.block_map.astype(bool)
        w = occ_w.block_map.astype(bool)
        assert not (w & ~s).any(), "weight blocks must be a sigma subset"

    def test_mode_validation(self):
        with pytest.raises(ValueError, match="mode"):
            build_occupancy_grid({}, small_mcfg(), mode="bogus")
        with pytest.raises(ValueError, match="vis_rays"):
            build_occupancy_grid({}, small_mcfg(), mode="weight")
        from nerf_pl_tpu.config import Hparams, validate_hparams
        with pytest.raises(ValueError, match="occ_mode"):
            validate_hparams(Hparams(occ_train=True, occ_mode="bogus"))


class TestNDCGrid:
    """Occupancy culling in NDC space — the LLFF forward-facing family
    (reference datasets/llff.py:236-301): rays from get_ndc_rays live in
    the [-1,1]^3 cube with near=0 / far=1 in ray-parameter space and
    UNNORMALIZED directions. The grid machinery is coordinate-agnostic
    (occupancy.py rays_aabb docstring); these tests pin that claim."""

    def _ndc_rays(self, H=24, W=24, focal=24.0, cam_z=0.0):
        from nerf_pl_tpu.datasets.ray_utils import (get_ndc_rays,
                                                    get_ray_directions,
                                                    get_rays)
        dirs = get_ray_directions(H, W, focal)
        c2w = np.eye(4, dtype=np.float32)[:3]
        c2w[2, 3] = cam_z   # canonical camera (0) maps exactly to the cube
        rays_o, rays_d = get_rays(dirs, c2w)
        o_ndc, d_ndc = get_ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        R = o_ndc.shape[0]
        return np.concatenate(
            [o_ndc, d_ndc, np.zeros((R, 1), np.float32),
             np.ones((R, 1), np.float32)], 1).astype(np.float32)

    def test_ndc_rays_live_in_cube(self):
        rays = self._ndc_rays()
        p0 = rays[:, 0:3]                              # t=0: near plane
        p1 = rays[:, 0:3] + rays[:, 3:6]               # t=1: infinity
        assert np.allclose(p0[:, 2], -1.0, atol=1e-5)  # z=-1 near plane
        assert np.allclose(p1[:, 2], 1.0, atol=1e-5)   # z=+1 at infinity
        assert np.abs(np.concatenate([p0, p1])).max() <= 1.0 + 1e-4
        # directions are NOT unit-norm in NDC — the culler must not assume
        assert not np.allclose(np.linalg.norm(rays[:, 3:6], axis=-1), 1.0)

    def test_hits_match_brute_force_ndc(self):
        """Slab test + union interval on NDC rays (non-unit d, t in [0,1])
        agrees with the numpy reference."""
        rays = self._ndc_rays()
        # bounds off the pixel lattice: rays at exact box faces with
        # d=-0.0 are measure-zero grazing cases where inclusive (kernel)
        # vs nan-propagating (numpy reference) conventions differ
        boxes = np.asarray([[-0.413, -0.413, -1.0, 0.409, 0.409, -0.207],
                            [0.513, 0.513, 0.013, 0.913, 0.913, 0.613]],
                           np.float32)
        hit, tlo, thi = ray_box_hits(jnp.asarray(boxes), jnp.asarray(rays))
        bf_hit, bf_tlo, bf_thi = brute_force_hits(boxes, rays)
        np.testing.assert_array_equal(np.asarray(hit), bf_hit)
        m = bf_hit
        assert m.any() and not m.all()
        np.testing.assert_allclose(np.asarray(tlo)[m], bf_tlo[m], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(thi)[m], bf_thi[m], rtol=1e-4)

    def test_rays_aabb_ndc(self):
        """The viewing-volume AABB of an NDC frustum is (a subset of) the
        NDC cube — the auto-derived grid extent is well-posed."""
        from nerf_pl_tpu.rendering import rays_aabb
        lo, hi = rays_aabb(self._ndc_rays())
        assert (lo >= -1.0 - 1e-4).all() and (hi <= 1.0 + 1e-4).all()
        assert np.allclose(lo[2], -1.0, atol=1e-5)
        assert np.allclose(hi[2], 1.0, atol=1e-5)

    def test_culled_matches_dense_ndc(self):
        """Cull + tighten parity on NDC rays: surviving rays render to the
        dense values (the blender-space TestCulledMesh contract, in NDC)."""
        mcfg = small_mcfg()
        p1 = init_nerf_params(jax.random.PRNGKey(2), mcfg.nerf)
        params = {"nerf_coarse": p1, "nerf_fine": p1}
        occ = OccupancyGrid(
            boxes=np.asarray([[-0.5, -0.5, -1.0, 0.5, 0.5, 0.2]], np.float32),
            block_map=np.ones((1, 1, 1), np.uint8),
            lo=np.asarray([-1, -1, -1], np.float32),
            hi=np.asarray([1, 1, 1], np.float32))
        rays = self._ndc_rays()
        rcfg = RenderConfig(N_samples=16, N_importance=8, test_time=True)
        hit = np.asarray(ray_box_hits(jnp.asarray(occ.boxes),
                                      jnp.asarray(rays))[0])
        assert hit.any() and not hit.all()   # the box must actually cull
        dense = render_rays_chunked(params, jnp.asarray(rays),
                                    jax.random.PRNGKey(0), rcfg, mcfg,
                                    chunk=128)
        # Cull-only parity is exact for ANY model (survivors render with
        # untouched intervals). Tightening is only near-lossless when the
        # model is empty outside the grid — a trained-model property,
        # covered by the slow TestNDCTrainedParity below.
        cr = CulledRenderer(occ, rcfg, mcfg, chunk=64)
        out, st = cr(params, jnp.asarray(rays), return_stats=True)
        assert st["n_survivors"] == int(hit.sum())
        for k in out:
            np.testing.assert_allclose(np.asarray(out[k])[hit],
                                       np.asarray(dense[k])[hit],
                                       atol=5e-3, rtol=5e-3)

    def test_weight_mode_grid_builds_on_ndc_rays(self):
        """mode='weight' visibility pruning marches NDC rays (non-unit d)
        and still yields a subset of the sigma-mode blocks."""
        mcfg = small_mcfg()
        params = init_nerf_params(jax.random.PRNGKey(3), mcfg.nerf)
        rays = self._ndc_rays()
        kw = dict(N=16, block=4, ranges=(-1.0, 1.0), sigma_threshold=0.5,
                  chunk=1024, auto_widen=0)
        occ_s = build_occupancy_grid(params, mcfg, **kw)
        occ_w = build_occupancy_grid(params, mcfg, mode="weight",
                                     vis_rays=rays, vis_steps=64, **kw)
        s = occ_s.block_map.astype(bool)
        w = occ_w.block_map.astype(bool)
        assert not (w & ~s).any(), "weight blocks must be a sigma subset"


@pytest.mark.slow
class TestNDCTrainedParity:
    def test_culled_matches_dense_llff_ndc(self, tmp_path):
        """Train a tiny forward-facing LLFF scene (NDC rays), build the
        grid IN NDC SPACE from the trained model, and require culled and
        tightened renders to preserve the dense render's GT-PSNR — the
        blender-space TestCulledRenderParity contract on the LLFF/NDC
        family (reference datasets/llff.py:236-301)."""
        import os
        from nerf_pl_tpu.config import Hparams
        from nerf_pl_tpu.rendering import rays_aabb
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_llff_scene
        root = make_llff_scene(str(tmp_path / "scene"), n_images=6,
                               wh=(24, 18))
        os.chdir(tmp_path)
        hp = Hparams(root_dir=root, dataset_name="llff", img_wh=(24, 18),
                     N_samples=12, N_importance=6, perturb=1.0,
                     noise_std=1.0, batch_size=256, num_epochs=12,
                     lr=7e-4, decay_step=[100], scan_steps=96,
                     val_chunk=432, exp_name="occ_ndc_e2e")
        system = NeRFSystem(hp, enable_tb=False)
        system.fit()
        params_full = {k: v for k, v in system.state.params.items()}

        sample = system.val_dataset[0]
        rays = jnp.asarray(sample["rays"])
        # NDC rays: near=0, far=1, endpoints inside the [-1,1]^3 cube
        r_np = np.asarray(sample["rays"])
        assert np.allclose(r_np[:, 6], 0.0) and np.allclose(r_np[:, 7], 1.0)
        lo, hi = rays_aabb(r_np)
        # off-center cameras exceed the canonical cube slightly in x/y
        assert (lo >= -1.2).all() and (hi <= 1.2).all()

        occ = build_occupancy_grid(
            params_full["nerf_fine"], system.mcfg, N=32, block=4,
            ranges=(tuple(lo), tuple(hi)), sigma_threshold=0.5, chunk=2048,
            max_ranges=(lo, hi))
        assert 0 < occ.n_boxes
        assert 0 < occ.occupied_fraction <= 1.0

        rcfg = RenderConfig(N_samples=12, N_importance=6, test_time=True)
        dense = render_rays_chunked(params_full, rays, jax.random.PRNGKey(0),
                                    rcfg, system.mcfg, chunk=432)
        gt = np.asarray(sample["rgbs"])
        psnr = lambda a: -10 * np.log10(np.mean((a - gt) ** 2))
        psnr_d = psnr(np.asarray(dense["rgb_fine"]))
        for tighten in (False, True):
            cr = CulledRenderer(occ, rcfg, system.mcfg, chunk=100,
                                tighten=tighten)
            out, stats = cr(params_full, rays, return_stats=True)
            assert 0 < stats["n_survivors"] <= stats["n_rays"]
            psnr_c = psnr(np.clip(np.asarray(out["rgb_fine"]), 0, 1))
            assert abs(psnr_c - psnr_d) < 0.1, (tighten, psnr_c, psnr_d)
