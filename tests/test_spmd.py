"""SPMD tests on a virtual 8-device CPU mesh: sharded train steps, on-device
sampling, loss descent, tensor-parallel equivalence, sharded rendering."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.parallel import TrainState, Trainer, make_mesh
from nerf_pl_tpu.rendering import ModelConfig, RenderConfig
from nerf_pl_tpu.training import get_lr_schedule, get_optimizer, loss_dict


def small_mcfg():
    from nerf_pl_tpu.models import EmbeddingConfig, NeRFConfig
    return ModelConfig(
        nerf=NeRFConfig(D=2, W=32, in_channels_xyz=27, in_channels_dir=15,
                        skips=(1,)),
        emb_xyz=EmbeddingConfig(3, 4),
        emb_dir=EmbeddingConfig(3, 2))


def make_data(n=4096):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2.0, np.float32),
         np.full((n, 1), 6.0, np.float32)], 1)
    rgbs = rng.random((n, 3)).astype(np.float32)
    return rays, rgbs


def make_trainer(mesh, batch=256, N_importance=0, tensor_parallel=False,
                 lr=1e-3):
    rcfg = RenderConfig(N_samples=8, N_importance=N_importance,
                        perturb=1.0, noise_std=0.0)
    sched = get_lr_schedule("steplr", lr, 4, 10, decay_step=[100])
    opt = get_optimizer("adam", sched)
    return Trainer(mesh, small_mcfg(), rcfg, opt, sched, loss_dict["mse"],
                   batch, tensor_parallel=tensor_parallel)


class TestMesh:
    def test_all_data(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1

    def test_2d(self):
        mesh = make_mesh(num_data=4, num_model=2)
        assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


class TestTrainer:
    def test_run_steps_descends(self):
        mesh = make_mesh()
        tr = make_trainer(mesh)
        rays, rgbs = make_data()
        tr.set_data(rays, rgbs)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 60)
        losses = np.asarray(m["loss"])
        assert losses.shape == (60,)
        assert np.all(np.isfinite(losses))
        assert losses[-10:].mean() < losses[:10].mean()
        assert int(state.step) == 60

    def test_data_sharding_layout(self):
        mesh = make_mesh()
        tr = make_trainer(mesh)
        rays, rgbs = make_data(4099)  # forces padding to a multiple of 8
        tr.set_data(rays, rgbs)
        assert tr.all_rays.shape[0] % 8 == 0
        assert tr.n_rays_local == tr.all_rays.shape[0] // 8
        # genuinely sharded: per-device shard is 1/8 of rows
        shard_rows = {s.data.shape[0] for s in tr.all_rays.addressable_shards}
        assert shard_rows == {tr.all_rays.shape[0] // 8}

    def test_params_replicated(self):
        mesh = make_mesh()
        tr = make_trainer(mesh)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        w = state.params["nerf_coarse"]["xyz_0"]["w"]
        assert len(w.addressable_shards) == 8
        assert w.addressable_shards[0].data.shape == w.shape  # replicated

    def test_deterministic_across_segmenting(self):
        # 20 steps in one call == 10 + 10 with the same base key.
        mesh = make_mesh()
        rays, rgbs = make_data()

        def run(splits):
            tr = make_trainer(mesh)
            tr.set_data(rays, rgbs)
            state = tr.init_state(jax.random.PRNGKey(0))
            for k in splits:
                state, _ = tr.run_steps(state, jax.random.PRNGKey(9), k)
            return state

        s1 = run([20])
        s2 = run([10, 10])
        w1 = np.asarray(s1.params["nerf_coarse"]["xyz_0"]["w"])
        w2 = np.asarray(s2.params["nerf_coarse"]["xyz_0"]["w"])
        np.testing.assert_allclose(w1, w2, atol=1e-6)

    def test_hierarchical_training(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, N_importance=4)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        assert "nerf_fine" in state.params
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 10)
        assert np.all(np.isfinite(np.asarray(m["loss"])))

    def test_lr_logged(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, lr=5e-4)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        _, m = tr.run_steps(state, jax.random.PRNGKey(1), 3)
        np.testing.assert_allclose(np.asarray(m["lr"]), 5e-4, rtol=1e-6)


class TestEpochSampling:
    """DataLoader(shuffle=True) parity: exact per-epoch coverage plus a fresh
    per-epoch permutation of the on-device store (reference train.py:89-94)."""

    @pytest.mark.slow

    def test_epoch_covers_every_ray_once(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs = make_data(4096)
        # tag each ray with a unique id in the (unused-by-sampling) rgb slot
        rgbs = np.arange(4096, dtype=np.float32)[:, None].repeat(3, 1)
        tr.set_data(rays, rgbs)
        assert tr.steps_per_epoch_local == 4096 // 8 // 32  # b_local = 32
        seen = []
        for step in range(tr.steps_per_epoch_local):
            _, got = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                      jnp.asarray(step, jnp.int32))
            seen.append(np.asarray(got)[:, 0])
        ids = np.concatenate(seen)
        assert ids.shape == (4096,)
        assert np.array_equal(np.sort(ids), np.arange(4096))  # each once

    def test_next_epoch_repeats_without_reshuffle(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        tr.set_data(*make_data(2048))
        spe = tr.steps_per_epoch_local
        a, _ = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                jnp.asarray(0, jnp.int32))
        b, _ = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                jnp.asarray(spe, jnp.int32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_reshuffle_permutes_but_preserves_shards(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs = make_data(2048)
        tr.set_data(rays, rgbs)
        before = [np.asarray(s.data) for s in tr.all_rays.addressable_shards]
        tr.reshuffle(jax.random.PRNGKey(3))
        after = [np.asarray(s.data) for s in tr.all_rays.addressable_shards]
        changed = False
        for b, a in zip(before, after):
            # same multiset of rows per shard (no cross-device mixing)...
            bs = b[np.lexsort(b.T)]
            as_ = a[np.lexsort(a.T)]
            np.testing.assert_allclose(bs, as_)
            changed |= not np.array_equal(b, a)
        assert changed  # ...but a genuinely new order somewhere

    def test_reshuffle_keeps_ray_rgb_pairing(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, _ = make_data(2048)
        # rgb row = function of ray row so pairing is checkable post-shuffle
        rgbs = rays[:, :3] * 0.5 + 0.25
        tr.set_data(rays, rgbs.astype(np.float32))
        tr.reshuffle(jax.random.PRNGKey(7))
        r = np.asarray(tr.all_rays)
        c = np.asarray(tr.all_rgbs)
        np.testing.assert_allclose(c, r[:, :3] * 0.5 + 0.25, atol=1e-6)

    def test_training_descends_across_reshuffles(self):
        mesh = make_mesh()
        tr = make_trainer(mesh)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        losses = []
        for epoch in range(4):
            state, m = tr.run_steps(state, jax.random.PRNGKey(1), 16)
            losses.append(np.asarray(m["loss"]))
            tr.reshuffle(jax.random.fold_in(jax.random.PRNGKey(2), epoch))
        losses = np.concatenate(losses)
        assert np.all(np.isfinite(losses))
        assert losses[-16:].mean() < losses[:16].mean()


class TestTensorParallel:
    def test_tp_matches_dp_numerics(self):
        rays, rgbs = make_data()

        def final_weights(num_data, num_model, tensor_parallel):
            mesh = make_mesh(num_data=num_data, num_model=num_model)
            tr = make_trainer(mesh, batch=256,
                              tensor_parallel=tensor_parallel)
            tr.set_data(rays, rgbs)
            state = tr.init_state(jax.random.PRNGKey(0))
            state, m = tr.run_steps(state, jax.random.PRNGKey(1), 5)
            return (np.asarray(state.params["nerf_coarse"]["xyz_0"]["w"]),
                    np.asarray(m["loss"]))

        w_dp, l_dp = final_weights(4, 1, False)
        w_tp, l_tp = final_weights(4, 2, True)
        # Same data-axis size -> identical sampling stream -> same numerics.
        np.testing.assert_allclose(l_dp, l_tp, rtol=2e-4)
        np.testing.assert_allclose(w_dp, w_tp, atol=2e-5)

    def test_tp_params_actually_sharded(self):
        mesh = make_mesh(num_data=4, num_model=2)
        tr = make_trainer(mesh, batch=256, tensor_parallel=True)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        w0 = state.params["nerf_coarse"]["xyz_0"]["w"]  # column-parallel
        shard_cols = {s.data.shape[1] for s in w0.addressable_shards}
        assert shard_cols == {w0.shape[1] // 2}

    def test_tp_rejected_on_fused_loss_path(self):
        """The production loss-fused path is intentionally dp-only; TP
        exists to validate the mesh abstraction (README parallelism row).
        Requesting both must fail loudly, not silently ignore the axis."""
        mesh = make_mesh(num_data=4, num_model=2)
        rcfg = RenderConfig(N_samples=8, perturb=1.0, noise_std=0.0,
                            fused_train=True, fused_loss=True)
        sched = get_lr_schedule("steplr", 1e-3, 4, 10, decay_step=[100])
        tr = Trainer(mesh, ModelConfig(), rcfg, get_optimizer("adam", sched),
                     sched, loss_dict["mse"], 256, tensor_parallel=True)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="tensor_parallel"):
            tr.run_steps(state, jax.random.PRNGKey(1), 1)


class TestShardedRender:
    def test_render_matches_direct(self):
        from nerf_pl_tpu.rendering import render_rays
        mesh = make_mesh()
        tr = make_trainer(mesh)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        rcfg = RenderConfig(N_samples=8)
        rays, _ = make_data(700)  # not divisible by 8*chunk
        render = tr.render_fn(rcfg, chunk=32)
        out = render(state.params, rays)
        assert out["rgb_coarse"].shape == (700, 3)

        direct = render_rays(state.params, jnp.asarray(rays),
                             jax.random.PRNGKey(0), rcfg, tr.mcfg)
        np.testing.assert_allclose(out["rgb_coarse"],
                                   np.asarray(direct["rgb_coarse"]), atol=1e-5)

    def test_render_device_resident_rays(self):
        """Device-resident rays with device_out=True must round-trip
        nowhere: a jnp input (non-divisible R, so the pad path runs on
        device too) returns jax arrays numerically equal to the
        host-numpy path. This is the contract bench_render's timed loop
        relies on — an np.concatenate in the pad path would silently
        charge a device->host->device transfer per frame."""
        mesh = make_mesh()
        tr = make_trainer(mesh)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        rcfg = RenderConfig(N_samples=8)
        rays, _ = make_data(700)  # not divisible by 8*chunk -> pads
        host = tr.render_fn(rcfg, chunk=32)(state.params, rays)
        dev_render = tr.render_fn(rcfg, chunk=32, device_out=True)
        out = dev_render(state.params, jnp.asarray(rays))
        assert isinstance(out["rgb_coarse"], jax.Array)
        assert not isinstance(host["rgb_coarse"], jax.Array)
        np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                                   host["rgb_coarse"], atol=1e-6)

    def test_render_test_time(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, N_importance=4)
        tr.set_data(*make_data())
        state = tr.init_state(jax.random.PRNGKey(0))
        rcfg = RenderConfig(N_samples=8, N_importance=4, test_time=True)
        rays, _ = make_data(256)
        out = tr.render_fn(rcfg, chunk=32)(state.params, rays)
        assert "rgb_coarse" not in out and "rgb_fine" in out


class TestStorePadding:
    def test_tail_rays_not_dropped(self):
        """drop_last=False semantics (reference DataLoader default): a store
        not divisible by the global batch pads with head rays so every ray
        is visited and steps_per_epoch_local == ceil(n / batch)."""
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, _ = make_data(1000)                 # 1000 % 256 != 0
        rgbs = np.arange(1000, dtype=np.float32)[:, None].repeat(3, 1)
        tr.set_data(rays, rgbs)
        assert tr.all_rays.shape[0] == 1024       # padded to 4 * 256
        assert tr.steps_per_epoch_local == 4      # == ceil(1000/256)
        seen = []
        for step in range(tr.steps_per_epoch_local):
            _, got = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                      jnp.asarray(step, jnp.int32))
            seen.append(np.asarray(got)[:, 0])
        ids = np.concatenate(seen)
        # every original ray appears at least once (tail not dropped)
        assert set(np.arange(1000)) <= set(ids.astype(int))


class TestTinyStorePadding:
    def test_store_smaller_than_batch_tiles_modularly(self):
        """pad > n (store smaller than the global batch) must tile the
        store cyclically — all_rays[:pad] under-padded and the per-device
        dynamic_slice went out of bounds."""
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, _ = make_data(40)                   # 40 << 256
        rgbs = np.arange(40, dtype=np.float32)[:, None].repeat(3, 1)
        tr.set_data(rays, rgbs)
        assert tr.all_rays.shape[0] == 256        # one full global batch
        assert tr.steps_per_epoch_local == 1
        _, got = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                  jnp.asarray(0, jnp.int32))
        ids = np.asarray(got)[:, 0].astype(int)
        assert set(ids) == set(range(40))         # every ray still visited


class TestTightenStore:
    def _boxed_data(self, n=512):
        rng = np.random.default_rng(5)
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = -5.0
        d = np.zeros((n, 3), np.float32)
        d[:, 2] = 1.0                              # all rays along +z
        # half the rays offset to x=3 so they miss the unit box
        miss = rng.random(n) < 0.5
        o[miss, 0] = 3.0
        rays = np.concatenate(
            [o, d, np.full((n, 1), 0.1, np.float32),
             np.full((n, 1), 10.0, np.float32)], 1)
        rgbs = rng.random((n, 3)).astype(np.float32)
        return rays, rgbs, miss

    def test_hit_rays_clipped_miss_rays_kept(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, _ = self._boxed_data()
        tr.set_data(rays, rgbs, shuffle_seed=0)
        boxes = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        st = tr.tighten_store(boxes, margin=0.05)
        hit_frac, shrink = st["hit_frac"], st["shrink"]
        assert 0.3 < hit_frac < 0.7
        assert shrink > 0.2
        out = np.asarray(tr.all_rays)
        hit_rows = np.abs(out[:, 0]) < 1e-6       # x==0 rays hit the box
        # box spans z in [-1,1]; ray hits t in [4,6]; margin 0.05
        np.testing.assert_allclose(out[hit_rows, 6], 3.95, atol=1e-4)
        np.testing.assert_allclose(out[hit_rows, 7], 6.05, atol=1e-4)
        np.testing.assert_allclose(out[~hit_rows, 6], 0.1, atol=1e-6)
        np.testing.assert_allclose(out[~hit_rows, 7], 10.0, atol=1e-6)

    def test_idempotent_under_refresh(self):
        """Re-tightening with a DIFFERENT grid derives from the ORIGINAL
        intervals, not the previously shrunk ones."""
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, _ = self._boxed_data()
        tr.set_data(rays, rgbs)
        small = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        big = np.asarray([[-2, -2, -3, 2, 2, 3]], np.float32)
        tr.tighten_store(small, margin=0.0)
        tr.tighten_store(big, margin=0.0)         # must WIDEN back out
        out = np.asarray(tr.all_rays)
        hit_rows = np.abs(out[:, 0]) < 1e-6
        np.testing.assert_allclose(out[hit_rows, 6], 2.0, atol=1e-4)
        np.testing.assert_allclose(out[hit_rows, 7], 8.0, atol=1e-4)

    def test_reshuffle_keeps_nf0_aligned(self):
        """After tightening, the per-epoch reshuffle must permute the
        original-interval store in lockstep with the rays."""
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, _ = self._boxed_data()
        # give every ray a unique original near so alignment is checkable
        rays[:, 6] = 0.1 + 0.0001 * np.arange(len(rays))
        tr.set_data(rays, rgbs)
        boxes = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        tr.tighten_store(boxes, margin=0.0)
        tr.reshuffle(jax.random.PRNGKey(11))
        tr.tighten_store(boxes, margin=0.0)       # re-derive post-shuffle
        out = np.asarray(tr.all_rays)
        nf0 = np.asarray(tr.all_nf0)
        miss_rows = np.abs(out[:, 0]) > 1e-6
        # miss rays carry their ORIGINAL unique near -> pairing survived
        np.testing.assert_allclose(out[miss_rows, 6], nf0[miss_rows, 0],
                                   atol=1e-7)
        assert len(np.unique(nf0[:, 0])) == len(nf0)

    def test_training_descends_after_tighten(self):
        mesh = make_mesh()
        tr = make_trainer(mesh)
        rays, rgbs, _ = self._boxed_data(4096)
        tr.set_data(rays, rgbs)
        boxes = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        tr.tighten_store(boxes, margin=0.1)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 24)
        losses = np.asarray(m["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-8:].mean() < losses[:8].mean()


class TestSegmentMaskStore:
    """tighten_store(n_seg>0): mask storage, reshuffle alignment, and the
    train step consuming it on both the XLA and loss-fused paths."""

    def _boxed_data(self, n=512):
        rng = np.random.default_rng(5)
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = -5.0
        d = np.zeros((n, 3), np.float32)
        d[:, 2] = 1.0
        miss = rng.random(n) < 0.5
        o[miss, 0] = 3.0
        rays = np.concatenate(
            [o, d, np.full((n, 1), 0.1, np.float32),
             np.full((n, 1), 10.0, np.float32)], 1)
        # biased targets: fresh sigmoid heads output ~0.5, so the initial
        # loss (~0.16) sits far above the noise floor and a few optimizer
        # steps show unambiguous descent
        rgbs = (0.8 + 0.2 * rng.random((n, 3))).astype(np.float32)
        return rays, rgbs, miss

    def test_masks_stored_and_reshuffle_aligned(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, _ = self._boxed_data()
        tr.set_data(rays, rgbs)
        boxes = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)
        tr.tighten_store(boxes, margin=0.0, n_seg=32)
        assert tr.all_occm is not None and tr.occ_n_seg == 32
        occm = np.asarray(tr.all_occm)
        out = np.asarray(tr.all_rays)
        hit_rows = np.abs(out[:, 0]) < 1e-6
        # hit rays: tightened interval IS the occupied span -> every
        # segment overlaps the box -> all n_seg bits set; miss rays get
        # the all-ones fallback -> all bits set too (uniform sampling)
        assert np.all(occm == np.uint32(0xFFFFFFFF))
        # multi-box store: two boxes with a gap produce interior zeros
        boxes2 = np.asarray([[-1, -1, -1, 1, 1, 1],
                             [-1, -1, 3, 1, 1, 4]], np.float32)
        tr.tighten_store(boxes2, margin=0.0, n_seg=32)
        occm2 = np.asarray(tr.all_occm)
        from nerf_pl_tpu.rendering.occupancy import unpack_segment_bits
        bits = np.asarray(unpack_segment_bits(jnp.asarray(occm2), 32))
        frac = bits[np.abs(np.asarray(tr.all_rays)[:, 0]) < 1e-6].mean()
        assert 0.3 < frac < 0.9        # gap between z=1 and z=3 unmarked
        # reshuffle permutes mask in lockstep: re-derive and compare
        tr.reshuffle(jax.random.PRNGKey(3))
        occm_shuffled = np.asarray(tr.all_occm)
        tr.tighten_store(boxes2, margin=0.0, n_seg=32)
        np.testing.assert_array_equal(occm_shuffled,
                                      np.asarray(tr.all_occm))

    @pytest.mark.parametrize("fused", [False, True])
    def test_training_descends_with_masks(self, fused):
        mesh = make_mesh()
        rcfg = RenderConfig(N_samples=8, N_importance=0, perturb=1.0,
                            noise_std=0.0, fused_train=fused,
                            fused_loss=fused)
        sched = get_lr_schedule("steplr", 1e-3, 4, 10, decay_step=[100])
        opt = get_optimizer("adam", sched)
        # fused kernels are specialized to the default architecture
        mcfg = ModelConfig() if fused else small_mcfg()
        tr = Trainer(mesh, mcfg, rcfg, opt, sched,
                     loss_dict["mse"], 256)
        rays, rgbs, _ = self._boxed_data(4096)
        tr.set_data(rays, rgbs)
        state = tr.init_state(jax.random.PRNGKey(0))
        # warmup steps WITHOUT mask, then tighten adds the mask mid-run
        state, m0 = tr.run_steps(state, jax.random.PRNGKey(1), 8)
        boxes = np.asarray([[-1, -1, -1, 1, 1, 1],
                            [-1, -1, 3, 1, 1, 4]], np.float32)
        tr.tighten_store(boxes, margin=0.1, n_seg=32)
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 24)
        losses = np.asarray(m["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-8:].mean() < np.asarray(m0["loss"])[:8].mean()


class TestSurvivorPacking:
    """tighten_store(pack=True): survivors-first shards, canonical
    reshuffle, survivor-only batches, miss accounting."""

    def _data(self, n=4096, miss_frac=0.5, seed=7):
        rng = np.random.default_rng(seed)
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = -5.0
        d = np.zeros((n, 3), np.float32)
        d[:, 2] = 1.0
        miss = rng.random(n) < miss_frac
        o[miss, 0] = 3.0                    # shifted rays miss the box
        rays = np.concatenate(
            [o, d, np.full((n, 1), 0.1, np.float32),
             np.full((n, 1), 10.0, np.float32)], 1)
        rgbs = rng.random((n, 3)).astype(np.float32)
        return rays, rgbs, miss

    BOX = np.asarray([[-1, -1, -1, 1, 1, 1]], np.float32)

    def test_partition_and_stats(self):
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, miss = self._data()
        tr.set_data(rays, rgbs)
        st = tr.tighten_store(self.BOX, margin=0.0, n_seg=32, pack=True)
        # every shard is survivors-first
        hit = np.asarray(tr.all_hit).reshape(8, -1)
        nsurv = np.asarray(tr.all_nsurv)
        for r, k in zip(hit, nsurv):
            assert r[:k].all() and not r[k:].any()
        # rows stay aligned: ray x==0 iff hit
        out = np.asarray(tr.all_rays)
        np.testing.assert_array_equal(np.abs(out[:, 0]) < 1e-6,
                                      np.asarray(tr.all_hit) > 0.5)
        # identity labels are a permutation
        idx = np.asarray(tr.all_idx)
        assert sorted(idx.tolist()) == list(range(len(idx)))
        # miss accounting: white_back=False -> bg=0, miss_mse = E[rgb^2]
        assert abs(st["expand"] - len(rays) / nsurv.sum()) < 1e-6
        exp_mse = float(np.mean(rgbs[np.abs(rays[:, 0]) > 1] ** 2))
        # partition happened after a global shuffle; compare against the
        # stored misses instead of the construction-order mask
        stored_miss_rgbs = np.asarray(tr.all_rgbs)[
            np.asarray(tr.all_hit) < 0.5]
        assert abs(st["miss_mse"] - float(np.mean(stored_miss_rgbs ** 2))) \
            < 1e-5
        assert abs(st["miss_mse"] - exp_mse) < 0.02

    def test_canonical_reshuffle_order_independent(self):
        """Store content after reshuffle(key) is a pure function of
        (hit, key, identity) — independent of prior store order."""
        mesh = make_mesh()
        rays, rgbs, _ = self._data()
        tra = make_trainer(mesh, batch=256)
        trb = make_trainer(mesh, batch=256)
        tra.set_data(rays, rgbs)
        trb.set_data(rays, rgbs)
        trb.reshuffle(jax.random.PRNGKey(99))   # divergent pre-history
        for tr in (tra, trb):
            tr.tighten_store(self.BOX, margin=0.0, n_seg=32, pack=True)
            tr.reshuffle(jax.random.PRNGKey(11))
        np.testing.assert_array_equal(np.asarray(tra.all_idx),
                                      np.asarray(trb.all_idx))
        np.testing.assert_allclose(np.asarray(tra.all_rays),
                                   np.asarray(trb.all_rays))
        np.testing.assert_array_equal(np.asarray(tra.all_occm),
                                      np.asarray(trb.all_occm))

    def test_batches_are_survivors_only(self):
        """With enough survivors per shard, every sampled batch row hits."""
        mesh = make_mesh()
        tr = make_trainer(mesh, batch=256)
        rays, rgbs, _ = self._data(miss_frac=0.3)
        tr.set_data(rays, rgbs)
        tr.tighten_store(self.BOX, margin=0.0, n_seg=32, pack=True)
        for step in range(6):
            out = tr._sample_batch(tr.all_rays, tr.all_rgbs,
                                   jnp.asarray(step, jnp.int32),
                                   tr.all_occm, tr.all_nsurv)
            batch_rays = np.asarray(out[0])
            assert np.all(np.abs(batch_rays[:, 0]) < 1e-6), step

    def test_training_descends_packed(self):
        mesh = make_mesh()
        rcfg = RenderConfig(N_samples=8, N_importance=0, perturb=1.0,
                            noise_std=0.0, fused_train=True,
                            fused_loss=True)
        sched = get_lr_schedule("steplr", 1e-3, 4, 10, decay_step=[100])
        opt = get_optimizer("adam", sched)
        tr = Trainer(mesh, ModelConfig(), rcfg, opt, sched,
                     loss_dict["mse"], 256)
        rays, rgbs, _ = self._data()
        rgbs = (0.8 + 0.2 * rgbs).astype(np.float32)
        tr.set_data(rays, rgbs)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m0 = tr.run_steps(state, jax.random.PRNGKey(1), 8)
        tr.tighten_store(self.BOX, margin=0.1, n_seg=32, dilate=1,
                         pack=True)
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 24)
        losses = np.asarray(m["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-8:].mean() < np.asarray(m0["loss"])[:8].mean()
        assert tr.pack_expand > 1.2

    def test_pack_requires_occ_train_flag(self):
        from nerf_pl_tpu.config import Hparams, validate_hparams
        with pytest.raises(ValueError, match="occ_pack"):
            validate_hparams(Hparams(occ_pack=True, occ_train=False))


class TestMultiChipResume:
    """Checkpoint save -> restore -> continue on a dp x tp mesh must equal
    the uninterrupted run (VERDICT r3 #5; reference resume_from_checkpoint,
    train.py:169). Checkpoint tests elsewhere are host-side pytrees — this
    one proves the round-trip through npz + re-device_put preserves the
    2D-mesh placement and the training trajectory."""

    @pytest.mark.parametrize("tensor_parallel", [False, True])
    def test_resume_continues_uninterrupted_stream(self, tmp_path,
                                                   tensor_parallel):
        from nerf_pl_tpu.training.checkpoints import (device_fetch,
                                                      load_checkpoint,
                                                      save_checkpoint)
        rays, rgbs = make_data()
        mesh = make_mesh(num_data=4, num_model=2)
        ckpt = str(tmp_path / "mid.ckpt")

        def run(splits, save_mid=False, restore=False):
            tr = make_trainer(mesh, batch=256,
                              tensor_parallel=tensor_parallel)
            tr.set_data(rays, rgbs)
            state = tr.init_state(jax.random.PRNGKey(0))
            if restore:
                restored, meta = load_checkpoint(ckpt, state)
                state = jax.device_put(restored, jax.tree_util.tree_map(
                    lambda x: x.sharding, state))
                assert meta["step"] == int(state.step)
            losses = []
            for k in splits:
                state, m = tr.run_steps(state, jax.random.PRNGKey(5), k)
                losses.extend(np.asarray(m["loss"]).tolist())
            if save_mid:
                save_checkpoint(ckpt, device_fetch(state),
                                {"step": int(state.step)})
            return losses, state

        full, state_full = run([8])
        head, _ = run([4], save_mid=True)
        tail, state_res = run([4], restore=True)
        np.testing.assert_allclose(head + tail, full, rtol=1e-5)
        assert int(state_res.step) == 8
        # final params equal the uninterrupted run's
        wf = np.asarray(state_full.params["nerf_coarse"]["xyz_0"]["w"])
        wr = np.asarray(state_res.params["nerf_coarse"]["xyz_0"]["w"])
        np.testing.assert_allclose(wf, wr, atol=1e-6)
        if tensor_parallel:
            # restored params keep their column-parallel TP sharding
            w0 = state_res.params["nerf_coarse"]["xyz_0"]["w"]
            shard_cols = {s.data.shape[1] for s in w0.addressable_shards}
            assert shard_cols == {w0.shape[1] // 2}


class TestBF16Masters:
    """init_state(master_dtype=bfloat16): experiment knob (VERDICT r2 #8) —
    the fused path must run and descend with bf16 masters + moments."""

    def test_descends_bf16(self):
        mesh = make_mesh()
        rcfg = RenderConfig(N_samples=8, N_importance=0, perturb=1.0,
                            noise_std=0.0, fused_train=True, fused_loss=True)
        sched = get_lr_schedule("steplr", 1e-3, 4, 10, decay_step=[100])
        tr = Trainer(mesh, ModelConfig(), rcfg, get_optimizer("adam", sched),
                     sched, loss_dict["mse"], 256)
        rng = np.random.default_rng(0)
        n = 4096
        o = np.zeros((n, 3), np.float32); o[:, 2] = -5.0
        d = np.zeros((n, 3), np.float32); d[:, 2] = 1.0
        rays = np.concatenate(
            [o, d, np.full((n, 1), 0.1, np.float32),
             np.full((n, 1), 10.0, np.float32)], 1)
        rgbs = (0.5 + 0.5 * rng.random((n, 3))).astype(np.float32)
        tr.set_data(rays, rgbs)
        state = tr.init_state(jax.random.PRNGKey(0),
                              master_dtype=jnp.bfloat16)
        assert jax.tree_util.tree_leaves(state.params)[0].dtype \
            == jnp.bfloat16
        state, m = tr.run_steps(state, jax.random.PRNGKey(1), 24)
        losses = np.asarray(m["loss"])
        assert np.all(np.isfinite(losses))
        assert losses[-8:].mean() < losses[:8].mean()
