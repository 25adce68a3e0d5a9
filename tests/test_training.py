"""Training-system tests: optimizers, schedules, checkpoints, and a tiny
end-to-end fit on a synthetic scene (loss must fall, PSNR must rise)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_pl_tpu.config import Hparams, get_opts
from nerf_pl_tpu.training import (get_lr_schedule, get_optimizer, loss_dict,
                                  mse, psnr, ssim)
from nerf_pl_tpu.training.checkpoints import (TopKCheckpoints,
                                              extract_model_state_dict,
                                              load_checkpoint, load_ckpt,
                                              save_checkpoint,
                                              save_weights_only)


class TestMetrics:
    def test_psnr_known_value(self):
        a = jnp.zeros((4, 3))
        b = jnp.full((4, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)

    def test_psnr_valid_mask(self):
        a = jnp.array([[0.0], [1.0]])
        b = jnp.array([[0.1], [1.0]])
        mask = jnp.array([True, False])
        np.testing.assert_allclose(float(mse(a, b, mask)), 0.01, atol=1e-6)

    def test_ssim_identical_is_one(self, rng):
        img = jnp.array(rng.random((3, 16, 16)), jnp.float32)
        assert float(ssim(img, img)) > 0.99

    def test_ssim_noise_lowers(self, rng):
        img = jnp.array(rng.random((3, 16, 16)), jnp.float32)
        noisy = jnp.clip(img + 0.5 * jnp.array(rng.random((3, 16, 16)),
                                               jnp.float32), 0, 1)
        assert float(ssim(img, noisy)) < float(ssim(img, img)) - 0.05

    def test_loss_coarse_plus_fine(self):
        rgbs = jnp.zeros((4, 3))
        res = {"rgb_coarse": jnp.full((4, 3), 0.1),
               "rgb_fine": jnp.full((4, 3), 0.2)}
        expected = 0.1 ** 2 + 0.2 ** 2
        np.testing.assert_allclose(float(loss_dict["mse"](res, rgbs)),
                                   expected, rtol=1e-5)


class TestOptimizers:
    def _converges(self, name, lr=0.05, steps=120, **kw):
        opt = get_optimizer(name, lr, **kw)
        params = {"w": jnp.array([2.0, -3.0])}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
            u, state = opt.update(g, state, params)
            import optax
            return optax.apply_updates(params, u), state

        for _ in range(steps):
            params, state = step(params, state)
        return float(jnp.sum(params["w"] ** 2))

    def test_all_optimizers_converge(self):
        # initial objective value is 2^2 + 3^2 = 13
        assert self._converges("sgd", momentum=0.9) < 1e-3
        assert self._converges("adam") < 1e-3
        # RAdam's rectification and Ranger's lookahead deliberately damp
        # early steps; require a >95% reduction rather than near-zero.
        assert self._converges("radam", steps=300) < 0.05 * 13
        assert self._converges("ranger", steps=600) < 0.05 * 13

    def test_weight_decay_shrinks(self):
        # pure decay on a zero-gradient direction
        opt = get_optimizer("adam", 0.01, weight_decay=0.1)
        params = {"w": jnp.array([1.0])}
        state = opt.init(params)
        import optax
        for _ in range(50):
            u, state = opt.update({"w": jnp.zeros(1)}, state, params)
            params = optax.apply_updates(params, u)
        assert float(params["w"][0]) < 1.0

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_optimizer("lamb", 0.1)

    def test_ranger_uses_reference_hypers(self):
        """Ranger's inner RAdam must run betas=(0.95, 0.999), eps=1e-5
        (reference utils/optimizers.py:268), not the RAdam defaults."""
        import optax
        from nerf_pl_tpu.training.optimizers import lookahead

        def run(opt, n=20):
            params = {"w": jnp.array([1.0, -2.0, 0.5])}
            state = opt.init(params)
            key = jax.random.PRNGKey(0)
            for i in range(n):
                key, k = jax.random.split(key)
                g = {"w": jax.random.normal(k, (3,))}
                u, state = opt.update(g, state, params)
                params = optax.apply_updates(params, u)
            return np.asarray(params["w"])

        ranger = get_optimizer("ranger", 0.01)
        expected = lookahead(optax.chain(
            optax.scale_by_radam(b1=0.95, b2=0.999, eps=1e-5),
            optax.scale_by_learning_rate(0.01)),
            sync_period=6, slow_step_size=0.5)
        default_hypers = lookahead(optax.chain(
            optax.scale_by_radam(),
            optax.scale_by_learning_rate(0.01)),
            sync_period=6, slow_step_size=0.5)
        np.testing.assert_allclose(run(ranger), run(expected), rtol=1e-6)
        assert not np.allclose(run(ranger), run(default_hypers), rtol=1e-4)

    def test_schedule_callable_lr(self):
        sched = get_lr_schedule("steplr", 1.0, 10, 5, decay_step=[2],
                                decay_gamma=0.5)
        opt = get_optimizer("adam", sched)
        params = {"w": jnp.array([1.0])}
        state = opt.init(params)
        assert state is not None


class TestLRSchedule:
    def test_steplr(self):
        s = get_lr_schedule("steplr", 1.0, 16, 10, decay_step=[2, 4],
                            decay_gamma=0.5)
        assert float(s(0)) == 1.0
        assert float(s(10)) == 1.0          # epoch 1
        np.testing.assert_allclose(float(s(20)), 0.5)   # epoch 2
        np.testing.assert_allclose(float(s(40)), 0.25)  # epoch 4
        np.testing.assert_allclose(float(s(150)), 0.25)

    def test_cosine(self):
        s = get_lr_schedule("cosine", 1.0, 10, 1)
        np.testing.assert_allclose(float(s(0)), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(s(5)), 0.5, atol=1e-3)
        assert float(s(10)) < 1e-6

    def test_poly(self):
        s = get_lr_schedule("poly", 1.0, 10, 1, poly_exp=0.9)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(5)), 0.5 ** 0.9, rtol=1e-5)

    def test_warmup_only_for_adam_sgd(self):
        s_adam = get_lr_schedule("steplr", 1.0, 10, 1, decay_step=[100],
                                 warmup_multiplier=2.0, warmup_epochs=2,
                                 optimizer="adam")
        np.testing.assert_allclose(float(s_adam(0)), 1.0)
        np.testing.assert_allclose(float(s_adam(1)), 1.5)
        np.testing.assert_allclose(float(s_adam(2)), 2.0)
        np.testing.assert_allclose(float(s_adam(5)), 2.0)  # mult * base
        s_radam = get_lr_schedule("steplr", 1.0, 10, 1, decay_step=[100],
                                  warmup_multiplier=2.0, warmup_epochs=2,
                                  optimizer="radam")
        np.testing.assert_allclose(float(s_radam(1)), 1.0)


class TestCheckpoints:
    def _state(self, v=1.0):
        from nerf_pl_tpu.parallel.spmd import TrainState
        params = {"nerf_coarse": {"xyz_0": {"w": jnp.full((3, 4), v),
                                            "b": jnp.zeros(4)}}}
        opt_state = {"mu": {"nerf_coarse": {"xyz_0": {
            "w": jnp.zeros((3, 4)), "b": jnp.zeros(4)}}}}
        return TrainState(params, opt_state, jnp.asarray(7, jnp.int32))

    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.ckpt")
        st = self._state(2.5)
        save_checkpoint(path, st, {"step": 7})
        restored, meta = load_checkpoint(path, self._state(0.0))
        assert meta["step"] == 7
        np.testing.assert_allclose(
            restored.params["nerf_coarse"]["xyz_0"]["w"], 2.5)
        assert int(restored.step) == 7

    def test_extract_model_state_dict(self, tmp_path):
        path = str(tmp_path / "a.ckpt")
        save_checkpoint(path, self._state(1.5))
        sd = extract_model_state_dict(path, "nerf_coarse")
        assert set(sd) == {"xyz_0/w", "xyz_0/b"}
        sd2 = extract_model_state_dict(path, "nerf_coarse",
                                       prefixes_to_ignore=("xyz_0/b",))
        assert set(sd2) == {"xyz_0/w"}

    def test_partial_load(self, tmp_path):
        path = str(tmp_path / "a.ckpt")
        save_checkpoint(path, self._state(3.0))
        params = {"nerf_coarse": {"xyz_0": {"w": jnp.zeros((3, 4)),
                                            "b": jnp.ones(4)},
                                  "extra": {"w": jnp.ones((2, 2)),
                                            "b": jnp.ones(2)}}}
        out = load_ckpt(params, path, "nerf_coarse")
        np.testing.assert_allclose(out["nerf_coarse"]["xyz_0"]["w"], 3.0)
        # leaf absent from ckpt keeps its value (non-strict)
        np.testing.assert_allclose(out["nerf_coarse"]["extra"]["w"], 1.0)

    def test_weights_only_export(self, tmp_path):
        full = str(tmp_path / "full.ckpt")
        slim = str(tmp_path / "slim.ckpt")
        save_checkpoint(full, self._state(1.0))
        save_weights_only(full, slim)
        assert os.path.getsize(slim) < os.path.getsize(full)
        sd = extract_model_state_dict(slim, "nerf_coarse")
        assert set(sd) == {"xyz_0/w", "xyz_0/b"}

    def test_device_fetch_matches_and_is_host(self):
        from nerf_pl_tpu.training.checkpoints import device_fetch
        st = self._state(4.5)
        host = device_fetch(st)
        for a, b in zip(jax.tree_util.tree_leaves(host),
                        jax.tree_util.tree_leaves(st)):
            assert isinstance(a, np.ndarray)
            np.testing.assert_allclose(a, np.asarray(b))
        # already-host trees (resume path) pass through unchanged
        host2 = device_fetch(host)
        np.testing.assert_allclose(
            host2.params["nerf_coarse"]["xyz_0"]["w"], 4.5)

    def test_topk(self, tmp_path):
        topk = TopKCheckpoints(str(tmp_path / "ck"), k=2)
        st = self._state()
        assert topk.maybe_save(st, 3.0, 0) is not None
        assert topk.maybe_save(st, 2.0, 1) is not None
        assert topk.maybe_save(st, 5.0, 2) is None       # worse than top-2
        p3 = topk.maybe_save(st, 1.0, 3)                  # evicts 3.0
        assert p3 is not None
        kept = sorted(f for f in os.listdir(str(tmp_path / "ck"))
                      if f.endswith(".ckpt"))
        assert kept == ["epoch=1.ckpt", "epoch=3.ckpt"]
        assert topk.best[0] == 1.0

    def test_topk_persists_across_restart(self, tmp_path):
        """Interrupt/resume keeps total files <= k and preserves the best
        (VERDICT weak #3; lightning ModelCheckpoint survives resume)."""
        ckdir = str(tmp_path / "ck")
        st = self._state()
        topk = TopKCheckpoints(ckdir, k=2)
        topk.maybe_save(st, 3.0, 0)
        topk.maybe_save(st, 1.0, 1)
        # "restart": fresh object must recover the bookkeeping from disk
        topk2 = TopKCheckpoints(ckdir, k=2)
        assert sorted(m for m, _ in topk2.entries) == [1.0, 3.0]
        assert topk2.maybe_save(st, 5.0, 2) is None       # still evicts right
        topk2.maybe_save(st, 0.5, 3)                      # evicts 3.0
        kept = sorted(f for f in os.listdir(ckdir) if f.endswith(".ckpt"))
        assert kept == ["epoch=1.ckpt", "epoch=3.ckpt"]
        assert topk2.best[0] == 0.5

    def test_extract_raises_on_missing_model(self, tmp_path):
        path = str(tmp_path / "a.ckpt")
        save_checkpoint(path, self._state(1.0))
        with pytest.raises(KeyError, match="nerf_fine"):
            extract_model_state_dict(path, "nerf_fine")

    def test_load_ckpt_raises_when_nothing_matches(self, tmp_path):
        """A load where zero leaves land in the target tree must fail loudly
        (VERDICT weak #4), not silently keep random init."""
        path = str(tmp_path / "a.ckpt")
        save_checkpoint(path, self._state(1.0))
        params = {"nerf_coarse": {"other_layer": {"w": jnp.zeros((2, 2))}}}
        with pytest.raises(KeyError, match="none match"):
            load_ckpt(params, path, "nerf_coarse")


class TestCLI:
    def test_defaults_match_reference(self):
        hp = get_opts([])
        assert hp.N_samples == 64 and hp.N_importance == 128
        assert hp.batch_size == 1024 and hp.chunk == 32 * 1024
        assert hp.lr == 5e-4 and hp.optimizer == "adam"
        assert hp.decay_step == [20] and hp.decay_gamma == 0.1

    def test_flag_parsing(self):
        hp = get_opts(["--img_wh", "400", "400", "--decay_step", "2", "4",
                       "8", "--decay_gamma", "0.5", "--spheric_poses",
                       "--num_gpus", "8"])
        assert hp.img_wh == [400, 400]
        assert hp.decay_step == [2, 4, 8]
        assert hp.spheric_poses is True and hp.num_gpus == 8


@pytest.mark.slow
class TestEndToEnd:
    def test_fit_tiny_scene(self, tmp_path):
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        # enough views that the val pose interpolates the training poses
        root = make_blender_scene(str(tmp_path / "scene"), n_train=12,
                                  n_val=1, n_test=1, wh=(24, 24))
        # NOTE: lr must stay ~5e-4: a 10x higher rate drives sigma deeply
        # negative everywhere (white-collapse) and relu kills all gradients.
        hp = Hparams(root_dir=root, dataset_name="blender",
                     img_wh=(24, 24), N_samples=16, N_importance=8,
                     perturb=1.0, noise_std=1.0, batch_size=256,
                     num_epochs=13, lr=7e-4, decay_step=[100],
                     scan_steps=81, val_chunk=288, exp_name="tiny_e2e")
        os.chdir(tmp_path)
        system = NeRFSystem(hp, enable_tb=False)
        final = system.fit()
        # 13 epochs x (12*24*24//256)=27 steps = 351 steps: must clearly
        # beat an all-white-prediction baseline (~8.5 dB).
        assert final["val/psnr"] > 16.0
        # checkpoints written
        assert os.path.exists(os.path.join("ckpts", "tiny_e2e", "last.ckpt"))

    def test_val_every_steps_mid_epoch(self, tmp_path, capsys):
        """--val_every_steps fires mid-epoch validations at segment
        boundaries (lightning val_check_interval analog) in a format
        scripts/northstar.py can timestamp, without extra checkpoints."""
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        from scripts.northstar import VAL_STEP_RE, VAL_RE
        root = make_blender_scene(str(tmp_path / "scene"), n_train=2,
                                  n_val=1, n_test=1, wh=(16, 16))
        # 2*16*16=512 rays, batch 128 -> 4 steps/epoch; scan_steps 2 and
        # val_every_steps 2 -> one mid-epoch val per epoch (at step 2, 6)
        # plus the usual epoch-boundary vals (at step 4, 8).
        hp = Hparams(root_dir=root, dataset_name="blender", img_wh=(16, 16),
                     N_samples=8, N_importance=0, batch_size=128,
                     num_epochs=2, lr=5e-4, decay_step=[100], scan_steps=2,
                     val_every_steps=2, val_chunk=256, exp_name="midval_e2e")
        os.chdir(tmp_path)
        system = NeRFSystem(hp, enable_tb=False)
        system.fit()
        out = capsys.readouterr().out
        mid = [m for line in out.splitlines()
               for m in [VAL_STEP_RE.search(line)] if m]
        epochal = [m for line in out.splitlines()
                   for m in [VAL_RE.search(line)] if m]
        assert [int(m.group(1)) for m in mid] == [2, 6]
        assert len(epochal) == 2  # epoch boundaries unchanged
        # mid-epoch vals must not add checkpoints: last + topk only
        ckpts = os.listdir(os.path.join("ckpts", "midval_e2e"))
        assert all(("last" in c) or ("epoch=" in c) or c == "topk.json"
                   for c in ckpts)

    def test_resume_from_last(self, tmp_path):
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=2,
                                  n_val=1, n_test=1, wh=(16, 16))
        common = dict(root_dir=root, dataset_name="blender",
                      img_wh=(16, 16), N_samples=8, N_importance=0,
                      batch_size=128, lr=1e-3, decay_step=[100],
                      scan_steps=4, val_chunk=256, exp_name="resume_e2e")
        os.chdir(tmp_path)
        s1 = NeRFSystem(Hparams(num_epochs=2, **common), enable_tb=False)
        s1.fit()
        step1 = int(s1.state.step)
        ckpt = os.path.join("ckpts", "resume_e2e", "last.ckpt")
        s2 = NeRFSystem(Hparams(num_epochs=4, ckpt_path=ckpt, **common),
                        enable_tb=False)
        s2.fit()
        assert int(s2.state.step) > step1


class TestSegmentClamping:
    def test_reshuffle_fires_exactly_at_epoch_boundaries(self, tmp_path):
        """scan segments are clamped to epoch boundaries so the per-epoch
        reshuffle fires exactly at steps_per_epoch multiples (ADVICE r2:
        a mid-epoch segment would re-read stale-permutation blocks)."""
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=2,
                                  n_val=1, n_test=1, wh=(16, 16))
        # 2*16*16 = 512 rays, batch 96 -> steps_per_epoch = ceil = 6;
        # scan_steps 4 does NOT divide 6.
        hp = Hparams(root_dir=root, dataset_name="blender", img_wh=(16, 16),
                     N_samples=8, N_importance=0, batch_size=96,
                     num_epochs=3, lr=5e-4, decay_step=[100], scan_steps=4,
                     val_chunk=256, exp_name="clamp_e2e")
        os.chdir(tmp_path)
        system = NeRFSystem(hp, enable_tb=False)
        calls = []
        system.prepare_data()
        system.setup()
        orig = system.trainer.reshuffle
        system.trainer.reshuffle = lambda key: (
            calls.append(int(system.state.step)), orig(key))[1]
        # re-run fit without re-setup: emulate by driving the loop directly
        system.prepare_data = lambda: None
        system.setup = lambda: None
        system.fit()
        assert system.steps_per_epoch == 6
        assert calls == [6, 12]      # at boundaries only; none at the end


@pytest.mark.slow
class TestOccTrainEndToEnd:
    def test_fit_with_occupancy_tightening(self, tmp_path, capsys):
        """--occ_train end to end: grid built after warmup, store tightened,
        training still converges."""
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=12,
                                  n_val=1, n_test=1, wh=(24, 24))
        hp = Hparams(root_dir=root, dataset_name="blender",
                     img_wh=(24, 24), N_samples=16, N_importance=8,
                     perturb=1.0, noise_std=1.0, batch_size=256,
                     num_epochs=13, lr=7e-4, decay_step=[100],
                     scan_steps=81, val_chunk=288, exp_name="occ_train_e2e",
                     occ_train=True, occ_warmup_epochs=3,
                     occ_refresh_epochs=4, occ_N=32, occ_threshold=0.5,
                     occ_margin=0.1)
        os.chdir(tmp_path)
        system = NeRFSystem(hp, enable_tb=False)
        final = system.fit()
        out = capsys.readouterr().out
        assert "[occ]" in out          # tightening actually fired
        assert final["val/psnr"] > 16.0
        # the store's sampling intervals really shrank for some rays
        nf0 = np.asarray(system.trainer.all_nf0)
        cur = np.asarray(system.trainer.all_rays)[:, 6:8]
        assert nf0 is not None
        shrunk = (cur[:, 1] - cur[:, 0]) < (nf0[:, 1] - nf0[:, 0]) - 1e-4
        assert shrunk.mean() > 0.1


@pytest.mark.slow
class TestOccPackEndToEnd:
    """--occ_pack (+ --occ_mode weight) through NeRFSystem: packing fires,
    training converges, and the packed-resume fast path (re-derive grid +
    apply only the last epoch key) restores a working packed store."""

    def _hp(self, root, num_epochs, **kw):
        from nerf_pl_tpu.config import Hparams
        return Hparams(root_dir=root, dataset_name="blender",
                       img_wh=(24, 24), N_samples=16, N_importance=8,
                       perturb=1.0, noise_std=1.0, batch_size=256,
                       num_epochs=num_epochs, lr=7e-4, decay_step=[100],
                       scan_steps=27, val_chunk=288,
                       occ_train=True, occ_warmup_epochs=3,
                       occ_refresh_epochs=4, occ_N=32, occ_threshold=0.5,
                       occ_margin=0.1, occ_segments=16, occ_dilate=1,
                       occ_pack=True, occ_mode="weight", **kw)

    def test_fit_packed_weight_mode(self, tmp_path, capsys):
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=12,
                                  n_val=1, n_test=1, wh=(24, 24))
        os.chdir(tmp_path)
        system = NeRFSystem(self._hp(root, 13, exp_name="pack_e2e"),
                            enable_tb=False)
        final = system.fit()
        out = capsys.readouterr().out
        assert "packed: x" in out            # packing actually engaged
        assert final["val/psnr"] > 16.0
        tr = system.trainer
        assert tr.all_hit is not None and tr.pack_expand > 1.05
        # survivors-first invariant still holds at the end of training
        hit = np.asarray(tr.all_hit).reshape(tr.n_data, -1)
        nsurv = np.asarray(tr.all_nsurv)
        for row, k in zip(hit, nsurv):
            assert row[:k].all() and not row[k:].any()

    def test_packed_resume(self, tmp_path):
        """Resume past warmup takes the canonical fast path: the grid is
        re-derived from the restored params and only the last epoch key is
        applied; the resumed run keeps a valid packed store and finishes
        within tolerance of the uninterrupted run."""
        from nerf_pl_tpu.training.system import NeRFSystem
        from nerf_pl_tpu.utils.synthetic import make_blender_scene
        root = make_blender_scene(str(tmp_path / "scene"), n_train=12,
                                  n_val=1, n_test=1, wh=(24, 24))
        os.chdir(tmp_path)
        sA = NeRFSystem(self._hp(root, 10, exp_name="pack_live"),
                        enable_tb=False)
        liveA = sA.fit()
        sB = NeRFSystem(self._hp(root, 7, exp_name="pack_res"),
                        enable_tb=False)
        sB.fit()
        ckpt = os.path.join("ckpts", "pack_res", "last.ckpt")
        sC = NeRFSystem(self._hp(root, 10, exp_name="pack_res",
                                 ckpt_path=ckpt), enable_tb=False)
        resC = sC.fit()
        assert int(sC.state.step) == int(sA.state.step)
        # packed store restored: grid re-derived, survivors-first layout
        assert sC.trainer.all_hit is not None
        assert sC.trainer.pack_expand > 1.05
        hit = np.asarray(sC.trainer.all_hit).reshape(sC.trainer.n_data, -1)
        nsurv = np.asarray(sC.trainer.all_nsurv)
        for row, k in zip(hit, nsurv):
            assert row[:k].all() and not row[k:].any()
        assert resC["val/psnr"] > 16.0
        assert abs(resC["val/psnr"] - liveA["val/psnr"]) < 3.0


class TestBF16CheckpointRoundtrip:
    def test_bf16_leaf_roundtrips(self, tmp_path):
        """np.savez stores ml_dtypes bfloat16 as raw void bytes; the saver
        must upcast to f32 so load_checkpoint can cast back losslessly."""
        import jax.numpy as jnp
        from nerf_pl_tpu.training.checkpoints import (load_checkpoint,
                                                      save_checkpoint)
        tree = {"w": jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16),
                "step": jnp.asarray(7, jnp.int32)}
        p = str(tmp_path / "bf16.ckpt")
        save_checkpoint(p, tree, {"epoch": 1})
        restored, meta = load_checkpoint(p, tree)
        assert restored["w"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(restored["w"], np.float32),
            np.asarray(tree["w"], np.float32))
        assert meta["epoch"] == 1
