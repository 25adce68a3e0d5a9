"""Extra system-level coverage: multi-chip fit through NeRFSystem, bf16
precision, disparity sampling, warmup schedule in fit, vertex-normal mesh
branch plumbing."""
import os

import jax
import numpy as np
import pytest

from nerf_pl_tpu.config import Hparams
from nerf_pl_tpu.models import init_nerf_params
from nerf_pl_tpu.parallel import make_mesh
from nerf_pl_tpu.training.checkpoints import save_checkpoint
from nerf_pl_tpu.training.system import NeRFSystem
from nerf_pl_tpu.utils.synthetic import make_blender_scene


def tiny_hp(root, **over):
    base = dict(root_dir=root, dataset_name="blender", img_wh=(16, 16),
                N_samples=8, N_importance=4, perturb=1.0, noise_std=1.0,
                batch_size=256, num_epochs=2, lr=5e-4, decay_step=[100],
                scan_steps=4, val_chunk=256, exp_name="sys_extra")
    base.update(over)
    return Hparams(**base)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp("scene")),
                              n_train=4, n_val=1, n_test=1, wh=(16, 16))


class TestMultiChipSystem:
    @pytest.mark.slow
    def test_fit_on_8_device_mesh(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, num_gpus=8, exp_name="mc8")
        system = NeRFSystem(hp, mesh=make_mesh(num_data=8),
                            enable_tb=False)
        final = system.fit()
        assert np.isfinite(final["val/psnr"])
        assert system.trainer.n_data == 8
        # ray store genuinely sharded 8 ways
        shards = {s.data.shape[0]
                  for s in system.trainer.all_rays.addressable_shards}
        assert shards == {system.trainer.all_rays.shape[0] // 8}

    def test_num_gpus_capped_to_available(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, num_gpus=64, batch_size=256, exp_name="mc64")
        system = NeRFSystem(hp, enable_tb=False)
        system.prepare_data()
        system.setup()
        assert system.mesh.shape["data"] <= len(jax.devices())


class TestConfigVariants:
    @pytest.mark.slow
    def test_bfloat16_precision(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, precision="bfloat16", exp_name="bf16")
        final = NeRFSystem(hp, enable_tb=False).fit()
        assert np.isfinite(final["val/psnr"])

    @pytest.mark.slow

    def test_use_disp(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, use_disp=True, exp_name="disp")
        final = NeRFSystem(hp, enable_tb=False).fit()
        assert np.isfinite(final["val/psnr"])

    def test_warmup_and_sgd(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, optimizer="sgd", warmup_epochs=1,
                     warmup_multiplier=2.0, exp_name="warm")
        final = NeRFSystem(hp, enable_tb=False).fit()
        assert np.isfinite(final["val/psnr"])

    def test_ranger_optimizer(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, optimizer="ranger", exp_name="rang")
        final = NeRFSystem(hp, enable_tb=False).fit()
        assert np.isfinite(final["val/psnr"])

    def test_coarse_only(self, scene, tmp_path):
        os.chdir(tmp_path)
        hp = tiny_hp(scene, N_importance=0, exp_name="coarse")
        system = NeRFSystem(hp, enable_tb=False)
        final = system.fit()
        assert "nerf_fine" not in system.state.params
        assert np.isfinite(final["val/psnr"])


class TestVertexNormalMesh:
    def test_vertex_normal_branch(self, scene, tmp_path):
        """Plumbing test of --use_vertex_normal with a random field: a low
        sigma threshold guarantees some iso-surface exists."""
        import extract_color_mesh as mesh_cli
        kc, kf = jax.random.split(jax.random.PRNGKey(0))
        params = {"nerf_coarse": init_nerf_params(kc),
                  "nerf_fine": init_nerf_params(kf)}
        # shift sigma to ~2 +- noise so the threshold-2 level set exists
        for m in params.values():
            m["sigma"]["w"] = m["sigma"]["w"] * 50
            m["sigma"]["b"] = m["sigma"]["b"] + 2.0
        ckpt = str(tmp_path / "w.ckpt")
        save_checkpoint(ckpt, {"params": params})
        mesh_cli.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--scene_name", "vn", "--img_wh", "16", "16",
            "--N_grid", "24", "--sigma_threshold", "2.0",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "4096", "--ckpt_path", ckpt,
            "--use_vertex_normal", "--out_dir", str(tmp_path)])
        from nerf_pl_tpu.mesh.ply import read_ply
        v, t, c = read_ply(str(tmp_path / "vn.ply"))
        assert len(v) > 0 and c is not None
        assert np.all(np.isfinite(v))
