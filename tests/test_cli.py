"""End-to-end CLI tests on the CPU mesh: eval.py, extract_color_mesh.py,
scripts/render_image.py, and LLFF training through NeRFSystem."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_pl_tpu.config import Hparams
from nerf_pl_tpu.models import init_nerf_params
from nerf_pl_tpu.training.checkpoints import save_checkpoint
from nerf_pl_tpu.utils.synthetic import make_blender_scene, make_llff_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_blender_scene(
        str(tmp_path_factory.mktemp("scene")), n_train=3, n_val=1,
        n_test=2, wh=(20, 20))


@pytest.fixture(scope="module")
def random_ckpt(tmp_path_factory):
    """A params-only checkpoint with random weights (plumbing tests)."""
    kc, kf = jax.random.split(jax.random.PRNGKey(0))
    params = {"nerf_coarse": init_nerf_params(kc),
              "nerf_fine": init_nerf_params(kf)}
    path = str(tmp_path_factory.mktemp("ck") / "w.ckpt")
    save_checkpoint(path, {"params": params})
    return path


class TestEvalCLI:
    def test_blender_test_split(self, scene, random_ckpt, tmp_path):
        import eval as eval_cli
        out = str(tmp_path / "results")
        psnr = eval_cli.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--scene_name", "t", "--img_wh", "20", "20",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "256", "--ckpt_path", random_ckpt,
            "--save_depth", "--out_dir", out,
            "--metrics_out", str(tmp_path / "m.json"), "--save_gt"])
        d = os.path.join(out, "blender", "t")
        assert os.path.exists(os.path.join(d, "000.png"))
        assert os.path.exists(os.path.join(d, "001.png"))
        assert os.path.exists(os.path.join(d, "t.gif"))
        assert os.path.exists(os.path.join(d, "depth_000.pfm"))
        assert os.path.exists(os.path.join(d, "gt_000.png"))
        assert psnr is not None and np.isfinite(psnr)
        # auditable metrics artifact: per-view rows reproduce the mean
        import json
        with open(tmp_path / "m.json") as f:
            m = json.load(f)
        assert len(m["per_view"]) == m["n_views"]
        assert abs(np.mean([r["psnr"] for r in m["per_view"]])
                   - m["mean_psnr"]) < 1e-3
        assert abs(m["mean_psnr"] - psnr) < 1e-3
        assert all(0.0 <= r["ssim"] <= 1.0 for r in m["per_view"])
        assert m["flags"]["img_wh"] == [20, 20]

    def test_occ_grid_eval(self, scene, random_ckpt, tmp_path):
        """eval.py --occ_grid plumbing: culled path writes the same outputs."""
        import eval as eval_cli
        out = str(tmp_path / "results_occ")
        psnr = eval_cli.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--scene_name", "oc", "--img_wh", "20", "20",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "128", "--ckpt_path", random_ckpt,
            "--occ_grid", "--occ_threshold", "-100", "--occ_N", "16",
            "--out_dir", out])
        d = os.path.join(out, "blender", "oc")
        assert os.path.exists(os.path.join(d, "000.png"))
        assert psnr is not None and np.isfinite(psnr)

    def test_occ_bucket_fracs_eval(self, scene, random_ckpt, tmp_path):
        """--occ_bucket_fracs reaches the budgeted renderer (4-tier)."""
        import eval as eval_cli
        out = str(tmp_path / "results_bf")
        psnr = eval_cli.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--scene_name", "bf", "--img_wh", "20", "20",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "128", "--ckpt_path", random_ckpt,
            "--occ_grid", "--occ_threshold", "-100", "--occ_N", "16",
            "--occ_budgets", "--occ_segments", "8",
            "--occ_bucket_fracs", "0.125", "0.25", "0.5", "1.0",
            "--out_dir", out])
        d = os.path.join(out, "blender", "bf")
        assert os.path.exists(os.path.join(d, "000.png"))
        assert psnr is not None and np.isfinite(psnr)

    def test_llff_test_train_scored(self, random_ckpt, tmp_path):
        import eval as eval_cli
        root = make_llff_scene(str(tmp_path / "llff"), wh=(20, 16),
                               n_images=4)
        out = str(tmp_path / "results")
        # monkeied down path: 120 spiral poses is slow on CPU; use
        # test_train (renders the 4 training poses instead)
        psnr = eval_cli.main([
            "--root_dir", root, "--dataset_name", "llff",
            "--split", "test_train", "--scene_name", "sp",
            "--img_wh", "20", "16", "--N_samples", "8",
            "--N_importance", "4", "--chunk", "128",
            "--ckpt_path", random_ckpt, "--out_dir", out])
        d = os.path.join(out, "llff", "sp")
        assert os.path.exists(os.path.join(d, "sp.gif"))
        # test_train poses are capture poses: GT attached, split scored
        assert psnr is not None and np.isfinite(psnr)


class TestRenderImageScript:
    def test_single_image(self, scene, random_ckpt, tmp_path):
        from scripts import render_image
        dt = render_image.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--split", "val", "--idx", "0", "--img_wh", "20", "20",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "256", "--ckpt_path", random_ckpt,
            "--out_dir", str(tmp_path)])
        assert dt > 0
        assert os.path.exists(str(tmp_path / "render_000.png"))
        assert os.path.exists(str(tmp_path / "depth_000.png"))


class TestBenchRenderScript:
    def test_matrix_fields_and_parity(self, scene, random_ckpt, tmp_path):
        """The measurement harness itself: every matrix row carries the
        fields the published BENCH_NOTES tables are built from, the
        device-resident perturbed-ray timing path runs, and the plain
        cull row (threshold -100 keeps every box, so zero rays are
        dropped) reproduces the dense image bit-for-bit (psnr inf)."""
        import json

        from scripts import bench_render
        out = str(tmp_path / "matrix.json")
        bench_render.main([
            "--root_dir", scene, "--dataset_name", "blender",
            "--split", "test", "--idx", "0", "--img_wh", "20", "20",
            "--N_samples", "8", "--N_importance", "4",
            "--chunk", "128", "--culled_chunk", "128",
            "--ckpt_path", random_ckpt,
            "--occ_mode", "sigma", "--occ_threshold", "-100",
            "--occ_N", "16", "--repeats", "2",
            "--configs", "dense", "cull", "budgets", "segments",
            "--json_out", out])
        with open(out) as f:
            m = json.load(f)
        rows = {r["config"]: r for r in m["rows"]}
        assert set(rows) == {"dense", "cull", "budgets", "segments"}
        for r in m["rows"]:
            assert len(r["secs_frame_all"]) == 2
            assert r["secs_frame_best"] == r["secs_frame_all"][0] > 0
            assert r["secs_frame_all"] == sorted(r["secs_frame_all"])
            # blender test split carries GT: quality column must exist
            assert np.isfinite(r["psnr_vs_gt"])
        # every box occupied -> no ray culled -> cull == dense exactly
        assert rows["cull"]["n_survivors"] == 400
        assert rows["cull"]["psnr_vs_dense"] == float("inf")
        # fully-occupied grid: segment placement degenerates to the dense
        # sample ladder too (inf allowed; anything above 30 dB is parity)
        assert rows["segments"]["psnr_vs_dense"] > 30
        assert len(rows["budgets"]["bucket_counts"]) >= 1


class TestPreviewBoundsScript:
    def test_slices_and_suggestion(self, random_ckpt, tmp_path):
        """extract_mesh.ipynb cells 2-5 equivalent: sigma-slice previews +
        suggested tight bounds + optional colorless preview mesh."""
        from scripts import preview_bounds
        out = str(tmp_path / "bp")
        mesh_path = str(tmp_path / "prev.dae")
        bounds = preview_bounds.main([
            "--ckpt_path", random_ckpt, "--N_grid", "24",
            "--sigma_threshold", "0.05", "--chunk", "4096",
            "--n_slices", "4", "--preview_mesh", mesh_path,
            "--out_dir", out])
        for ax in "xyz":
            assert os.path.exists(os.path.join(out, f"slices_{ax}.png"))
            lo, hi = bounds[ax]
            assert -1.2 <= lo <= hi <= 1.2
        if os.path.exists(mesh_path):  # surface exists at this threshold
            from nerf_pl_tpu.mesh import read_dae
            v, t, c = read_dae(mesh_path)
            assert len(t) > 0 and c is None


class TestSaveWeightsOnlyScript:
    def test_roundtrip(self, tmp_path):
        from nerf_pl_tpu.parallel.spmd import TrainState
        from scripts import save_weights_only as swo
        import jax.numpy as jnp
        params = {"nerf_coarse": init_nerf_params(jax.random.PRNGKey(0))}
        state = TrainState(params, {"mu": params}, jnp.zeros([], jnp.int32))
        full = str(tmp_path / "full.ckpt")
        save_checkpoint(full, state)
        out = str(tmp_path / "slim.ckpt")
        swo.main(["--ckpt_path", full, "--out", out])
        assert os.path.getsize(out) < os.path.getsize(full)
        # the reference's "portable scene" is ~5 MB for 2 MLPs; 1 MLP ~2.4
        assert os.path.getsize(out) < 4e6


@pytest.mark.slow
class TestMeshCLI:
    def test_extract_after_short_training(self, tmp_path):
        """Train briefly so a surface exists, then run the mesh CLI."""
        from nerf_pl_tpu.training.system import NeRFSystem
        root = make_blender_scene(str(tmp_path / "scene"), n_train=8,
                                  n_val=1, n_test=1, wh=(20, 20))
        os.chdir(tmp_path)
        hp = Hparams(root_dir=root, dataset_name="blender", img_wh=(20, 20),
                     N_samples=12, N_importance=6, perturb=1.0,
                     noise_std=1.0, batch_size=256, num_epochs=30,
                     lr=7e-4, decay_step=[100], scan_steps=120,
                     val_chunk=400, exp_name="mesh_e2e")
        NeRFSystem(hp, enable_tb=False).fit()

        import extract_color_mesh as mesh_cli
        mesh_cli.main([
            "--root_dir", root, "--dataset_name", "blender",
            "--scene_name", "m", "--img_wh", "20", "20",
            "--N_grid", "48", "--sigma_threshold", "2.0",
            "--x_range", "-1.3", "1.3", "--y_range", "-1.3", "1.3",
            "--z_range", "-1.3", "1.3", "--chunk", "4096",
            "--ckpt_path", "ckpts/mesh_e2e/last.ckpt", "--export_vol",
            "--out_dir", str(tmp_path)])
        from nerf_pl_tpu.mesh.ply import read_ply
        v, t, c = read_ply(str(tmp_path / "m.ply"))
        assert len(v) > 100 and len(t) > 100
        assert c is not None
        # extracted surface should be roughly the unit sphere
        r = np.linalg.norm(v, axis=1)
        assert 0.6 < np.median(r) < 1.4
        assert os.path.exists(str(tmp_path / "m.vol"))


@pytest.mark.slow
class TestLLFFTraining:
    def test_llff_ndc_fit(self, tmp_path):
        from nerf_pl_tpu.training.system import NeRFSystem
        root = make_llff_scene(str(tmp_path / "llff"), wh=(24, 18),
                               n_images=6)
        os.chdir(tmp_path)
        hp = Hparams(root_dir=root, dataset_name="llff", img_wh=(24, 18),
                     N_samples=12, N_importance=6, perturb=1.0,
                     noise_std=1.0, batch_size=216, num_epochs=25,
                     lr=7e-4, decay_step=[100], scan_steps=50,
                     val_chunk=432, exp_name="llff_e2e")
        final = NeRFSystem(hp, enable_tb=False).fit()
        # NDC forward-facing scene must beat a mean-image baseline
        assert final["val/psnr"] > 14.0


class TestNorthstarHarness:
    def test_sigterm_kills_child_and_writes_partial(self, tmp_path):
        """`timeout` SIGTERMs northstar.py, NOT the wrapped train.py —
        the harness must kill the child itself (an orphan holds the TPU
        and wedges every queued stage behind it) and still write the
        partial JSON with the crossings collected so far."""
        import json
        import signal
        import subprocess
        import time

        stub = tmp_path / "stub_train.py"
        stub.write_text(
            "import os, sys, time\n"
            f"open({str(tmp_path / 'child.pid')!r}, 'w')"
            ".write(str(os.getpid()))\n"
            "print('[val] epoch 1 loss=0.0100 psnr=26.00 ssim=0.900',"
            " flush=True)\n"
            "time.sleep(300)\n")
        out = tmp_path / "ns.json"
        repo = os.path.join(os.path.dirname(__file__), "..")
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "scripts", "northstar.py"),
             "--json_out", str(out), "--thresholds", "25.0", "40.0",
             "--train_script", str(stub)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        # wait until the harness echoed the crossing, then SIGTERM it
        for line in proc.stdout:
            if "crossed 25.0" in line:
                break
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)

        data = json.loads(out.read_text())
        assert data["returncode"] is None        # partial artifact
        assert data["thresholds_wall_s"].keys() == {"25.0"}
        assert data["epochs"][0]["val_psnr"] == 26.00
        # the stub child must be dead (reaped or at least signaled)
        child = int((tmp_path / "child.pid").read_text())
        for _ in range(50):
            try:
                os.kill(child, 0)
            except ProcessLookupError:
                break
            time.sleep(0.1)
        else:
            os.kill(child, signal.SIGKILL)
            pytest.fail("train child survived northstar SIGTERM")
