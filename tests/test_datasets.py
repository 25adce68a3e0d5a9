"""Dataset loader tests against generated synthetic scenes."""
import numpy as np
import pytest

from nerf_pl_tpu.datasets import BlenderDataset, LLFFDataset, dataset_dict
from nerf_pl_tpu.datasets.depth_utils import read_pfm, save_pfm
from nerf_pl_tpu.utils.synthetic import make_blender_scene, make_llff_scene


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_scene(
        str(tmp_path_factory.mktemp("blender_scene")), wh=(40, 40))


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    return make_llff_scene(
        str(tmp_path_factory.mktemp("llff_scene")), wh=(40, 30))


class TestRegistry:
    def test_names(self):
        assert set(dataset_dict) == {"blender", "llff"}


class TestBlender:
    def test_train_prebaked(self, blender_root):
        ds = BlenderDataset(blender_root, "train", (40, 40))
        assert ds.all_rays.shape == (6 * 40 * 40, 8)
        assert ds.all_rgbs.shape == (6 * 40 * 40, 3)
        assert ds.white_back is True
        assert len(ds) == 6 * 40 * 40
        item = ds[0]
        assert item["rays"].shape == (8,) and item["rgbs"].shape == (3,)
        # near/far columns
        np.testing.assert_allclose(ds.all_rays[:, 6], 2.0)
        np.testing.assert_allclose(ds.all_rays[:, 7], 6.0)
        # directions normalized
        np.testing.assert_allclose(
            np.linalg.norm(ds.all_rays[:, 3:6], axis=-1), 1, atol=1e-5)

    def test_white_background_blend(self, blender_root):
        ds = BlenderDataset(blender_root, "train", (40, 40))
        # Background pixels (alpha 0) must be blended to pure white.
        frac_white = np.mean(np.all(ds.all_rgbs > 0.999, axis=-1))
        assert frac_white > 0.3  # sphere covers well under 70% of frame

    def test_val_item(self, blender_root):
        ds = BlenderDataset(blender_root, "val", (40, 40))
        assert len(ds) == 2
        item = ds[0]
        assert item["rays"].shape == (1600, 8)
        assert item["rgbs"].shape == (1600, 3)
        assert item["valid_mask"].shape == (1600,)
        assert item["valid_mask"].sum() > 0

    def test_val_len_capped_at_8(self, tmp_path):
        root = make_blender_scene(str(tmp_path / "s"), n_val=12, wh=(16, 16))
        assert len(BlenderDataset(root, "val", (16, 16))) == 8

    def test_focal_rescale(self, blender_root):
        ds40 = BlenderDataset(blender_root, "train", (40, 40))
        ds20 = BlenderDataset(blender_root, "val", (20, 20))
        np.testing.assert_allclose(ds40.focal / 2, ds20.focal, rtol=1e-6)

    def test_requires_square(self, blender_root):
        with pytest.raises(AssertionError):
            BlenderDataset(blender_root, "train", (40, 20))

    def test_rays_hit_sphere_region(self, blender_root):
        # Camera at distance 4, sphere radius 1: central rays' closest
        # approach to origin must be < 1.
        ds = BlenderDataset(blender_root, "val", (40, 40))
        rays = ds[0]["rays"]
        o, d = rays[:, :3], rays[:, 3:6]
        t_close = -np.sum(o * d, -1)
        dist = np.linalg.norm(o + t_close[:, None] * d, axis=-1)
        assert dist.min() < 0.2  # some ray passes near the center


class TestLLFF:
    def test_train_ndc(self, llff_root):
        ds = LLFFDataset(llff_root, "train", (40, 30))
        # one image held out for val
        assert ds.all_rays.shape == (4 * 40 * 30, 8)
        assert ds.white_back is False
        # NDC: near=0, far=1
        np.testing.assert_allclose(ds.all_rays[:, 6], 0.0)
        np.testing.assert_allclose(ds.all_rays[:, 7], 1.0)
        # NDC origins inside the cube (roughly)
        assert np.abs(ds.all_rays[:, :3]).max() < 2.0

    def test_scale_normalization(self, llff_root):
        ds = LLFFDataset(llff_root, "train", (40, 30))
        np.testing.assert_allclose(ds.bounds.min(), 1 / 0.75, rtol=1e-6)

    def test_val_item(self, llff_root):
        ds = LLFFDataset(llff_root, "val", (40, 30), val_num=3)
        assert len(ds) == 3
        item = ds[0]
        assert item["rays"].shape == (1200, 8)
        assert item["rgbs"].shape == (1200, 3)

    def test_val_num_holds_out_distinct_views(self, llff_root):
        """val_num > 1 = that many DISTINCT nearest-center views, all
        excluded from training (not the reference's replication of one)."""
        ds = LLFFDataset(llff_root, "val", (40, 30), val_num=3)
        assert len(set(ds.image_paths_val)) == 3
        poses = np.stack(ds.c2w_vals)
        assert not np.allclose(poses[0], poses[1])
        # nearest-first: val_idxs[0] is the reference's single val view
        ds1 = LLFFDataset(llff_root, "val", (40, 30), val_num=1)
        assert ds.val_idxs[0] == ds1.val_idxs[0]
        # training excludes all three
        tr = LLFFDataset(llff_root, "train", (40, 30), val_num=3)
        assert tr.all_rays.shape == (2 * 40 * 30, 8)  # 5 images - 3 held out

    def test_spheric(self, llff_root):
        ds = LLFFDataset(llff_root, "train", (40, 30), spheric_poses=True)
        near = ds.bounds.min()
        np.testing.assert_allclose(ds.all_rays[:, 6], near, rtol=1e-5)
        assert np.all(ds.all_rays[:, 7] <= 8 * near + 1e-4)

    def test_test_split_spiral(self, llff_root):
        ds = LLFFDataset(llff_root, "test", (40, 30))
        assert len(ds) == 120
        item = ds[0]
        assert item["rays"].shape == (1200, 8)
        assert "rgbs" not in item

    def test_test_train_split(self, llff_root):
        ds = LLFFDataset(llff_root, "test_train", (40, 30))
        assert len(ds) == 5  # all poses
        # capture poses carry their ground truth so eval.py can score them
        item = ds[0]
        assert item["rgbs"].shape == (1200, 3)

    def test_test_split_spheric(self, llff_root):
        ds = LLFFDataset(llff_root, "test", (40, 30), spheric_poses=True)
        assert len(ds) == 120

    def test_aspect_assert(self, llff_root):
        with pytest.raises(AssertionError):
            LLFFDataset(llff_root, "train", (40, 40))


class TestPFM:
    def test_roundtrip(self, tmp_path, rng):
        depth = rng.random((12, 17)).astype(np.float32)
        path = str(tmp_path / "d.pfm")
        save_pfm(path, depth)
        loaded, scale = read_pfm(path)
        np.testing.assert_allclose(loaded, depth, atol=1e-7)

    def test_roundtrip_color(self, tmp_path, rng):
        img = rng.random((8, 9, 3)).astype(np.float32)
        path = str(tmp_path / "c.pfm")
        save_pfm(path, img)
        loaded, _ = read_pfm(path)
        np.testing.assert_allclose(loaded, img, atol=1e-7)

    def test_rejects_f64(self, tmp_path):
        with pytest.raises(ValueError):
            save_pfm(str(tmp_path / "x.pfm"), np.zeros((4, 4)))
