"""The hard procedural scene (utils/synthetic.py) — determinism, geometry,
and loader compatibility. The scene is the accuracy-parity target (VERDICT
round-1 item 4): high-frequency textures, thin occluders, multi-object,
view-dependent specular."""
import numpy as np

from nerf_pl_tpu.datasets import dataset_dict
from nerf_pl_tpu.utils.synthetic import (look_at_pose,
                                         make_blender_scene,
                                         make_llff_scene,
                                         render_hard_scene_rgba)


def _view(theta=0.6, phi=0.55, dist=4.0):
    pos = dist * np.array([np.cos(theta) * np.cos(phi),
                           np.sin(theta) * np.cos(phi), np.sin(phi)])
    return look_at_pose(pos)


class TestHardSceneRender:
    def test_deterministic(self):
        c2w = _view()
        a = render_hard_scene_rgba(c2w, 32, 32, 40.0)
        b = render_hard_scene_rgba(c2w, 32, 32, 40.0)
        np.testing.assert_array_equal(a, b)

    def test_alpha_and_frequency_content(self):
        c2w = _view()
        rgba = render_hard_scene_rgba(c2w, 64, 64, 80.0)
        alpha = rgba[..., 3]
        # objects cover part of the frame, background is empty
        assert 0.15 < alpha.mean() < 0.95
        assert alpha.max() == 1.0 and alpha.min() == 0.0
        # high-frequency textures: neighboring-pixel deltas are large
        rgb = rgba[..., :3]
        grad = np.abs(np.diff(rgb, axis=1)).mean()
        assert grad > 0.02, f"texture too smooth: {grad}"

    def test_view_dependence(self):
        """Specular highlight moves with the camera: the same surface point
        changes color between views (beyond shading variation)."""
        a = render_hard_scene_rgba(_view(0.6), 48, 48, 60.0)
        b = render_hard_scene_rgba(_view(0.7), 48, 48, 60.0)
        assert np.abs(a - b).max() > 0.1

    def test_thin_occluders_visible(self):
        """The fence slats occupy a small but nonzero pixel fraction from a
        low side view (they are the hierarchical-sampling stressor)."""
        # camera nearly level with the scene, looking across the fence arc
        pos = 4.0 * np.array([0.2, -0.95, 0.15])
        rgba = render_hard_scene_rgba(look_at_pose(pos), 100, 100, 110.0)
        assert rgba[..., 3].mean() > 0.2

    def test_supersampling_antialiases(self):
        c2w = _view()
        ss1 = render_hard_scene_rgba(c2w, 32, 32, 40.0, ss=1)
        ss3 = render_hard_scene_rgba(c2w, 32, 32, 40.0, ss=3)
        # same scene, but ss>1 output has intermediate alpha at silhouettes
        frac_partial = np.mean((ss3[..., 3] > 0) & (ss3[..., 3] < 1))
        assert frac_partial > 0.01
        assert np.mean((ss1[..., 3] == 0) | (ss1[..., 3] == 1)) == 1.0


class TestHardSceneDatasets:
    def test_blender_loader_roundtrip(self, tmp_path):
        root = make_blender_scene(str(tmp_path / "hb"), n_train=2, n_val=1,
                                  n_test=1, wh=(30, 30),
                                  render_fn=render_hard_scene_rgba)
        ds = dataset_dict["blender"](root_dir=root, split="train",
                                     img_wh=(30, 30))
        assert ds.all_rays.shape == (2 * 30 * 30, 8)
        assert ds.white_back
        # white-blended: background pixels are exactly white
        assert np.isclose(np.asarray(ds.all_rgbs).max(), 1.0)

    def test_llff_loader_roundtrip(self, tmp_path):
        def cam_pos_fn(off):
            return np.array([1.5 * off, -4.0 - 0.3 * abs(off),
                             0.8 + 0.4 * off])

        root = make_llff_scene(str(tmp_path / "hl"), n_images=4, wh=(32, 24),
                               render_fn=render_hard_scene_rgba,
                               cam_pos_fn=cam_pos_fn, up=(0, 0, 1),
                               scene_radius=1.8)
        ds = dataset_dict["llff"](root_dir=root, split="train",
                                  img_wh=(32, 24))
        assert ds.all_rays.shape[0] == 3 * 32 * 24  # one image held out
        assert not ds.white_back
