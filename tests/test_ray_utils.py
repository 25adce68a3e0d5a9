"""Geometry unit tests against hand-computed values (SURVEY.md §4: this is
where silent wrongness hides — axis conventions, no +0.5 centering, NDC)."""
import numpy as np
import pytest

from nerf_pl_tpu.datasets.ray_utils import (get_ndc_rays, get_ray_directions,
                                            get_rays)
from nerf_pl_tpu.datasets.pose_utils import (average_poses, center_poses,
                                             create_spheric_poses,
                                             create_spiral_poses)


class TestGetRayDirections:
    def test_shape_and_center_pixel(self):
        H, W, f = 4, 6, 2.0
        d = get_ray_directions(H, W, f)
        assert d.shape == (H, W, 3)
        # Pixel (i=W/2, j=H/2) looks straight down -z (no +0.5 centering).
        np.testing.assert_allclose(d[H // 2, W // 2], [0, 0, -1], atol=1e-7)

    def test_hand_computed_corner(self):
        H, W, f = 2, 2, 1.0
        d = get_ray_directions(H, W, f)
        # pixel (row j=0, col i=0): ((0-1)/1, -(0-1)/1, -1) = (-1, 1, -1)
        np.testing.assert_allclose(d[0, 0], [-1, 1, -1], atol=1e-7)
        # pixel (j=1, i=1): (0, 0, -1)
        np.testing.assert_allclose(d[1, 1], [0, 0, -1], atol=1e-7)

    def test_x_right_y_up(self):
        d = get_ray_directions(8, 8, 4.0)
        assert d[0, 7, 0] > 0     # right side of image -> +x
        assert d[0, 7, 1] > 0     # top of image (row 0) -> +y
        assert np.all(d[..., 2] == -1)


class TestGetRays:
    def test_identity_pose(self):
        d = get_ray_directions(2, 2, 1.0)
        c2w = np.eye(4)[:3]
        rays_o, rays_d = get_rays(d, c2w)
        assert rays_o.shape == (4, 3) and rays_d.shape == (4, 3)
        np.testing.assert_allclose(rays_o, 0, atol=1e-7)
        np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1, atol=1e-6)
        # center-ish pixel (j=1,i=1) direction (0,0,-1) stays (0,0,-1)
        np.testing.assert_allclose(rays_d[3], [0, 0, -1], atol=1e-7)

    def test_translation_only(self):
        d = get_ray_directions(2, 2, 1.0)
        c2w = np.concatenate([np.eye(3), np.array([[1.0], [2.0], [3.0]])], 1)
        rays_o, _ = get_rays(d, c2w)
        np.testing.assert_allclose(rays_o, np.tile([1, 2, 3], (4, 1)), atol=1e-7)

    def test_rotation(self):
        # 90 degrees about y: camera -z maps to world -x.
        d = get_ray_directions(2, 2, 1e9)  # ~all rays straight ahead
        R = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]])  # rot_y(90)
        c2w = np.concatenate([R, np.zeros((3, 1))], 1)
        _, rays_d = get_rays(d, c2w)
        np.testing.assert_allclose(rays_d, np.tile([-1, 0, 0], (4, 1)), atol=1e-5)


class TestNDCRays:
    def test_near_plane_origin_maps_inside_cube(self):
        H = W = 8
        f = 4.0
        d = get_ray_directions(H, W, f)
        c2w = np.eye(4)[:3]
        rays_o, rays_d = get_rays(d, c2w)
        ndc_o, ndc_d = get_ndc_rays(H, W, f, 1.0, rays_o, rays_d)
        # Origins now sit on the z=-1 NDC near plane face: o2 = 1 + 2n/oz with
        # oz = -near = -1 -> o2 = -1.
        np.testing.assert_allclose(ndc_o[:, 2], -1, atol=1e-6)
        # o + d must land on the far plane z=1: d2 = 1 - o2 -> o2+d2 = 1.
        np.testing.assert_allclose((ndc_o + ndc_d)[:, 2], 1, atol=1e-6)

    def test_central_ray(self):
        # A ray straight down -z from the origin maps to the NDC origin ray.
        rays_o = np.array([[0.0, 0.0, 0.0]])
        rays_d = np.array([[0.0, 0.0, -1.0]])
        ndc_o, ndc_d = get_ndc_rays(8, 8, 4.0, 1.0, rays_o, rays_d)
        np.testing.assert_allclose(ndc_o[0], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(ndc_d[0], [0, 0, 2], atol=1e-6)


class TestPoseUtils:
    def test_average_poses_identity(self):
        poses = np.tile(np.eye(4)[:3], (5, 1, 1))
        avg = average_poses(poses)
        np.testing.assert_allclose(avg, np.eye(4)[:3], atol=1e-7)

    def test_average_is_orthonormal(self, rng):
        # random rotations via QR
        poses = []
        for _ in range(6):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            q *= np.sign(np.linalg.det(q))
            poses.append(np.concatenate([q, rng.normal(size=(3, 1))], 1))
        avg = average_poses(np.stack(poses))
        R = avg[:, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)

    def test_center_poses_average_becomes_identity(self, rng):
        poses = []
        for _ in range(4):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            q *= np.sign(np.linalg.det(q))
            poses.append(np.concatenate([q, rng.normal(size=(3, 1))], 1))
        poses = np.stack(poses)
        centered, _ = center_poses(poses)
        avg_after = average_poses(centered)
        np.testing.assert_allclose(avg_after, np.eye(4)[:3], atol=1e-6)

    def test_spiral_poses(self):
        p = create_spiral_poses(np.array([1.0, 1.0, 0.5]), 3.5, n_poses=30)
        assert p.shape == (30, 3, 4)
        R = p[:, :, :3]
        np.testing.assert_allclose(
            np.einsum('nij,nkj->nik', R, R), np.tile(np.eye(3), (30, 1, 1)),
            atol=1e-6)

    def test_spheric_poses(self):
        p = create_spheric_poses(2.0, n_poses=12)
        assert p.shape == (12, 3, 4)
        R = p[:, :, :3]
        np.testing.assert_allclose(
            np.einsum('nij,nkj->nik', R, R), np.tile(np.eye(3), (12, 1, 1)),
            atol=1e-6)
        # all cameras at the same height (the final axis-flip maps the
        # constant pre-flip y translation to world z), looking inward/down
        assert np.allclose(p[:, 2, 3], p[0, 2, 3], atol=1e-6)
