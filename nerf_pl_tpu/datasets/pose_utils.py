"""Camera-pose utilities for real (COLMAP/LLFF) scenes.

Pose centering, average-pose computation, and synthetic render paths
(spiral for forward-facing scenes, downward-tilted circle for 360 captures).
Parity: reference datasets/llff.py:12-156.
"""
from __future__ import annotations

import numpy as np


def normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def average_poses(poses: np.ndarray) -> np.ndarray:
    """Average camera pose of (N, 3, 4) c2w matrices.

    Center = mean of camera centers; z = normalized mean z axis; y' = mean y
    axis; x = normalize(y' x z); y = z x x. Parity: reference llff.py:17-53.
    """
    center = poses[..., 3].mean(0)
    z = normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], axis=1)  # (3, 4)


def center_poses(poses: np.ndarray):
    """Re-express all poses relative to the average pose.

    Parity: reference llff.py:56-80.

    Returns: (poses_centered (N,3,4), inv_avg_homo (4,4)).
    """
    pose_avg = average_poses(poses)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], axis=1)  # (N, 4, 4)
    inv = np.linalg.inv(pose_avg_homo)
    poses_centered = (inv @ poses_homo)[:, :3]
    return poses_centered, inv


def create_spiral_poses(radii: np.ndarray, focus_depth: float,
                        n_poses: int = 120) -> np.ndarray:
    """Spiral path for forward-facing scene flythroughs (2 turns of 2*pi).

    Parity: reference llff.py:83-115.
    """
    poses_spiral = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = normalize(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0, 1.0, 0])
        x = normalize(np.cross(y_, z))
        y = np.cross(z, x)
        poses_spiral.append(np.stack([x, y, z, center], axis=1))
    return np.stack(poses_spiral, 0)


def create_spheric_poses(radius: float, n_poses: int = 120) -> np.ndarray:
    """Circle of poses around +z looking 36 degrees downward (360 captures).

    Parity: reference llff.py:118-156.
    """

    def spheric_pose(theta, phi, radius):
        trans_t = lambda t: np.array([
            [1, 0, 0, 0],
            [0, 1, 0, -0.9 * t],
            [0, 0, 1, t],
            [0, 0, 0, 1.0],
        ])
        rot_phi = lambda ph: np.array([
            [1, 0, 0, 0],
            [0, np.cos(ph), -np.sin(ph), 0],
            [0, np.sin(ph), np.cos(ph), 0],
            [0, 0, 0, 1.0],
        ])
        rot_theta = lambda th: np.array([
            [np.cos(th), 0, -np.sin(th), 0],
            [0, 1, 0, 0],
            [np.sin(th), 0, np.cos(th), 0],
            [0, 0, 0, 1.0],
        ])
        c2w = rot_theta(theta) @ rot_phi(phi) @ trans_t(radius)
        c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                        [0, 1, 0, 0], [0, 0, 0, 1.0]]) @ c2w
        return c2w[:3]

    return np.stack(
        [spheric_pose(th, -np.pi / 5, radius)
         for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]], 0)
