"""Mesh subsystem tests: native iso-surface + clustering, PLY I/O,
projection/color fusion helpers, .vol export."""
import os
import struct

import numpy as np
import pytest

from nerf_pl_tpu.mesh import cluster_triangles, marching_cubes, write_ply
from nerf_pl_tpu.mesh.extract import (bilinear_sample, compute_vertex_normals,
                                      export_vol, grid_to_world, make_grid)
from nerf_pl_tpu.mesh.native import keep_largest_cluster
from nerf_pl_tpu.mesh.ply import read_ply


def sphere_field(n=32, r=1.0, extent=1.5):
    g = np.linspace(-extent, extent, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return r - np.sqrt(X ** 2 + Y ** 2 + Z ** 2), g


class TestMarchingCubes:
    def test_sphere_radius_and_area(self):
        n = 48
        field, g = sphere_field(n)
        v, t = marching_cubes(field, 0.0)
        assert len(v) > 1000 and len(t) > 2000
        coords = v / (n - 1) * 3.0 - 1.5
        r = np.linalg.norm(coords, axis=1)
        assert abs(r.mean() - 1.0) < 0.01
        assert r.std() < 0.01
        p = coords[t]
        area = 0.5 * np.linalg.norm(
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1).sum()
        assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.01

    def test_watertight(self):
        # every edge of the triangle mesh is shared by exactly 2 triangles
        field, _ = sphere_field(24)
        v, t = marching_cubes(field, 0.0)
        edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert np.all(counts == 2)

    def test_empty_field(self):
        v, t = marching_cubes(np.zeros((8, 8, 8), np.float32), 1.0)
        assert len(v) == 0 and len(t) == 0

    def test_indices_valid(self):
        field, _ = sphere_field(16)
        v, t = marching_cubes(field, 0.0)
        assert t.min() >= 0 and t.max() < len(v)


class TestClustering:
    def test_two_blobs(self):
        n = 32
        g = np.linspace(-1.5, 1.5, n)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        f1 = 0.5 - np.sqrt((X + 0.8) ** 2 + Y ** 2 + Z ** 2)
        f2 = 0.3 - np.sqrt((X - 0.9) ** 2 + Y ** 2 + Z ** 2)
        v, t = marching_cubes(np.maximum(f1, f2), 0.0)
        idx, counts = cluster_triangles(t, len(v))
        assert len(counts) == 2
        v2, t2 = keep_largest_cluster(v, t)
        assert len(t2) == counts.max()
        assert t2.max() < len(v2)

    def test_single_cluster(self):
        field, _ = sphere_field(16)
        v, t = marching_cubes(field, 0.0)
        _, counts = cluster_triangles(t, len(v))
        assert len(counts) == 1


class TestPly:
    def test_roundtrip_colored(self, tmp_path, rng):
        v = rng.random((10, 3)).astype(np.float32)
        t = rng.integers(0, 10, (7, 3)).astype(np.int32)
        c = rng.integers(0, 255, (10, 3)).astype(np.uint8)
        path = str(tmp_path / "m.ply")
        write_ply(path, v, t, c)
        v2, t2, c2 = read_ply(path)
        np.testing.assert_allclose(v2, v, atol=1e-7)
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_array_equal(c2, c)

    def test_roundtrip_plain(self, tmp_path, rng):
        v = rng.random((5, 3)).astype(np.float32)
        t = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
        path = str(tmp_path / "m.ply")
        write_ply(path, v, t)
        v2, t2, c2 = read_ply(path)
        np.testing.assert_allclose(v2, v, atol=1e-7)
        assert c2 is None


class TestDae:
    def test_roundtrip_colored(self, tmp_path, rng):
        from nerf_pl_tpu.mesh import read_dae, write_dae
        v = rng.random((10, 3)).astype(np.float32)
        t = rng.integers(0, 10, (7, 3)).astype(np.int64)
        c = rng.integers(0, 255, (10, 3)).astype(np.uint8)
        path = str(tmp_path / "m.dae")
        write_dae(path, v, t, c)
        v2, t2, c2 = read_dae(path)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(t2, t)
        np.testing.assert_allclose(c2, c.astype(np.float32) / 255, atol=1e-5)

    def test_roundtrip_plain_and_valid_xml(self, tmp_path, rng):
        from xml.etree import ElementTree as ET
        from nerf_pl_tpu.mesh import read_dae, write_dae
        v = rng.random((5, 3)).astype(np.float32)
        t = np.array([[0, 1, 2], [2, 3, 4]], np.int64)
        path = str(tmp_path / "m.dae")
        write_dae(path, v, t)
        root = ET.parse(path).getroot()  # well-formed XML
        assert root.tag.endswith("COLLADA")
        assert root.get("version") == "1.4.1"
        v2, t2, c2 = read_dae(path)
        np.testing.assert_allclose(v2, v, atol=1e-5)
        np.testing.assert_array_equal(t2, t)
        assert c2 is None


class TestExtractHelpers:
    def test_grid_world_roundtrip(self):
        # a grid vertex at index (i,j,k) -> world must land inside ranges,
        # with the reference's xy swap
        N = 10
        verts = np.array([[0, 0, 0], [N, N, N], [N / 2, N / 2, N / 2]],
                         np.float32)
        w = grid_to_world(verts, N, (-1, 1), (-2, 2), (0, 4))
        np.testing.assert_allclose(w[0], [-2, -1, 0], atol=1e-6)
        np.testing.assert_allclose(w[1], [2, 1, 4], atol=1e-6)
        np.testing.assert_allclose(w[2], [0, 0, 2], atol=1e-6)

    def test_make_grid_ordering_matches_reference(self):
        # np.meshgrid xy-indexing: first axis varies over y
        g = make_grid(3, (-1, 1), (-10, 10), (0, 2))
        assert g.shape == (27, 3)
        assert g[0, 1] == -10 and g[-1, 1] == 10

    def test_bilinear_center(self):
        img = np.zeros((4, 4, 3))
        img[1, 1] = [100, 0, 0]
        img[1, 2] = [0, 100, 0]
        out = bilinear_sample(img, np.array([[1.5, 1.0]]))
        np.testing.assert_allclose(out[0], [50, 50, 0], atol=1e-6)

    def test_bilinear_clamps(self):
        img = np.full((4, 4, 3), 7.0)
        out = bilinear_sample(img, np.array([[-5.0, 99.0]]))
        np.testing.assert_allclose(out[0], 7.0)

    def test_vertex_normals_sphere(self):
        field, _ = sphere_field(24)
        v, t = marching_cubes(field, 0.0)
        coords = v / 23 * 3.0 - 1.5
        n = compute_vertex_normals(coords, t)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1, atol=1e-5)
        # normals parallel (or antiparallel) to radial direction
        radial = coords / np.linalg.norm(coords, axis=1, keepdims=True)
        dots = np.abs(np.sum(n * radial, axis=1))
        assert dots.mean() > 0.98

    def test_export_vol_format(self, tmp_path):
        rgbsigma = np.array([
            [1.0, 0.0, 0.0, 100.0],   # opaque red voxel
            [0.0, 0.0, 0.0, 0.0],     # empty (excluded)
            [0.0, 1.0, 0.0, 100.0],   # opaque green voxel
        ], np.float32)
        path = str(tmp_path / "t.vol")
        export_vol(path, rgbsigma, N=2, x_range=(-1, 1))
        data = np.frombuffer(open(path, "rb").read(), np.uint32)
        assert len(data) == 4  # two voxels x (idx, packed)
        idxs, packed = data[::2], data[1::2]
        np.testing.assert_array_equal(idxs, [0, 2])
        assert packed[0] >> 24 == 255           # red
        assert (packed[1] >> 16) & 0xFF == 255  # green
        assert packed[0] & 0xFF > 250           # alpha ~1
