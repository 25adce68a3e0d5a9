"""ctypes bindings for the native mesh library (csrc/marching_cubes.cpp).

The shared library is built on first use with g++ (no pip deps, no pybind11)
and cached next to the source. Exposes:
  marching_cubes(field, iso)     -> (vertices (V,3) f32, triangles (T,3) i32)
  cluster_triangles(tris, n_verts) -> (cluster_id per triangle, counts)

These are the TPU-build equivalents of PyMCubes.marching_cubes and open3d's
cluster_connected_triangles used by the reference mesh pipeline
(extract_color_mesh.py:144,163-171).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SO_PATH = os.path.abspath(os.path.join(_CSRC, "libnerfmesh.so"))
_CPP_PATH = os.path.abspath(os.path.join(_CSRC, "marching_cubes.cpp"))


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH, _CPP_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_CPP_PATH)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.nerfmesh_marching_cubes.restype = ctypes.c_void_p
        lib.nerfmesh_marching_cubes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float]
        lib.nerfmesh_num_vertices.restype = ctypes.c_int64
        lib.nerfmesh_num_vertices.argtypes = [ctypes.c_void_p]
        lib.nerfmesh_num_triangles.restype = ctypes.c_int64
        lib.nerfmesh_num_triangles.argtypes = [ctypes.c_void_p]
        lib.nerfmesh_copy.restype = None
        lib.nerfmesh_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        lib.nerfmesh_free.restype = None
        lib.nerfmesh_free.argtypes = [ctypes.c_void_p]
        lib.nerfmesh_cluster_triangles.restype = ctypes.c_int32
        lib.nerfmesh_cluster_triangles.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        _LIB = lib
        return lib


def marching_cubes(field: np.ndarray, iso: float):
    """Extract the iso-surface of a 3D scalar field.

    Args:
      field: (nx, ny, nz) float array.
      iso: iso level (vertices where field crosses this value).

    Returns: (vertices (V, 3) float32 in grid-index units, triangles
    (T, 3) int32). Same coordinate convention as PyMCubes: vertex
    components are (i, j, k) indices into the field.
    """
    lib = _load()
    field = np.ascontiguousarray(field, dtype=np.float32)
    nx, ny, nz = field.shape
    h = lib.nerfmesh_marching_cubes(
        field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, float(iso))
    try:
        nv = lib.nerfmesh_num_vertices(h)
        nt = lib.nerfmesh_num_triangles(h)
        verts = np.empty((nv, 3), dtype=np.float32)
        tris = np.empty((nt, 3), dtype=np.int32)
        if nv:
            lib.nerfmesh_copy(
                h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return verts, tris
    finally:
        lib.nerfmesh_free(h)


def cluster_triangles(triangles: np.ndarray, n_vertices: int):
    """Connected components of triangles through shared vertices.

    Returns (cluster_idx (T,) int32, counts (n_clusters,) int64)."""
    lib = _load()
    tris = np.ascontiguousarray(triangles, dtype=np.int32)
    out = np.empty(len(tris), dtype=np.int32)
    n = lib.nerfmesh_cluster_triangles(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(tris), int(n_vertices),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    counts = np.bincount(out, minlength=n).astype(np.int64)
    return out, counts


def keep_largest_cluster(vertices: np.ndarray, triangles: np.ndarray):
    """Noise removal: drop all triangles outside the largest connected
    cluster, then drop unreferenced vertices (reference
    extract_color_mesh.py:163-171)."""
    if len(triangles) == 0:
        return vertices, triangles
    idxs, counts = cluster_triangles(triangles, len(vertices))
    keep = idxs == int(np.argmax(counts))
    tris = triangles[keep]
    used = np.unique(tris)
    remap = np.full(len(vertices), -1, dtype=np.int64)
    remap[used] = np.arange(len(used))
    return vertices[used], remap[tris].astype(np.int32)
