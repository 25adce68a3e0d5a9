from .dae import read_dae, write_dae
from .native import cluster_triangles, marching_cubes
from .ply import write_ply

__all__ = ["marching_cubes", "cluster_triangles", "write_ply",
           "write_dae", "read_dae"]
