"""nerf_pl_tpu — a TPU-native NeRF training & rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of kwea123/nerf_pl
(reference layout: SURVEY.md §1-2). The compute path is pure-functional JAX
(jit/shard_map over a device mesh); the hot kernels (point-MLP, inverse-CDF
resampling) have fused Pallas TPU implementations; host-side geometry/meshing
uses numpy plus a native C++ marching-cubes extension.

Public subpackages:
  models     — positional encoding + NeRF MLP as pure functions over pytrees
  rendering  — volume rendering (stratified sampling, quadrature, hierarchical)
  ops        — TPU kernels: sample_pdf (inverse CDF), fused MLP
  datasets   — blender / llff loaders, ray geometry, depth I/O
  parallel   — device mesh + SPMD train/eval step builders
  training   — losses, metrics, optimizers, LR schedules, checkpoints, loop
  mesh       — sigma-grid query, marching cubes, color fusion, PLY/.vol export
  utils      — visualization, misc
"""

__version__ = "0.1.0"
