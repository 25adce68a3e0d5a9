from .mesh import make_mesh, tensor_parallel_pspecs
from .spmd import TrainState, Trainer

__all__ = ["make_mesh", "tensor_parallel_pspecs", "TrainState", "Trainer"]
