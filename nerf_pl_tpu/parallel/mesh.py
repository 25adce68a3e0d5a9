"""Device-mesh construction and sharding specs.

The scaling model (SURVEY.md C22-C23): NeRF training is ray-batch SPMD. One
`data` mesh axis shards rays; parameters are replicated and gradients are
reduced over ICI by XLA-inserted AllReduce. An optional `model` axis
additionally tensor-parallelizes the MLP hidden width (Megatron-style
alternating column/row-parallel layers, collectives inserted by GSPMD from
the parameter shardings) — useful headroom for scaled-up NeRF variants, and
it exercises a real 2D mesh.

This replaces the reference's lightning-DDP + NCCL stack (train.py:175):
there is no process-group code at all — placement is declarative.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults: all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    n = num_data * num_model
    assert n <= len(devices), (
        f"requested {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(dev, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """First-axis sharding over the data axis (ray batches, ray stores)."""
    return NamedSharding(mesh, P("data"))


def tensor_parallel_pspecs(params: Dict[str, Any],
                           model_size: int) -> Dict[str, Any]:
    """PartitionSpecs tensor-parallelizing one NeRF MLP over 'model'.

    Megatron pattern on the trunk: even layers column-parallel (output dim
    sharded), odd layers row-parallel (input dim sharded, XLA inserts the
    partial-sum AllReduce). A layer whose candidate dim is not divisible by
    the model-axis size (e.g. a skip-concat input) stays replicated —
    GSPMD keeps the mix correct either way. Heads are small and replicated.
    """
    specs: Dict[str, Any] = {}
    for name, layer in params.items():
        w = layer["w"]
        spec = {"w": P(), "b": P()}
        if name.startswith("xyz_") and name != "xyz_final":
            i = int(name.split("_")[1])
            if i % 2 == 0 and w.shape[1] % model_size == 0:
                spec = {"w": P(None, "model"), "b": P("model")}
            elif i % 2 == 1 and w.shape[0] % model_size == 0:
                spec = {"w": P("model", None), "b": P()}
        elif name == "xyz_final" and w.shape[1] % model_size == 0:
            spec = {"w": P(None, "model"), "b": P("model")}
        specs[name] = spec
    return specs


def model_pspecs(params: Dict[str, Any], model_size: int,
                 tensor_parallel: bool) -> Dict[str, Any]:
    """Specs for the full {'nerf_coarse','nerf_fine'} parameter tree."""
    out = {}
    for model_name, model_params in params.items():
        if tensor_parallel and model_size > 1:
            out[model_name] = tensor_parallel_pspecs(model_params, model_size)
        else:
            out[model_name] = {k: {"w": P(), "b": P()}
                               for k in model_params}
    return out
