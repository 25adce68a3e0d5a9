"""Checkpointing: full train-state save/resume, top-k retention, partial
(prefix-filtered) parameter loads, and weights-only export.

Parity targets (SURVEY.md C15):
  * lightning ModelCheckpoint(save_top_k=5, monitor=val/loss) ->
    TopKCheckpoints (train.py:154-158 in the reference);
  * resume_from_checkpoint -> load_checkpoint (train.py:169);
  * utils/__init__.py:55-76 extract_model_state_dict / load_ckpt ->
    same-named functions here (non-strict, prefix-filtered);
  * utils/save_weights_only.py -> save_weights_only (the ~5 MB
    "portable scene" export, README.md:181-184).

Format: a single .npz holding every pytree leaf under a '/'-joined key path
(e.g. "params/nerf_coarse/xyz_0/w", "opt_state/1/0/mu/..."), plus a JSON
metadata blob. Self-describing, framework-free, and loadable without the
optimizer definition for params-only use.
"""
from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _key_to_str(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    if isinstance(k, jax.tree_util.FlattenedIndexKey):
        return str(k.key)
    return str(k)


_NPZ_NATIVE = tuple(np.dtype(d) for d in
                    ("float64", "float32", "float16", "int64", "int32",
                     "int16", "int8", "uint8", "uint32", "uint64", "bool"))


def _to_savable(leaf) -> np.ndarray:
    """np.savez stores ml_dtypes extension dtypes (bfloat16 masters) as raw
    void bytes that do not round-trip; upcast them losslessly to float32 —
    load_checkpoint casts back to the template's dtype."""
    arr = np.asarray(leaf)
    if arr.dtype not in _NPZ_NATIVE:
        arr = np.asarray(leaf, np.float32)
    return arr


def device_fetch(tree):
    """Pipelined device->host fetch of a pytree.

    np.asarray per leaf costs one synchronous round-trip each — over the
    remote-TPU tunnel that made a ~7 MB checkpoint take seconds (measured
    6.7 s/epoch, ~45% of a small run's wall time). Kicking off every
    leaf's copy_to_host_async first overlaps the RPCs; the subsequent
    np.asarray calls then hit already-arrived buffers."""
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break                      # backend without async copies
    return jax.tree_util.tree_map(np.asarray, tree)


def flatten_with_paths(tree) -> Dict[str, np.ndarray]:
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for _, leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            try:
                leaf.copy_to_host_async()
            except Exception:
                break
    return {"/".join(_key_to_str(k) for k in path): _to_savable(leaf)
            for path, leaf in leaves}


def save_checkpoint(path: str, state, meta: Optional[Dict[str, Any]] = None):
    """Save a TrainState (or any pytree) + JSON metadata to one .npz file."""
    flat = flatten_with_paths(state)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_meta(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        if "__meta__" not in z:
            return {}
        return json.loads(bytes(z["__meta__"].tobytes()).decode())


def load_checkpoint(path: str, template) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree saved by save_checkpoint into `template`'s structure.

    Every leaf of the template must be present in the file (full resume).
    Returns (restored_tree, meta)."""
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
        meta = (json.loads(bytes(z["__meta__"].tobytes()).decode())
                if "__meta__" in z.files else {})
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_keys, leaf in paths_leaves:
        key = "/".join(_key_to_str(k) for k in path_keys)
        if key not in arrays:
            raise KeyError(f"checkpoint {path!r} missing leaf {key!r}")
        arr = arrays[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs "
                f"template {leaf.shape}")
        new_leaves.append(arr.astype(leaf.dtype)
                          if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), meta


def extract_model_state_dict(ckpt_path: str, model_name: str = "nerf_coarse",
                             prefixes_to_ignore=()) -> Dict[str, np.ndarray]:
    """Pull one model's parameter dict out of any checkpoint file.

    Accepts full train-state checkpoints ("params/{model}/..." keys) or
    weights-only exports ("{model}/..." keys). Keys starting with any of
    prefixes_to_ignore (relative to the model root) are skipped, mirroring
    reference utils/__init__.py:55-70."""
    with np.load(ckpt_path) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    out = {}
    for key, arr in arrays.items():
        parts = key.split("/")
        if parts[0] == "params":
            parts = parts[1:]
        if not parts or parts[0] != model_name:
            continue
        rel = "/".join(parts[1:])
        if any(rel.startswith(p) for p in prefixes_to_ignore):
            print(f"[load_ckpt] ignoring {model_name}/{rel}")
            continue
        out[rel] = arr
    if not out:
        raise KeyError(
            f"checkpoint {ckpt_path!r} contains no leaves for model "
            f"{model_name!r} (after filtering {list(prefixes_to_ignore)}); "
            f"available roots: {sorted({k.split('/')[0] for k in arrays})}")
    return out


def load_ckpt(params: Dict[str, Any], ckpt_path: str,
              model_name: str = "nerf_coarse",
              prefixes_to_ignore=()) -> Dict[str, Any]:
    """Non-strict partial load of one model's params (reference load_ckpt).

    Returns a new full-params tree where {model_name}'s leaves present in the
    checkpoint are replaced; missing leaves keep their current values."""
    loaded = extract_model_state_dict(ckpt_path, model_name,
                                      prefixes_to_ignore)
    model = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    target = {k: dict(v) for k, v in model[model_name].items()}
    n_matched = 0
    for rel, arr in loaded.items():
        layer, leaf = rel.split("/")
        if layer in target and leaf in target[layer]:
            target[layer][leaf] = np.asarray(arr)
            n_matched += 1
    if n_matched == 0:
        raise KeyError(
            f"checkpoint {ckpt_path!r} has {len(loaded)} leaves for "
            f"{model_name!r} but none match the current parameter tree — "
            f"refusing a silent no-op load")
    model = dict(model)
    model[model_name] = target
    return model


def save_weights_only(src_ckpt: str, dst_path: str):
    """Strip a full checkpoint to bare model weights (~5 MB portable scene)."""
    with np.load(src_ckpt) as z:
        flat = {}
        for k in z.files:
            if k.startswith("params/"):
                flat[k[len("params/"):]] = z[k]
    if not flat:
        raise ValueError(f"{src_ckpt!r} contains no params/ leaves")
    with open(dst_path, "wb") as f:
        np.savez(f, **flat)


class TopKCheckpoints:
    """Keep the k best checkpoints by a monitored value (lower is better).

    Mirrors lightning's ModelCheckpoint(save_top_k, monitor='val/loss',
    mode='min') used at reference train.py:154-158. The (monitored, path)
    bookkeeping is persisted to `topk.json` in the checkpoint directory on
    every save and reloaded on construction, so a resumed run keeps evicting
    correctly relative to pre-restart checkpoints (lightning gets this by
    pickling the callback inside the ckpt)."""

    def __init__(self, ckpt_dir: str, k: int = 5,
                 filename: str = "epoch={epoch}.ckpt"):
        self.ckpt_dir = ckpt_dir
        self.k = k
        self.filename = filename
        self.entries: List[Tuple[float, str]] = []  # (monitored, path)
        os.makedirs(ckpt_dir, exist_ok=True)
        self._state_path = os.path.join(ckpt_dir, "topk.json")
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                saved = json.load(f)
            # drop entries whose files were deleted out-of-band
            self.entries = [(float(m), p) for m, p in saved.get("entries", [])
                            if os.path.exists(p)]

    def _persist(self):
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": self.k, "entries": self.entries}, f)
        os.replace(tmp, self._state_path)

    def maybe_save(self, state, monitored: float, epoch: int,
                   meta: Optional[Dict[str, Any]] = None) -> Optional[str]:
        """Save if among the best k; evict the worst beyond k. Returns path."""
        path = os.path.join(self.ckpt_dir,
                            self.filename.format(epoch=epoch))
        if len(self.entries) >= self.k:
            worst = max(self.entries, key=lambda e: e[0])
            if monitored >= worst[0]:
                return None
        meta = dict(meta or {})
        meta.update({"epoch": epoch, "monitored": float(monitored)})
        save_checkpoint(path, state, meta)
        # re-saving the same epoch path replaces its old entry
        self.entries = [e for e in self.entries if e[1] != path]
        self.entries.append((float(monitored), path))
        if len(self.entries) > self.k:
            worst = max(self.entries, key=lambda e: e[0])
            self.entries.remove(worst)
            if worst[1] != path and os.path.exists(worst[1]):
                os.remove(worst[1])
        self._persist()
        return path

    @property
    def best(self) -> Optional[Tuple[float, str]]:
        return min(self.entries, key=lambda e: e[0]) if self.entries else None
