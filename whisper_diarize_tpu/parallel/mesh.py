"""Device meshes and sharding rules.

The reference has no distributed backend at all (SURVEY.md §2.5 —
`Cargo.lock` contains no NCCL/MPI/Gloo). The TPU replacement: a
`jax.sharding.Mesh` over ("data", "model") axes; batches shard over "data"
(each chip decodes its own audio windows), parameters shard over "model"
(tensor parallelism: attention heads and MLP hidden split across chips),
and XLA emits the ICI collectives (`psum`/`all_gather`) implied by the
shardings — nothing hand-written.

Sharding rules for the stacked-layer layout of `models/whisper.py`:
every stacked weight is [L, in, out]; TP shards the *feature* axis that is
contracted last (out for QKV/fc1, in for O/fc2), so each chip holds a head
slice and the only collective is the psum after the second matmul of each
pair — the standard Megatron split, expressed purely through NamedSharding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if explicit:
        assert need == len(devices), (
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    else:
        # auto-discovery: a smaller mesh uses the first need devices
        assert need <= len(devices), (
            f"mesh {n_data}x{n_model} needs {need} devices, "
            f"only {len(devices)} available"
        )
        devices = devices[:need]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# TP rules keyed by stacked-weight name (decoder/encoder share names).
# Column-parallel (shard out axis): q/k/v, cross q/k/v, fc1.
# Row-parallel (shard in axis): o, co, fc2.
_COL_PARALLEL = {"q_w", "k_w", "v_w", "cq_w", "ck_w", "cv_w", "fc1_w"}
_ROW_PARALLEL = {"o_w", "co_w", "fc2_w"}
_COL_BIAS = {"q_b", "v_b", "cq_b", "cv_b", "fc1_b"}


def param_sharding_spec(path: str, ndim: int) -> P:
    """PartitionSpec for one parameter, by its pytree path leaf name."""
    leaf = path.split(".")[-1]
    if leaf in _COL_PARALLEL and ndim == 3:  # [L, in, out]
        return P(None, None, MODEL_AXIS)
    if leaf in _ROW_PARALLEL and ndim == 3:  # [L, in, out]
        return P(None, MODEL_AXIS, None)
    if leaf in _COL_BIAS and ndim == 2:  # [L, out]
        return P(None, MODEL_AXIS)
    if leaf == "tok_emb":  # [V, d] — shard vocab for the logits matmul
        return P(MODEL_AXIS, None)
    return P()  # replicated


def _tree_paths(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_tree_paths(v, key))
        elif isinstance(v, (list, tuple)):
            for i, vi in enumerate(v):
                out.update(_tree_paths({str(i): vi}, key))
        else:
            out[key] = v
    return out


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Apply the TP sharding rules to a whisper param pytree."""

    def place(path_parts, leaf):
        path = ".".join(str(p) for p in path_parts)
        spec = param_sharding_spec(path, np.ndim(leaf))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    flat = _tree_paths(params)
    out_flat = {k: place(k.split("."), v) for k, v in flat.items()}
    # rebuild nested structure
    rebuilt: Dict[str, Any] = {}
    for k, v in out_flat.items():
        cur = rebuilt
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return rebuilt


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
