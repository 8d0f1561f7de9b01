"""Device mesh construction and batch sharding.

Replaces the reference's NCCL/DDP/DeepSpeed process-group plumbing
(reference: train.py:114-118, distributed.py:5-82) with a jax.sharding.Mesh.
Training runs pjit/global-style: the batch is sharded over the "data" axis,
parameters are replicated (optionally with optimizer-state sharding), and
XLA GSPMD inserts the embedding all-gathers for the contrastive loss over
ICI. "tensor"/"expert" axes are reserved for scale-out beyond the
reference's DDP-only design (SURVEY.md §2.10).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, tensor: int = 1, expert: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (tensor * expert) == 0, f"{n} devices not divisible by tensor*expert"
        data = n // (tensor * expert)
    assert data * tensor * expert == n, (
        f"mesh {data}x{tensor}x{expert} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, expert, tensor)
    return Mesh(arr, ("data", "expert", "tensor"))


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape["data"]


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with leading dim sharded over the data axis.

    Single-process: the host array IS the global batch. Multi-host: each
    process holds only its rank's slice (the data layer reads per-rank
    quotas), so the global array is assembled from process-local shards —
    the JAX counterpart of the reference's per-rank DataLoader + DDP
    (reference text_text_loader.py:306-331)."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if jax.process_count() > 1:
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sharding, x, global_shape)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_map(f, mesh, in_specs, out_specs):
    """jax.shard_map with the pre-0.8 fallback."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def divisor_chunk(chunk: int, rows: int) -> int:
    """Largest chunk size <= `chunk` that divides `rows` — grad-cache chunking
    is execution-only (gradients are exact for any chunk), so clamping to the
    local row count is always safe."""
    c = max(1, min(int(chunk), int(rows)))
    while rows % c:
        c -= 1
    return c
