"""Parameter sharding rules over the mesh.

The reference's only model-scaling strategy is DDP (SURVEY.md §2.10); here
parameters can additionally shard over the "expert" axis (MoE expert
tensors) and, later, "tensor". Optimizer state inherits the param sharding
tree (ZeRO-style sharding over "data" is a future axis-swap away).
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from contrastors_tpu.models.moe_interop import moe_param_sharding_rules


def tp_param_spec(path, leaf, tp: int):
    """Megatron-style tensor-parallel PartitionSpec for a param path, or
    None when the leaf stays replicated. Column-parallel (output-dim
    sharded): Wqkv, fc1/fc11/fc12, MoE w_up/w_gate/w_in; row-parallel
    (input-dim sharded, GSPMD inserts the all-reduce after the matmul):
    out_proj, fc2, MoE w_down. Flax kernels are [in, out]; expert tensors
    are [E, in, out], sharded on their matmul dims (the expert axis may
    shard dim 0 independently). No reference counterpart — the CUDA stack
    is DDP-only (SURVEY §2.10)."""
    names = [getattr(k, "key", str(k)) for k in path]
    if len(names) < 2:
        return None
    parent, name = names[-2], names[-1]
    col_parallel = parent in ("Wqkv", "fc1", "fc11", "fc12", "Wq", "Wkv")
    row_parallel = parent in ("out_proj", "fc2")
    if name == "kernel":
        if col_parallel and leaf.shape[-1] % tp == 0:
            return P(None, "tensor")
        if row_parallel and leaf.shape[0] % tp == 0:
            return P("tensor", None)
    if name == "bias" and col_parallel and leaf.shape[-1] % tp == 0:
        return P("tensor")
    # MoE expert tensors [E, in, out] (the expert axis overlays dim 0 in
    # param_shardings when it divides E)
    if name in ("w_up", "w_gate", "w_in") and leaf.ndim == 3 and leaf.shape[2] % tp == 0:
        return P(None, None, "tensor")
    if name == "w_down" and leaf.ndim == 3 and leaf.shape[1] % tp == 0:
        return P(None, "tensor", None)
    return None


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree: expert tensors sharded over "expert", matmul
    weights optionally over "tensor" (Megatron-style column/row split), all
    else replicated. Axes of size 1 are no-ops."""
    expert_size = mesh.shape.get("expert", 1)
    tp = mesh.shape.get("tensor", 1)

    def one(path, leaf):
        spec = tp_param_spec(path, leaf, tp) if tp > 1 else None
        axes = moe_param_sharding_rules(path)
        is_expert = (
            axes == ("expert",) and expert_size > 1 and leaf.shape[0] % expert_size == 0
        )
        if spec is not None:
            parts = list(spec)
            if is_expert:
                parts[0] = "expert"
            return NamedSharding(mesh, P(*parts))
        if is_expert:
            return NamedSharding(mesh, P("expert"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def apply_shardings(params: Any, shardings: Any) -> Any:
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_optimizer_state(opt_state: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """ZeRO-2-style optimizer-state sharding (reference: DeepSpeed stage 2,
    configs/deepspeed/ds_config.json): Adam moments (and any other large
    optimizer leaves) shard their leading axis over the "data" mesh axis.
    Elementwise optimizer math keeps the sharding under jit; GSPMD reshards
    the (replicated) grads on the fly. Leaves too small or indivisible stay
    replicated."""
    data = mesh.shape.get("data", 1)
    if data <= 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), opt_state
        )

    def place(leaf):
        if (
            hasattr(leaf, "shape")
            and leaf.ndim >= 1
            and leaf.size >= min_size
            and leaf.shape[0] % data == 0
        ):
            return jax.device_put(leaf, NamedSharding(mesh, P("data")))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, opt_state)
