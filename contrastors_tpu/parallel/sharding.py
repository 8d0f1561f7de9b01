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


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree: expert tensors sharded over "expert" (when the
    axis exists and divides the expert count), all else replicated."""
    expert_size = mesh.shape.get("expert", 1)

    def one(path, leaf):
        axes = moe_param_sharding_rules(path)
        if axes == ("expert",) and expert_size > 1 and leaf.shape[0] % expert_size == 0:
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
