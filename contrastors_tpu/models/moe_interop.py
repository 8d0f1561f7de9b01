"""Dense checkpoint -> MoE expansion + expert-parallel sharding rules.

Counterpart of the reference's from_pretrained MoE expansion
(reference: models/encoder/modeling_nomic_bert.py:175-262): when a dense
gated-MLP checkpoint is loaded into an MoE config, each MoE layer's experts
are initialized by replicating the dense fc11/fc12/fc2 weights num_repeats
times along the hidden axis (ffn_dim * num_experts // n_inner), with the
remainder filled by mean-pooled groups; shared experts get the mean-pooled
(or plain) dense weights. Routers stay randomly initialized.

Layout: the reference targets megablocks' flat [E*F, D] w1/v1/w2; ours is
the einsum-native [E, D, F] (w_up/w_gate) and [E, F, D] (w_down).
"""

from typing import Dict

import numpy as np

from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import _layer_is_moe


def _replicate_rows(w: np.ndarray, ffn_dim: int, num_experts: int, n_inner: int) -> np.ndarray:
    """dense [n_inner, D] -> [num_experts * ffn_dim, D] by repetition +
    mean-pooled remainder (reference modeling_nomic_bert.py:188-230)."""
    total = ffn_dim * num_experts
    num_repeats = total // n_inner
    remainder = total % n_inner
    out = np.tile(w, (num_repeats, 1)) if num_repeats else np.zeros((0, w.shape[1]), w.dtype)
    if remainder > 0:
        pooled = w.reshape(remainder, n_inner // remainder, -1).mean(axis=1)
        out = np.concatenate([out, pooled], axis=0)
    return out


def expand_dense_trunk_to_moe(trunk_params: Dict, config: TrunkConfig, rng=None) -> Dict:
    """trunk_params: flax params of NomicBertModel with DENSE gated MLPs.
    Returns params matching the same trunk built with config.num_experts>0
    (MoE layers per moe_every_n_layers). Router/bias params are freshly
    initialized."""
    rng = rng or np.random.default_rng(0)
    num_shared = config.num_shared_experts
    E = config.num_experts - num_shared
    F = config.n_inner // config.ffn_div
    D = config.n_embd
    n_inner = config.n_inner

    out = dict(trunk_params)
    for i in range(config.n_layer):
        if not _layer_is_moe(config, i):
            continue
        layer = dict(out[f"layers_{i}"])
        mlp = layer.pop("mlp")
        gated = "fc11" in mlp
        # flax kernels are [in, out]: fc11/fc12/fc1 [D, n_inner], fc2 [n_inner, D]
        fc2 = np.asarray(mlp["fc2"]["kernel"])  # rows already = hidden
        down_rows = _replicate_rows(fc2, F, E, n_inner)  # [E*F, D]

        new_mlp: Dict = {
            "w_down": down_rows.reshape(E, F, D),  # [E, F, D]
            "router": (rng.standard_normal((D, E)) * config.initializer_range).astype(np.float32),
            "bias": np.zeros((D,), np.float32),
        }
        if gated:
            fc11 = np.asarray(mlp["fc11"]["kernel"]).T  # [n_inner, D]
            fc12 = np.asarray(mlp["fc12"]["kernel"]).T
            up_rows = _replicate_rows(fc11, F, E, n_inner)
            gate_rows = _replicate_rows(fc12, F, E, n_inner)
            new_mlp["w_up"] = up_rows.reshape(E, F, D).transpose(0, 2, 1)  # [E, D, F]
            new_mlp["w_gate"] = gate_rows.reshape(E, F, D).transpose(0, 2, 1)
        else:
            fc1 = np.asarray(mlp["fc1"]["kernel"]).T  # [n_inner, D]
            in_rows = _replicate_rows(fc1, F, E, n_inner)
            new_mlp["w_in"] = in_rows.reshape(E, F, D).transpose(0, 2, 1)  # [E, D, F]
        if num_shared > 0:
            shared_F = F * num_shared
            new_mlp["shared_down"] = {"kernel": _replicate_rows(fc2, shared_F, 1, n_inner)}
            if gated:
                new_mlp["shared_up"] = {"kernel": _replicate_rows(fc11, shared_F, 1, n_inner).T}
                new_mlp["shared_gate"] = {"kernel": _replicate_rows(fc12, shared_F, 1, n_inner).T}
            else:
                new_mlp["shared_up"] = {"kernel": _replicate_rows(fc1, shared_F, 1, n_inner).T}
        layer["mlp"] = new_mlp
        out[f"layers_{i}"] = layer
    return out


def moe_param_sharding_rules(path_tuple) -> tuple:
    """PartitionSpec axes for a param path: expert tensors shard dim 0 over
    the "expert" mesh axis, everything else replicated. Used by
    parallel/sharding to build NamedShardings."""
    names = [getattr(k, "key", str(k)) for k in path_tuple]
    if names and names[-1] in ("w_up", "w_gate", "w_in", "w_down"):
        return ("expert",)
    return ()
