"""Dense and gated MLPs (reference: layers/mlp.py:8-83).

Parameter names (fc1/fc2, fc11/fc12) match the reference's flash layout so
checkpoint remapping is mechanical. The reference's FusedDense / fused-swiglu
CUDA kernels are unnecessary on TPU: XLA fuses bias+activation into the MXU
matmul (verified in HLO).
"""

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.activations import ACT2FN, is_gated
from contrastors_tpu.layers.norms import LayerNorm


def round_hidden(in_features: int, hidden_features: Optional[int], multiple_of: int = 256) -> int:
    """GatedMLP hidden sizing (reference mlp.py:56-59). Rounding to a
    multiple of 256 only applies to the derived 8/3 default — an explicit
    hidden size is honored exactly (checkpoint shapes must match; every
    reference recipe already uses a multiple of 256, so this is behaviorally
    identical for the shipped configs)."""
    if hidden_features is None:
        hidden_features = int(8 * in_features / 3)
        return int((hidden_features + multiple_of - 1) // multiple_of * multiple_of)
    return int(hidden_features)


class MLP(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        act = ACT2FN[cfg.activation_function]
        y = nn.Dense(cfg.n_inner, use_bias=cfg.mlp_fc1_bias, dtype=self.dtype, name="fc1")(x)
        y = act(y)
        y = nn.Dense(cfg.n_embd, use_bias=cfg.mlp_fc2_bias, dtype=self.dtype, name="fc2")(y)
        return y


class GatedMLP(nn.Module):
    """out = fc2( fc11(x) * act(fc12(x)) ); act on the fc12 ("gate") branch
    for every variant — GLU: sigmoid, SwiGLU: silu, GeGLU: gelu
    (reference mlp.py:68-83)."""

    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32
    hidden_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        act = ACT2FN[cfg.activation_function]
        hidden = self.hidden_features if self.hidden_features is not None else cfg.n_inner
        hidden = round_hidden(cfg.n_embd, hidden)
        y = nn.Dense(hidden, use_bias=cfg.mlp_fc1_bias, dtype=self.dtype, name="fc11")(x)
        gate = nn.Dense(hidden, use_bias=cfg.mlp_fc1_bias, dtype=self.dtype, name="fc12")(x)
        y = y * act(gate)
        if cfg.norm_mlp:  # EVA02 post-activation LN (reference mlp.py:66,80)
            y = LayerNorm(dim=hidden, eps=cfg.layer_norm_epsilon, name="norm")(y)
        y = nn.Dense(cfg.n_embd, use_bias=cfg.mlp_fc2_bias, dtype=self.dtype, name="fc2")(y)
        return y


def make_mlp(config, dtype, name="mlp", hidden_features=None):
    if is_gated(config.activation_function):
        return GatedMLP(config=config, dtype=dtype, name=name, hidden_features=hidden_features)
    return MLP(config=config, dtype=dtype, name=name)
