"""LayerNorm / RMSNorm with fp32 internals.

The reference uses flash-attn's fused dropout-add-LN CUDA kernels
(reference: layers/block.py:7-8,289-370) which normalize in fp32 regardless
of input dtype. On TPU, XLA fuses the (dropout + residual-add + normalize)
chain into the surrounding matmuls automatically, so these are plain jnp
with explicit fp32 upcast to match the CUDA kernels' numerics.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-12
    use_bias: bool = True
    elementwise_affine: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.elementwise_affine:
            weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
            y = y * weight.astype(jnp.float32)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
                y = y + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-12
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x / jnp.sqrt(var + self.eps)
        weight = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        y = y * weight.astype(jnp.float32)
        return y.astype(orig_dtype)


def make_norm(config, name: Optional[str] = None):
    if config.use_rms_norm:
        return RMSNorm(dim=config.n_embd, eps=config.layer_norm_epsilon, name=name)
    return LayerNorm(
        dim=config.n_embd,
        eps=config.layer_norm_epsilon,
        use_bias=getattr(config, "norm_bias", True),
        name=name,
    )
