"""Activation registry (reference: layers/activations.py:5, layers/mlp.py:26-27,
layers/block.py:181-189). XLA fuses these into the adjacent matmuls, so there
is no fused-swiglu kernel to port."""

import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    # matches torch.nn.GELU(approximate="none")
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


# point activation applied to the *gate* branch of GatedMLP, or the single
# branch of MLP. "gelu_new"/"gelu_fast"/"gelu_pytorch_tanh" use tanh approx
# (reference mlp.py:26).
ACT2FN = {
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "gelu_fast": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "swiglu": jax.nn.silu,
    "silu": jax.nn.silu,
    "glu": jax.nn.sigmoid,
    "geglu": gelu_exact,
    "relu": jax.nn.relu,
}

GATED_ACTIVATIONS = ("glu", "swiglu", "geglu")


def is_gated(activation_function: str) -> bool:
    return activation_function in GATED_ACTIVATIONS
