"""Reference scaled-dot-product attention in pure jnp.

This is the XLA-lowered counterpart of the flash-attn CUDA kernels the
reference calls (reference: layers/attention.py:153-241). The reference
itself proves dense+mask attention is numerically equivalent to its varlen
kernels — its HF export model uses exactly this math
(models/huggingface/modeling_hf_nomic_bert.py:1285-1416). On TPU the Pallas
flash kernel (ops/flash_attention.py) replaces this on the hot path; this
implementation is the numerics oracle and the small-shape fallback.

Conventions:
  q: [B, S, H, D]; k, v: [B, T, Hkv, D] (GQA when Hkv < H)
  attention_mask: [B, T] 1 = valid key
  segment_ids / kv_segment_ids: int32, 0 = padding; attention only within
    equal nonzero segments (static-shape packing replaces CUDA unpad/varlen)
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_bias(
    q_len: int,
    kv_len: int,
    attention_mask: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    window: int = 0,
    dtype=jnp.float32,
):
    """Additive bias [B or 1, 1, S, T] (broadcastable over heads)."""
    bias = None

    def add(extra):
        nonlocal bias
        bias = extra if bias is None else jnp.minimum(bias, extra)

    if attention_mask is not None:
        m = attention_mask[:, None, None, :].astype(jnp.bool_)
        add(jnp.where(m, 0.0, NEG_INF).astype(dtype))
    if segment_ids is not None:
        kv_seg = segment_ids if kv_segment_ids is None else kv_segment_ids
        same = segment_ids[:, None, :, None] == kv_seg[:, None, None, :]
        valid = (segment_ids[:, None, :, None] != 0) & (kv_seg[:, None, None, :] != 0)
        add(jnp.where(same & valid, 0.0, NEG_INF).astype(dtype))
    if causal:
        row = jnp.arange(q_len)[:, None]
        col = jnp.arange(kv_len)[None, :]
        add(jnp.where(row + (kv_len - q_len) >= col, 0.0, NEG_INF)[None, None].astype(dtype))
    if window > 0:
        # sliding window: attend iff |i - j| <= window // 2 (HF ModernBERT
        # local_attention semantics)
        row = jnp.arange(q_len)[:, None]
        col = jnp.arange(kv_len)[None, :]
        add(jnp.where(jnp.abs(row - col) <= window // 2, 0.0, NEG_INF)[None, None].astype(dtype))
    return bias


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    window: int = 0,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns [B, S, H, D] in q.dtype. Softmax in fp32 (flash-attn parity)."""
    B, S, H, D = q.shape
    T = k.shape[1]
    Hkv = k.shape[2]
    if softmax_scale is None:
        softmax_scale = 1.0 / (D**0.5)

    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

    logits = jnp.einsum("bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32)
    logits = logits * softmax_scale

    bias = attention_bias(S, T, attention_mask, segment_ids, kv_segment_ids, causal, window)
    if bias is not None:
        logits = logits + bias

    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_p > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_p, probs.shape)
        probs = probs * keep / (1.0 - dropout_p)

    probs = probs.astype(v.dtype)
    out = jnp.einsum("bhst,bthd->bshd", probs, v)
    return out.astype(q.dtype)
