"""TPU kernel layer: SDPA oracle + Pallas flash attention dispatch."""

from typing import Optional

import jax
import jax.numpy as jnp

from contrastors_tpu.ops.sdpa import sdpa


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "sdpa",
    attention_mask: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block_q: int = 512,
    block_kv: int = 512,
) -> jnp.ndarray:
    """Single entry point for every attention call in the model zoo.

    impl="flash" lowers to the Pallas kernel when the shape qualifies
    (TPU backend, no attention dropout, head-dim aligned); otherwise falls
    back to the XLA SDPA path, which is numerically interchangeable.
    """
    if impl == "flash" and dropout_p == 0.0:
        from contrastors_tpu.ops.flash_attention import flash_attention, flash_shape_ok

        if flash_shape_ok(q, k):
            return flash_attention(
                q,
                k,
                v,
                attention_mask=attention_mask,
                segment_ids=segment_ids,
                kv_segment_ids=kv_segment_ids,
                causal=causal,
                softmax_scale=softmax_scale,
                block_q=block_q,
                block_kv=block_kv,
            )
    return sdpa(
        q,
        k,
        v,
        attention_mask=attention_mask,
        segment_ids=segment_ids,
        kv_segment_ids=kv_segment_ids,
        causal=causal,
        softmax_scale=softmax_scale,
        dropout_p=dropout_p,
        dropout_rng=dropout_rng,
    )
