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
    window: int = 0,
    softmax_scale: Optional[float] = None,
    dropout_p: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block_q: int = 512,
    block_kv: int = 2048,
    flash_min_seq: int = 512,
    rotary_cos: Optional[jnp.ndarray] = None,
    rotary_sin: Optional[jnp.ndarray] = None,
    rotary_interleaved: bool = False,
    rotary_position_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Single entry point for every attention call in the model zoo.

    impl="flash" lowers to the Pallas kernel when the shape qualifies
    (TPU backend, no attention dropout, head-dim aligned, q heads a
    multiple of kv heads — GQA runs in-kernel) AND the kv length is long
    enough to pay for it; otherwise the XLA SDPA path runs, which is
    numerically interchangeable.

    Measured crossover on v5e (nomic-bert geometry H=12 D=64, fwd+bwd
    attention-only at a 16k-token budget; round-2b scan-amortized harness,
    hardware-FLOPs basis 4.5x fwd): S=256 SDPA 17.5 vs flash 14.0 TF/s;
    S=512 flash 29.1 vs SDPA 19.4; S=2048 flash 63.6 vs SDPA 25.3;
    S=4096 flash 71.3 vs SDPA 27.0. Crossover sits between 256 and 512,
    hence the >= 512 gate. At this head dim the kernel is VPU-bound
    (softmax passes over S^2), not MXU-bound; it measures ~4x JAX's
    in-tree pallas flash at the same shape (8.0 fwd / 11 fwd+bwd TF/s).
    impl="flash_always" forces the kernel (kernel tests).

    rotary_cos/rotary_sin make attention_core the single rotary application
    point: the flash path rotates q/k in-VMEM inside the kernels (fused —
    saves the q/k HBM round-trip, 12.3% faster fwd at the MLM geometry, see
    ROADMAP round-4 ablation); every other path applies layers/rotary.py's
    apply_rotary outside, which is numerically identical.
    """
    if impl in ("flash", "flash_always") and dropout_p == 0.0:
        from contrastors_tpu.ops.flash_attention import flash_attention, flash_shape_ok

        if flash_shape_ok(q, k) and (impl == "flash_always" or k.shape[1] >= flash_min_seq):
            return flash_attention(
                q,
                k,
                v,
                attention_mask=attention_mask,
                segment_ids=segment_ids,
                kv_segment_ids=kv_segment_ids,
                causal=causal,
                window=window,
                softmax_scale=softmax_scale,
                block_q=block_q,
                block_kv=block_kv,
                rotary_cos=rotary_cos,
                rotary_sin=rotary_sin,
                rotary_interleaved=rotary_interleaved,
                rotary_position_ids=rotary_position_ids,
            )
    if rotary_cos is not None:
        from contrastors_tpu.layers.rotary import apply_rotary

        q = apply_rotary(q, rotary_cos, rotary_sin, rotary_interleaved, rotary_position_ids)
        k = apply_rotary(k, rotary_cos, rotary_sin, rotary_interleaved, rotary_position_ids)
    return sdpa(
        q,
        k,
        v,
        attention_mask=attention_mask,
        segment_ids=segment_ids,
        kv_segment_ids=kv_segment_ids,
        causal=causal,
        window=window,
        softmax_scale=softmax_scale,
        dropout_p=dropout_p,
        dropout_rng=dropout_rng,
    )
