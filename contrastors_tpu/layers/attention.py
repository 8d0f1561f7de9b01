"""Multi-head self-attention and latent-query attention pooling.

TPU-native counterpart of the reference's FlashAttention /
FlashAttentionPooling modules (reference: layers/attention.py:19-245,
313-433). Differences by design:
  - one fused Wqkv projection (same layout as the reference's flash path,
    so HF remaps are shared), lowered to a single MXU matmul;
  - varlen/unpad dispatch is replaced by static-shape masks or packed
    segment ids — dynamic shapes would defeat XLA tiling;
  - rotary defers to ops.attention_core: fused in-VMEM inside the Pallas
    flash kernels on the flash path (like the reference's CUDA kernels),
    pure jnp (layers/rotary.py) on the SDPA path — numerically identical.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.norms import make_norm
from contrastors_tpu.layers.mlp import make_mlp
from contrastors_tpu.layers.rotary import apply_rope_cat_prefixed, apply_rotary, rotary_cos_sin
from contrastors_tpu.ops import attention_core


class MultiHeadAttention(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32
    # per-layer overrides (ModernBERT-style local layers: sliding window +
    # a different rotary base; 0/None = use the global config)
    window: int = 0
    rotary_base_override: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        rope: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        B, S, _ = hidden_states.shape
        H, Hkv, D = cfg.n_head, cfg.num_heads_kv, cfg.head_dim
        qkv_dim = D * (H + 2 * Hkv)

        qkv = nn.Dense(qkv_dim, use_bias=cfg.qkv_proj_bias, dtype=self.dtype, name="Wqkv")(
            hidden_states
        )
        q, k, v = jnp.split(qkv, [H * D, H * D + Hkv * D], axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, Hkv, D)
        v = v.reshape(B, S, Hkv, D)

        rotary_kw = {}
        if cfg.rotary_emb_dim > 0:
            # DynamicNTK scaling only kicks in past the trained context and
            # is inference-only in the reference too (modeling_biencoder.py:226-227).
            table_len = H if cfg.rotary_head_dim else S
            cos, sin = rotary_cos_sin(
                table_len,
                cfg.rotary_emb_dim,
                base=self.rotary_base_override or cfg.rotary_emb_base,
                rope_scaling=cfg.rope_scaling,
                rotary_scaling_factor=cfg.rotary_scaling_factor,
                max_trained_positions=cfg.max_trained_positions,
            )
            if cfg.rotary_head_dim:
                # open_lm quirk: "position" = head index (attention.py:126-131)
                q = apply_rotary(q.swapaxes(1, 2), cos, sin, cfg.rotary_emb_interleaved).swapaxes(1, 2)
                k = apply_rotary(k.swapaxes(1, 2), cos, sin, cfg.rotary_emb_interleaved).swapaxes(1, 2)
            elif cfg.fused_rotary:
                # defer to attention_core: rotated in-VMEM inside the flash
                # kernels, apply_rotary outside on every non-flash path
                rotary_kw = dict(
                    rotary_cos=cos,
                    rotary_sin=sin,
                    rotary_interleaved=cfg.rotary_emb_interleaved,
                    rotary_position_ids=position_ids,
                )
            else:
                # default: rotate outside (XLA fuses this to ~one HBM
                # round-trip; cheaper than in-kernel re-rotation at D=64 on
                # v5e — ROADMAP round-4 ablation)
                q = apply_rotary(q, cos, sin, cfg.rotary_emb_interleaved, position_ids)
                k = apply_rotary(k, cos, sin, cfg.rotary_emb_interleaved, position_ids)
        elif rope is not None:
            # 2-D ViT rope skips cls/register prefix tokens
            # (reference attention.py:136-148).
            n_prefix = max(getattr(cfg, "register_tokens", 1), 1)
            q = apply_rope_cat_prefixed(q, rope, n_prefix)
            k = apply_rope_cat_prefixed(k, rope, n_prefix)

        dropout_rng = None
        if cfg.attn_pdrop > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out = attention_core(
            q,
            k,
            v,
            impl=cfg.attn_impl,
            attention_mask=attention_mask,
            segment_ids=segment_ids,
            causal=cfg.causal,
            window=self.window,
            softmax_scale=1.0 / (D**0.5),
            dropout_p=cfg.attn_pdrop if not deterministic else 0.0,
            dropout_rng=dropout_rng,
            block_q=cfg.flash_block_q,
            block_kv=cfg.flash_block_kv,
            **rotary_kw,
        )
        out = out.reshape(B, S, H * D)
        return nn.Dense(cfg.n_embd, use_bias=cfg.qkv_proj_bias, dtype=self.dtype, name="out_proj")(out)


class AttentionPooling(nn.Module):
    """Single learned latent query cross-attending over the sequence
    (reference: layers/attention.py:313-433 FlashAttentionPooling)."""

    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, kv_states, attention_mask=None, deterministic: bool = True):
        cfg = self.config
        B = kv_states.shape[0]
        H, Hkv, D = cfg.n_head, cfg.num_heads_kv, cfg.head_dim

        latent = self.param(
            "latent",
            nn.initializers.truncated_normal(stddev=cfg.n_embd**-0.5),
            (1, 1, cfg.n_embd),
            jnp.float32,
        )
        q = nn.Dense(cfg.n_embd, use_bias=cfg.qkv_proj_bias, dtype=self.dtype, name="Wq")(
            jnp.broadcast_to(latent.astype(self.dtype), (B, 1, cfg.n_embd))
        )
        kv = nn.Dense(2 * Hkv * D, use_bias=cfg.qkv_proj_bias, dtype=self.dtype, name="Wkv")(kv_states)
        k, v = jnp.split(kv, 2, axis=-1)

        out = attention_core(
            q.reshape(B, 1, H, D),
            k.reshape(B, -1, Hkv, D),
            v.reshape(B, -1, Hkv, D),
            impl="sdpa",  # one query row: MXU tiling gains nothing from flash
            attention_mask=attention_mask,
            causal=False,
            softmax_scale=1.0 / (D**0.5),
        )
        out = out.reshape(B, 1, H * D)
        return nn.Dense(cfg.n_embd, use_bias=cfg.qkv_proj_bias, dtype=self.dtype, name="out_proj")(out)


class MultiHeadAttentionPooling(nn.Module):
    """big_vision-style MAP head: latent attention + MLP residual
    (reference: models/biencoder/modeling_biencoder.py:93-152 and the shipped
    HF export models/huggingface/modeling_hf_nomic_bert.py:1977-2038)."""

    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, attention_mask=None, deterministic: bool = True):
        cfg = self.config
        attn_out = AttentionPooling(config=cfg, dtype=self.dtype, name="attn")(
            hidden_states, attention_mask=attention_mask, deterministic=deterministic
        )
        normed = make_norm(cfg, name="norm1")(attn_out)
        mlp_out = make_mlp(cfg, self.dtype, name="mlp")(normed, deterministic=deterministic)
        # broadcast add (B,N,D)+(B,1,D) then take token 0 — matches the
        # shipped HF model's `hidden_states + mlp(norm(attn_out))`.
        pooled = hidden_states + mlp_out
        return pooled[:, 0]
