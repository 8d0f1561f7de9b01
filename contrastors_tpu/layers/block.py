"""Transformer blocks: shifted-prenorm, postnorm, and parallel-residual.

TPU counterpart of the reference Block / ParallelBlock
(reference: layers/block.py:20-463). The reference fuses
dropout+add+layernorm via CUDA kernels; on TPU the same chain is plain jnp
that XLA fuses, with the residual stream optionally kept in fp32
(residual_in_fp32) exactly like the CUDA kernels do.

The "shifted" prenorm layout is preserved: a Block receives the *un-added*
output of the previous block plus the running residual, performs
dropout -> add -> norm first, and returns its own un-added output. The model
must apply the final dropout-add(-norm) after the last block.
"""

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.attention import MultiHeadAttention
from contrastors_tpu.layers.mlp import make_mlp
from contrastors_tpu.layers.moe import MoEMLP
from contrastors_tpu.layers.norms import make_norm


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Per-sample stochastic depth (reference block.py:253-254, torchvision
    StochasticDepth mode='row')."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    import jax

    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class Block(nn.Module):
    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32
    moe: bool = False
    drop_path_rate1: float = 0.0
    drop_path_rate2: float = 0.0
    # per-layer attention overrides (ModernBERT local layers)
    attn_window: int = 0
    rotary_base_override: Optional[float] = None
    # prenorm layer 0 may skip norm1 (ModernBERT: the embedding norm
    # directly precedes it)
    norm1_identity: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        residual: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        rope: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        cfg = self.config
        resid_p = (
            cfg.moe_resid_pdrop
            if (self.moe and cfg.moe_resid_pdrop is not None)
            else cfg.resid_pdrop
        )

        def dropout(x, name):
            if resid_p == 0.0 or deterministic:
                return x
            return nn.Dropout(rate=resid_p, name=name)(x, deterministic=False)

        def drop_path(x, rate):
            rng = self.make_rng("dropout") if (not deterministic and rate > 0.0) else None
            return _drop_path(x, rate, deterministic, rng)

        attn = MultiHeadAttention(
            config=cfg,
            dtype=self.dtype,
            window=self.attn_window,
            rotary_base_override=self.rotary_base_override,
            name="attn",
        )
        if self.moe and cfg.num_experts > 0:
            mlp = MoEMLP(config=cfg, dtype=self.dtype, name="mlp")
        else:
            mlp = make_mlp(cfg, self.dtype, name="mlp")

        norm1 = (lambda x: x) if self.norm1_identity else make_norm(cfg, name="norm1")
        norm2 = make_norm(cfg, name="norm2")

        ls1 = ls2 = None
        if cfg.layer_scale:
            ls1 = self.param(
                "ls1", nn.initializers.constant(cfg.layer_scale_init), (cfg.n_embd,), jnp.float32
            )
            ls2 = self.param(
                "ls2", nn.initializers.constant(cfg.layer_scale_init), (cfg.n_embd,), jnp.float32
            )

        router_logits = None
        resid_dtype = jnp.float32 if cfg.residual_in_fp32 else hidden_states.dtype

        if cfg.prenorm:
            dropped = drop_path(dropout(hidden_states, "dropout1"), self.drop_path_rate1)
            residual = (
                dropped.astype(resid_dtype)
                if residual is None
                else residual + dropped.astype(resid_dtype)
            )
            hidden_states = norm1(residual).astype(self.dtype)
            hidden_states = attn(
                hidden_states,
                attention_mask=attention_mask,
                segment_ids=segment_ids,
                position_ids=position_ids,
                rope=rope,
                deterministic=deterministic,
            )
            if ls1 is not None:
                hidden_states = hidden_states * ls1.astype(hidden_states.dtype)
            dropped = drop_path(dropout(hidden_states, "dropout2"), self.drop_path_rate2)
            residual = residual + dropped.astype(resid_dtype)
            hidden_states = norm2(residual).astype(self.dtype)
            if self.moe and cfg.num_experts > 0:
                hidden_states, router_logits = mlp(
                    hidden_states, attention_mask=attention_mask, deterministic=deterministic
                )
            else:
                hidden_states = mlp(hidden_states, deterministic=deterministic)
            if ls2 is not None:
                hidden_states = hidden_states * ls2.astype(hidden_states.dtype)
            return hidden_states, residual, router_logits
        else:
            assert residual is None, "postnorm blocks carry no external residual"
            attn_out = attn(
                hidden_states,
                attention_mask=attention_mask,
                segment_ids=segment_ids,
                position_ids=position_ids,
                rope=rope,
                deterministic=deterministic,
            )
            hidden_states = norm1(
                drop_path(dropout(attn_out, "dropout1"), self.drop_path_rate1) + hidden_states
            )
            if self.moe and cfg.num_experts > 0:
                mlp_out, router_logits = mlp(
                    hidden_states, attention_mask=attention_mask, deterministic=deterministic
                )
            else:
                mlp_out = mlp(hidden_states, deterministic=deterministic)
            hidden_states = norm2(
                drop_path(dropout(mlp_out, "dropout2"), self.drop_path_rate2) + hidden_states
            )
            return hidden_states, None, router_logits


class ParallelBlock(nn.Module):
    """GPT-J/NeoX parallel attention+MLP with the shifted-prenorm layout
    (reference: layers/block.py:20-147). Carries TWO un-added streams
    (attn-out, mlp-out) plus the residual."""

    config: "TrunkConfig"  # noqa: F821
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states1: jnp.ndarray,
        hidden_states2: Optional[jnp.ndarray],
        residual: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config

        def dropout(x, name):
            if cfg.resid_pdrop == 0.0 or deterministic:
                return x
            return nn.Dropout(rate=cfg.resid_pdrop, name=name)(x, deterministic=False)

        resid_dtype = jnp.float32 if cfg.residual_in_fp32 else hidden_states1.dtype

        dropped1 = dropout(hidden_states1, "dropout1")
        if hidden_states2 is not None:
            dropped2 = dropout(hidden_states2, "dropout2")
            new = dropped1.astype(resid_dtype) + dropped2.astype(resid_dtype)
        else:
            new = dropped1.astype(resid_dtype)
        residual = new if residual is None else residual + new

        norm1 = make_norm(cfg, name="norm1")
        hidden1 = norm1(residual).astype(self.dtype)
        if cfg.parallel_block_tied_norm:
            hidden2 = hidden1
        else:
            hidden2 = make_norm(cfg, name="norm2")(residual).astype(self.dtype)

        attn_out = MultiHeadAttention(config=cfg, dtype=self.dtype, name="attn")(
            hidden1,
            attention_mask=attention_mask,
            segment_ids=segment_ids,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        mlp_out = make_mlp(cfg, self.dtype, name="mlp")(hidden2, deterministic=deterministic)
        return attn_out, mlp_out, residual
