"""Causal decoder trunk (GPT-NeoX / Pythia / Llama / OpenLM / CLIP-text).

TPU counterpart of the reference DecoderModel
(reference: models/decoder/decoder.py:23-329). Prenorm (shifted) blocks or
parallel-residual blocks, final dropout-add-LN, causal Pallas/SDPA attention.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.block import Block, ParallelBlock
from contrastors_tpu.layers.embeddings import BertEmbeddings
from contrastors_tpu.layers.norms import LayerNorm, RMSNorm
from contrastors_tpu.models.model_config import TrunkConfig


class DecoderModel(nn.Module):
    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        assert cfg.causal, "DecoderModel requires causal=True"

        if cfg.n_positions > 0 and cfg.rotary_emb_fraction <= 0:
            hidden = BertEmbeddings(config=cfg, dtype=self.dtype, name="embeddings")(
                input_ids, position_ids=position_ids
            )
        else:
            hidden = nn.Embed(
                cfg.vocab_size,
                cfg.n_embd,
                dtype=self.dtype,
                embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
                name="embed_tokens",
            )(input_ids)

        residual = None
        if cfg.parallel_block:
            block_cls = nn.remat(ParallelBlock, static_argnums=(7,)) if self.remat else ParallelBlock
            hidden2 = None
            for i in range(cfg.n_layer):
                hidden, hidden2, residual = block_cls(config=cfg, dtype=self.dtype, name=f"layers_{i}")(
                    hidden, hidden2, residual, attention_mask, segment_ids, position_ids, deterministic
                )
        else:
            block_cls = nn.remat(Block, static_argnums=(7,)) if self.remat else Block
            hidden2 = None
            for i in range(cfg.n_layer):
                hidden, residual, _ = block_cls(config=cfg, dtype=self.dtype, name=f"layers_{i}")(
                    hidden, residual, attention_mask, segment_ids, position_ids, None, deterministic
                )

        if cfg.prenorm:
            resid_dtype = jnp.float32 if cfg.residual_in_fp32 else hidden.dtype
            dropped = hidden
            if cfg.resid_pdrop > 0.0 and not deterministic:
                dropped = nn.Dropout(rate=cfg.resid_pdrop, name="drop_f")(hidden, deterministic=False)
            new = dropped.astype(resid_dtype)
            if cfg.parallel_block and hidden2 is not None:
                d2 = hidden2
                if cfg.resid_pdrop > 0.0 and not deterministic:
                    d2 = nn.Dropout(rate=cfg.resid_pdrop, name="drop_f2")(hidden2, deterministic=False)
                new = new + d2.astype(resid_dtype)
            residual = new if residual is None else residual + new
            if cfg.use_rms_norm:
                hidden = RMSNorm(dim=cfg.n_embd, eps=cfg.layer_norm_epsilon, name="ln_f")(residual)
            else:
                hidden = LayerNorm(
                    dim=cfg.n_embd,
                    eps=cfg.layer_norm_epsilon,
                    use_bias=cfg.ln_f_bias,
                    name="ln_f",
                )(residual)
            hidden = hidden.astype(self.dtype)

        return {"last_hidden_state": hidden}
