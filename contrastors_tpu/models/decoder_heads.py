"""Decoder task heads: causal LM and sequence classification.

TPU counterpart of the reference's standalone flash decoder ports
(reference: models/biencoder/flash_pythia.py:777-1235 CausalLM/SeqCls heads,
flash_llama.py:776-1056). One generic head pair serves both families since
the trunk is the shared DecoderModel.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.models.decoder import DecoderModel
from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.nomic_bert import masked_cross_entropy


class DecoderForCausalLM(nn.Module):
    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        trunk = DecoderModel(config=cfg, dtype=self.dtype, remat=self.remat, name="model")
        hidden = trunk(input_ids, attention_mask=attention_mask, deterministic=deterministic)[
            "last_hidden_state"
        ]
        if cfg.tie_word_embeddings:
            emb_name = "embed_tokens" if (cfg.n_positions <= 0 or cfg.rotary_emb_fraction > 0) else "embeddings"
            table = trunk.variables["params"][emb_name]
            table = table["embedding"] if "embedding" in table else table["word_embeddings"]["embedding"]
            logits = hidden @ table.astype(self.dtype).T
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")(hidden)

        out: Dict[str, Any] = {"logits": logits}
        if labels is not None:
            # next-token prediction: shift left, ignore the final position
            shifted = jnp.concatenate(
                [labels[:, 1:], jnp.full((labels.shape[0], 1), -100, labels.dtype)], axis=1
            )
            out["loss"] = masked_cross_entropy(logits, shifted)
        return out


class DecoderForSequenceClassification(nn.Module):
    """Classifier on the last non-pad token's hidden state (HF
    GPTNeoXForSequenceClassification convention)."""

    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        hidden = DecoderModel(config=cfg, dtype=self.dtype, name="model")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )["last_hidden_state"]
        if attention_mask is not None:
            last = jnp.sum(attention_mask, axis=-1) - 1
        else:
            last = jnp.full((hidden.shape[0],), hidden.shape[1] - 1)
        pooled = jnp.take_along_axis(hidden, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        logits = nn.Dense(cfg.num_labels, use_bias=False, dtype=self.dtype, name="score")(pooled)

        out: Dict[str, Any] = {"logits": logits}
        if labels is not None:
            lg = logits.astype(jnp.float32)
            logz = jax.nn.logsumexp(lg, axis=-1)
            gold = jnp.take_along_axis(lg, labels[:, None], axis=-1)[:, 0]
            out["loss"] = jnp.mean(logz - gold)
        return out
