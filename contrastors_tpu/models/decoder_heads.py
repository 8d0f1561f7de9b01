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


class DecoderForTokenClassification(nn.Module):
    """Per-token classifier (reference flash_pythia.py TokenClassification
    head, :777-1235): dropout + linear over every position; -100 labels
    ignored."""

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
        p_drop = cfg.classifier_dropout if cfg.classifier_dropout is not None else cfg.resid_pdrop
        if p_drop > 0.0 and not deterministic:
            hidden = nn.Dropout(rate=p_drop, name="dropout")(hidden, deterministic=False)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype, name="classifier")(hidden)
        out: Dict[str, Any] = {"logits": logits}
        if labels is not None:
            out["loss"] = masked_cross_entropy(logits, labels)
        return out


class DecoderForQuestionAnswering(nn.Module):
    """Extractive QA head (reference flash_pythia.py QuestionAnswering head):
    linear -> (start, end) logits; CE against clamped span positions."""

    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        start_positions: Optional[jnp.ndarray] = None,
        end_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        hidden = DecoderModel(config=cfg, dtype=self.dtype, name="model")(
            input_ids, attention_mask=attention_mask, deterministic=deterministic
        )["last_hidden_state"]
        logits = nn.Dense(2, dtype=self.dtype, name="qa_outputs")(hidden)
        start_logits, end_logits = logits[..., 0], logits[..., 1]

        out: Dict[str, Any] = {"start_logits": start_logits, "end_logits": end_logits}
        if start_positions is not None and end_positions is not None:
            S = hidden.shape[1]

            def span_ce(lg, pos):
                pos = jnp.clip(pos.reshape(-1), 0, S - 1)  # HF clamps to seq len
                lg = lg.astype(jnp.float32)
                logz = jax.nn.logsumexp(lg, axis=-1)
                gold = jnp.take_along_axis(lg, pos[:, None], axis=-1)[:, 0]
                return jnp.mean(logz - gold)

            out["loss"] = 0.5 * (span_ce(start_logits, start_positions) + span_ce(end_logits, end_positions))
        return out
