"""NomicBERT: bidirectional flash-style encoder, flax edition.

TPU counterpart of the reference NomicBertModel / heads
(reference: models/encoder/modeling_nomic_bert.py:283-757). Postnorm blocks,
BERT embedding LN before dropout, optional rotary (nomic-bert-2048), MoE
every-n-layers. The reference's global unpad->varlen->repad trick
(modeling_nomic_bert.py:331-394) is replaced by static-shape masking /
packed segment ids, which is what XLA wants.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastors_tpu.layers.block import Block
from contrastors_tpu.layers.embeddings import BertEmbeddings
from contrastors_tpu.layers.norms import LayerNorm, make_norm
from contrastors_tpu.layers.activations import ACT2FN
from contrastors_tpu.models.model_config import TrunkConfig


def _layer_is_moe(config: TrunkConfig, i: int) -> bool:
    # reference modeling_nomic_bert.py:298-302: moe when i % every_n == 1
    if config.num_experts <= 0:
        return False
    if config.moe_every_n_layers == 1:
        # i % 1 == 1 never holds, so every_n=1 (the default) silently
        # builds a fully dense model — the reference has the same quirk;
        # fail loudly instead of dropping num_experts on the floor
        raise ValueError(
            "num_experts > 0 with moe_every_n_layers == 1 places MoE on NO "
            "layers (the placement rule is i % every_n == 1, reference "
            "modeling_nomic_bert.py:298-302); set moe_every_n_layers >= 2"
        )
    if config.moe_every_n_layers > 0:
        return i % config.moe_every_n_layers == 1
    return False


class NomicBertModel(nn.Module):
    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32
    add_pooling_layer: bool = False
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        hidden = BertEmbeddings(config=cfg, dtype=self.dtype, name="embeddings")(
            input_ids, position_ids=position_ids, token_type_ids=token_type_ids
        )
        # BERT: LN before dropout (reference modeling_nomic_bert.py:529-535)
        hidden = LayerNorm(
            dim=cfg.n_embd,
            eps=cfg.layer_norm_epsilon,
            use_bias=cfg.norm_bias,
            name="emb_ln",
        )(hidden)
        if cfg.embd_pdrop > 0.0 and not deterministic:
            hidden = nn.Dropout(rate=cfg.embd_pdrop, name="emb_drop")(hidden, deterministic=False)

        router_logits = []
        residual = None
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(7,))
        every_n = cfg.global_attn_every_n_layers
        for i in range(cfg.n_layer):
            # ModernBERT-style alternation: every_n-th layer is global, the
            # rest are sliding-window local with their own rotary base
            is_global = every_n <= 0 or i % every_n == 0
            hidden, residual, rl = block_cls(
                config=cfg,
                dtype=self.dtype,
                moe=_layer_is_moe(cfg, i),
                attn_window=0 if is_global else cfg.sliding_window,
                rotary_base_override=None if is_global else cfg.local_rotary_emb_base,
                norm1_identity=cfg.prenorm and cfg.skip_first_prenorm and i == 0,
                name=f"layers_{i}",
            )(hidden, residual, attention_mask, segment_ids, position_ids, None, deterministic)
            if rl is not None:
                router_logits.append(rl)

        if cfg.prenorm:
            # final dropout-add-norm closes the shifted-prenorm carry
            # (reference decoder.py:276-320 role; ModernBERT final_norm)
            if cfg.resid_pdrop > 0.0 and not deterministic:
                hidden = nn.Dropout(rate=cfg.resid_pdrop, name="final_drop")(
                    hidden, deterministic=False
                )
            resid_dtype = jnp.float32 if cfg.residual_in_fp32 else hidden.dtype
            residual = hidden.astype(resid_dtype) if residual is None else residual + hidden.astype(resid_dtype)
            hidden = make_norm(cfg, name="final_norm")(residual).astype(self.dtype)

        out: Dict[str, Any] = {"last_hidden_state": hidden, "router_logits": router_logits}
        if self.add_pooling_layer:
            pooled = nn.Dense(cfg.n_embd, dtype=self.dtype, name="pooler_dense")(hidden[:, 0])
            out["pooler_output"] = jnp.tanh(pooled)
        return out


class NomicBertForPreTraining(nn.Module):
    """MLM head with tied decoder weights
    (reference: modeling_nomic_bert.py:590-669). Two loss paths:
      - default: label-masked CE over all positions (static shapes, -100
        ignored) — identical loss value to the reference;
      - dense_seq_output (reference 649-664): pass `masked_positions`
        ([B, k] per-row indices into the sequence dim, host-collated to a
        STATIC per-row count with -100-labelled filler slots) and `labels`
        as the matching [B, k] matrix — the vocab projection then runs on
        B*k rows instead of B*S (~3x fewer head FLOPs at mlm_prob 0.30).
        The reference gathers a dynamic count per batch; a fixed per-row k
        is the TPU-native equivalent (XLA requires static shapes), and
        per-row indexing keeps the gather local to each batch row so the
        batch ("data") sharding axis passes straight through."""

    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        masked_positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        bert = NomicBertModel(
            config=cfg, dtype=self.dtype, add_pooling_layer=False, remat=self.remat, name="bert"
        )
        outputs = bert(
            input_ids,
            attention_mask=attention_mask,
            position_ids=position_ids,
            token_type_ids=token_type_ids,
            deterministic=deterministic,
        )
        hidden = outputs["last_hidden_state"]
        if masked_positions is not None:
            # dense_seq_output: project only the masked rows, gathered
            # per batch row ([B, k] indices -> [B, k, D])
            hidden = jnp.take_along_axis(hidden, masked_positions[:, :, None], axis=1)

        # transform: dense -> act -> LN (reference modeling_nomic_bert.py:417-454)
        act = jax.nn.silu if cfg.activation_function == "swiglu" else ACT2FN[cfg.activation_function]
        h = nn.Dense(cfg.n_embd, use_bias=cfg.mlp_fc1_bias, dtype=self.dtype, name="transform_dense")(hidden)
        h = act(h)
        h = make_norm(cfg, name="transform_layer_norm")(h)

        if cfg.tie_word_embeddings:
            table = bert.variables["params"]["embeddings"]["word_embeddings"]["embedding"]
            logits = h @ table.astype(self.dtype).T
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=self.dtype, name="decoder")(h)
        decoder_bias = self.param("decoder_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32)
        logits = logits + decoder_bias.astype(logits.dtype)

        out: Dict[str, Any] = {"prediction_logits": logits}
        if labels is not None:
            out["loss"] = masked_cross_entropy(logits, labels)
        return out


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over positions with label >= 0 (HF ignore_index=-100 semantics)."""
    V = logits.shape[-1]
    flat_logits = logits.reshape(-1, V).astype(jnp.float32)
    flat_labels = labels.reshape(-1)
    valid = flat_labels >= 0
    safe = jnp.where(valid, flat_labels, 0)
    logz = jax.nn.logsumexp(flat_logits, axis=-1)
    gold = jnp.take_along_axis(flat_logits, safe[:, None], axis=-1)[:, 0]
    nll = (logz - gold) * valid.astype(jnp.float32)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


class NomicBertForSequenceClassification(nn.Module):
    """GLUE head (reference: modeling_nomic_bert.py:672-757)."""

    config: TrunkConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        outputs = NomicBertModel(
            config=cfg, dtype=self.dtype, add_pooling_layer=True, name="bert"
        )(input_ids, attention_mask=attention_mask, token_type_ids=token_type_ids, deterministic=deterministic)
        pooled = outputs["pooler_output"]
        p_drop = cfg.classifier_dropout if cfg.classifier_dropout is not None else cfg.embd_pdrop
        if p_drop > 0.0 and not deterministic:
            pooled = nn.Dropout(rate=p_drop, name="cls_dropout")(pooled, deterministic=False)
        logits = nn.Dense(cfg.num_labels, dtype=self.dtype, name="classifier")(pooled)

        out: Dict[str, Any] = {"logits": logits}
        if labels is not None:
            problem = cfg.problem_type
            if problem is None:
                if cfg.num_labels == 1:
                    problem = "regression"
                elif jnp.issubdtype(labels.dtype, jnp.integer):
                    problem = "single_label_classification"
                else:
                    problem = "multi_label_classification"
            lg = logits.astype(jnp.float32)
            if problem == "regression":
                out["loss"] = jnp.mean((lg.squeeze() - labels.squeeze().astype(jnp.float32)) ** 2)
            elif problem == "single_label_classification":
                logz = jax.nn.logsumexp(lg, axis=-1)
                gold = jnp.take_along_axis(lg, labels[:, None], axis=-1)[:, 0]
                out["loss"] = jnp.mean(logz - gold)
            else:
                lab = labels.astype(jnp.float32)
                out["loss"] = jnp.mean(
                    jnp.maximum(lg, 0) - lg * lab + jnp.log1p(jnp.exp(-jnp.abs(lg)))
                )
        return out
