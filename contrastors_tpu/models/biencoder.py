"""BiEncoder: universal single-tower embedder + pooling heads.

TPU counterpart of the reference BiEncoder
(reference: models/biencoder/modeling_biencoder.py:30-319). The trunk is
dispatched by family (encoder / decoder / vision); pooling, projection,
hamming LN, normalize/binarize semantics are preserved. Freezing is
stop_gradient here plus an optimizer mask in the trainer (the torch version
uses requires_grad=False + no_grad).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contrastors_tpu.layers.attention import MultiHeadAttentionPooling
from contrastors_tpu.layers.norms import LayerNorm
from contrastors_tpu.models.decoder import DecoderModel
from contrastors_tpu.models.nomic_bert import NomicBertModel
from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.vit import ViTModel

TRUNK_TYPES = ("encoder", "decoder", "vision")


def mean_pool(hidden, attention_mask):
    """Masked mean (reference modeling_biencoder.py:79-90)."""
    if attention_mask is None:
        return jnp.mean(hidden, axis=1)
    m = attention_mask[:, :, None].astype(jnp.float32)
    s = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    d = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return (s / d).astype(hidden.dtype)


def last_token_pool(hidden, attention_mask):
    """Embedding of the final (EOS) token (reference
    modeling_biencoder.py:52-76). EOS-placement validation is host-side in
    this framework — data/text.py validate_eos_placement, called by
    TokenizeCollator — because value-dependent raises can't live under jit."""
    lengths = jnp.sum(attention_mask, axis=-1) - 1
    return jnp.take_along_axis(hidden, lengths[:, None, None].astype(jnp.int32), axis=1)[:, 0]


def cls_pool(hidden, attention_mask):
    return hidden[:, 0]


def segment_mean_pool(hidden, segment_ids, max_segments, pair_index):
    """Per-segment masked mean over packed rows (data/packing.py contract):
    hidden [R, L, D], segment_ids [R, L] in 0..max_segments (0 = pad),
    pair_index [B] flat (row * max_segments + seg - 1) gather indices, or
    None to return the raw [R * max_segments, D] slot matrix.
    The one-hot einsum lowers to a single MXU matmul."""
    onehot = (
        segment_ids[:, :, None] == jnp.arange(1, max_segments + 1)[None, None, :]
    ).astype(jnp.float32)  # [R, L, K]
    sums = jnp.einsum("rlk,rld->rkd", onehot, hidden.astype(jnp.float32))
    counts = jnp.maximum(jnp.sum(onehot, axis=1), 1.0)[..., None]  # [R, K, 1]
    means = (sums / counts).reshape(-1, hidden.shape[-1])  # [R*K, D]
    if pair_index is None:
        return means.astype(hidden.dtype)
    return means[pair_index].astype(hidden.dtype)


class LogitScale(nn.Module):
    """exp-parameterized temperature (reference modeling_biencoder.py:30-41)."""

    logit_scale_init: float = 1 / 0.07
    trainable: bool = True

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "logit_scale",
            nn.initializers.constant(float(np.log(self.logit_scale_init))),
            (),
            jnp.float32,
        )
        if not self.trainable:
            s = jax.lax.stop_gradient(s)
        return x * jnp.exp(s)


class BiEncoder(nn.Module):
    config: TrunkConfig
    trunk_type: str = "encoder"  # encoder | decoder | vision
    pooling: str = "mean"  # mean | last | cls | map | none
    projection_dim: Optional[int] = None
    hamming: bool = False
    freeze: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        pixel_values: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        pair_index: Optional[jnp.ndarray] = None,
        last_token_index: Optional[jnp.ndarray] = None,
        max_segments: Optional[int] = None,
        normalize: bool = True,
        binarize: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        """Packed mode (encoder trunks, mean pooling): pass the
        data/packing.py quadruple (segment_ids/position_ids/pair_index +
        static max_segments); attention stays within segments and pooling
        is per segment, returning one embedding per original sequence.
        With pair_index=None the raw [rows * max_segments, D] slot matrix is
        returned instead (GradCache chunks over rows and gathers pairs at
        the loss stage; empty slots normalize to ~0)."""
        cfg = self.config
        packed = segment_ids is not None and max_segments is not None
        if packed and self.trunk_type == "vision":
            raise ValueError("packed mode does not apply to vision trunks")
        if packed and attention_mask is None:
            # anything mask-aware inside the trunk (MoE routing, aux stats)
            # must see row padding as invalid, not just the attention bias
            attention_mask = (segment_ids > 0).astype(jnp.int32)
        if self.trunk_type == "encoder":
            trunk_out = NomicBertModel(
                config=cfg, dtype=self.dtype, add_pooling_layer=False, remat=self.remat, name="trunk"
            )(
                input_ids,
                attention_mask=attention_mask,
                position_ids=position_ids,
                token_type_ids=token_type_ids,
                segment_ids=segment_ids,
                deterministic=deterministic,
            )
        elif self.trunk_type == "decoder":
            trunk_out = DecoderModel(config=cfg, dtype=self.dtype, remat=self.remat, name="trunk")(
                input_ids,
                attention_mask=attention_mask,
                position_ids=position_ids,
                segment_ids=segment_ids,
                deterministic=deterministic,
            )
        elif self.trunk_type == "vision":
            trunk_out = ViTModel(config=cfg, dtype=self.dtype, remat=self.remat, name="trunk")(
                pixel_values, deterministic=deterministic
            )
            attention_mask = None
        else:
            raise ValueError(f"unknown trunk_type {self.trunk_type!r}")

        hidden = trunk_out["last_hidden_state"]
        if self.freeze:
            hidden = jax.lax.stop_gradient(hidden)

        router_logits = trunk_out.get("router_logits") or None

        if packed:
            if self.pooling == "mean":
                embedding = segment_mean_pool(hidden, segment_ids, max_segments, pair_index)
            elif self.pooling == "last":
                # per-segment last token (decoder trunks; causal attention
                # stays within segments via the segment-id bias)
                if last_token_index is None:
                    raise ValueError("packed 'last' pooling needs last_token_index")
                flat = hidden.reshape(-1, hidden.shape[-1])
                embedding = flat[last_token_index]
                # a sequence truncated to 0 tokens by an over-tight packing
                # geometry owns no position — its gather would alias another
                # sample's last token; zero it (normalize is VJP-safe at 0)
                counts = (
                    segment_ids[:, :, None]
                    == jnp.arange(1, max_segments + 1)[None, None, :]
                ).sum(axis=1).reshape(-1)  # [R*K] tokens per slot
                sel = counts if pair_index is None else counts[pair_index]
                embedding = embedding * (sel > 0).astype(embedding.dtype)[:, None]
            else:
                raise ValueError("packed mode supports mean or last pooling only")
        elif self.pooling == "mean":
            embedding = mean_pool(hidden, attention_mask)
        elif self.pooling == "last":
            embedding = last_token_pool(hidden, attention_mask)
        elif self.pooling == "cls":
            embedding = cls_pool(hidden, attention_mask)
        elif self.pooling == "map":
            embedding = MultiHeadAttentionPooling(config=cfg, dtype=self.dtype, name="selector")(
                hidden, attention_mask=attention_mask, deterministic=deterministic
            )
        elif self.pooling == "none":
            embedding = hidden
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")

        if self.hamming:
            embedding = LayerNorm(
                dim=embedding.shape[-1],
                eps=1e-5,
                elementwise_affine=False,
                name="hamming",
            )(embedding)

        if self.projection_dim:
            embedding = nn.Dense(self.projection_dim, dtype=self.dtype, name="proj")(embedding)

        if binarize:
            embedding = (embedding > 0).astype(jnp.float32)
        elif normalize:
            # clamp INSIDE the sqrt: jnp.linalg.norm's VJP at a zero vector
            # is NaN even under a zero cotangent (sqrt'(0) = inf), which
            # would poison grad-cache replay when packed slot matrices
            # contain empty slots
            e32 = embedding.astype(jnp.float32)
            norm = jnp.sqrt(jnp.maximum(jnp.sum(e32 * e32, axis=-1, keepdims=True), 1e-24))
            embedding = (e32 / norm).astype(embedding.dtype)

        return {"embedding": embedding, "router_logits": router_logits}
