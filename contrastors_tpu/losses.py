"""Contrastive losses: InfoNCE/CLIP, Matryoshka, MoE load-balancing.

TPU counterpart of the reference loss engine (reference: loss.py:13-132).
Two execution styles are supported:

  * pjit/global style (axis_name=None): inputs are global arrays sharded
    over the mesh's data axis; XLA GSPMD inserts the embedding all-gather
    for the q @ D.T similarity matmul and keeps the logits matrix sharded
    row-wise. Labels are global row indices — no rank arithmetic at all.

  * shard_map/SPMD style (axis_name="data"): inputs are per-device shards;
    the document side is all-gathered over ICI and labels are offset by
    jax.lax.axis_index — the same math as the reference's
    `rank * num_logits` offset (loss.py:111-117), but the all-gather is
    differentiable by construction so none of the reference's
    world_size-scaling workarounds are needed. Loss is the mean over local
    rows; psum-mean it across devices to get the global-batch loss.
"""

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp


def _ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - gold)


def clip_loss(
    query: jnp.ndarray,
    document: jnp.ndarray,
    logit_scale: Callable[[jnp.ndarray], jnp.ndarray],
    axis_name: Optional[str] = None,
    bidirectional: bool = False,
):
    """InfoNCE over q @ D.T with hard-negative support (document rows may be
    a multiple of query rows; reference loss.py:76-132).

    Returns (loss, accuracy). With axis_name, both are local means — psum
    across the axis outside if a global scalar is wanted.
    """
    query = query.astype(jnp.float32)
    document = document.astype(jnp.float32)

    n_local = query.shape[0]
    if axis_name is not None:
        document_g = jax.lax.all_gather(document, axis_name, axis=0, tiled=True)
        rank = jax.lax.axis_index(axis_name)
        world = jax.lax.axis_size(axis_name)
        offset = rank * n_local
    else:
        document_g = document
        world = 1
        offset = 0

    # stretch labels when documents carry hard negatives
    mult = document_g.shape[0] // (n_local * world)
    labels = (jnp.arange(n_local) + offset) * mult

    sim_qd = logit_scale(query @ document_g.T)
    loss = _ce(sim_qd, labels)
    accuracy = jnp.mean((jnp.argmax(sim_qd, axis=-1) == labels).astype(jnp.float32))

    if bidirectional:
        if axis_name is not None:
            query_g = jax.lax.all_gather(query, axis_name, axis=0, tiled=True)
        else:
            query_g = query
        # document -> query direction; square matrices only, like the
        # reference (its bidirectional path assumes no negatives multiplier)
        assert mult == 1, "bidirectional clip_loss requires square similarity"
        d_labels = jnp.arange(document.shape[0]) + offset
        sim_dq = logit_scale(document @ query_g.T)
        loss = loss + _ce(sim_dq, d_labels)

    return loss, accuracy


def clip_loss_symmetric(
    image_emb: jnp.ndarray,
    text_emb: jnp.ndarray,
    logit_scale: Callable[[jnp.ndarray], jnp.ndarray],
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Symmetric CLIP loss computed on sharded rows of both directions
    (reference: models/dual_encoder/modeling_dual_encoder.py:36-68, which
    gathers both towers and averages both cross-entropies)."""
    image_emb = image_emb.astype(jnp.float32)
    text_emb = text_emb.astype(jnp.float32)
    n_local = image_emb.shape[0]
    if axis_name is not None:
        image_g = jax.lax.all_gather(image_emb, axis_name, axis=0, tiled=True)
        text_g = jax.lax.all_gather(text_emb, axis_name, axis=0, tiled=True)
        offset = jax.lax.axis_index(axis_name) * n_local
    else:
        image_g, text_g = image_emb, text_emb
        offset = 0
    labels = jnp.arange(n_local) + offset
    loss_i = _ce(logit_scale(image_emb @ text_g.T), labels)
    loss_t = _ce(logit_scale(text_emb @ image_g.T), labels)
    return (loss_i + loss_t) / 2.0


def matryoshka_clip_loss(
    query: jnp.ndarray,
    document: jnp.ndarray,
    logit_scale: Callable[[jnp.ndarray], jnp.ndarray],
    dims: Sequence[int],
    weights: Optional[Sequence[float]] = None,
    axis_name: Optional[str] = None,
    bidirectional: bool = False,
):
    """Re-normalized prefix-slice losses, weighted sum
    (reference: trainers/text_text.py:352-369).

    Returns (loss, accuracy) like clip_loss; accuracy is the in-batch
    accuracy at the LARGEST dim (the full embedding — the value the
    reference's clip_loss logs for the final slice)."""
    if weights is None:
        weights = [1.0] * len(dims)

    def renorm(x, d):
        x = x[..., :d].astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    total = 0.0
    full_acc = jnp.zeros(())
    max_dim = max(dims)
    for dim, w in zip(dims, weights):
        loss, acc = clip_loss(
            renorm(query, dim),
            renorm(document, dim),
            logit_scale,
            axis_name=axis_name,
            bidirectional=bidirectional,
        )
        total = total + w * loss
        if dim == max_dim:
            full_acc = acc
    return total / sum(weights), full_acc


def router_aux_loss(
    router_logits: List[jnp.ndarray],
    num_experts: int,
    top_k: int,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Switch-style load-balance loss, summed over layers with the
    attention-mask correction (reference: loss.py:13-73)."""
    logits = jnp.concatenate([r.astype(jnp.float32) for r in router_logits], axis=0)  # [L*N, E]
    weights = jax.nn.softmax(logits, axis=-1)
    _, selected = jax.lax.top_k(weights, top_k)  # [L*N, k]
    expert_mask = jax.nn.one_hot(selected, num_experts, dtype=jnp.float32)  # [L*N, k, E]

    if attention_mask is not None:
        n_layers = logits.shape[0] // attention_mask.size
        m = jnp.tile(attention_mask.reshape(-1).astype(jnp.float32), n_layers)  # [L*N]
        denom = jnp.maximum(jnp.sum(m), 1.0)
        tokens_per_expert = jnp.einsum("nke,n->ke", expert_mask, m) / denom
        router_prob_per_expert = jnp.einsum("ne,n->e", weights, m) / denom
    else:
        tokens_per_expert = jnp.mean(expert_mask, axis=0)
        router_prob_per_expert = jnp.mean(weights, axis=0)

    overall = jnp.sum(tokens_per_expert * router_prob_per_expert[None, :])
    return overall * num_experts
