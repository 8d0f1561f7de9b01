"""Dense retrieval evaluation (BEIR/LoCo/NanoBEIR-style) without the beir
package.

TPU counterpart of the reference's DRES-based harnesses
(reference: eval/eval_beir.py:64-267, eval/eval_loco.py, and the NanoBEIR
in-train eval trainers/text_text.py:453-471): encode corpus + queries,
cosine top-k on device, nDCG@k / Recall@k via eval/metrics.py.
"""

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contrastors_tpu.eval.metrics import ndcg_at_k, recall_at_k


def dense_retrieve(
    query_embs: np.ndarray,
    corpus_embs: np.ndarray,
    corpus_ids: List[str],
    top_k: int = 100,
) -> List[List[str]]:
    scores = jnp.asarray(query_embs) @ jnp.asarray(corpus_embs).T
    k = min(top_k, corpus_embs.shape[0])
    _, idx = jax.lax.top_k(scores, k)
    idx = np.asarray(idx)
    return [[corpus_ids[j] for j in row] for row in idx]


def evaluate_retrieval(
    encoder,
    corpus: Dict[str, dict],
    queries: Dict[str, str],
    qrels: Dict[str, Dict[str, int]],
    ks: Sequence[int] = (10, 100),
) -> Dict[str, float]:
    """corpus: id -> {title?, text}; queries: id -> text;
    qrels: query_id -> {doc_id: relevance}."""
    corpus_ids = list(corpus)
    corpus_embs = encoder.encode_corpus([corpus[c] for c in corpus_ids])
    query_ids = [q for q in queries if q in qrels]
    query_embs = encoder.encode_queries([queries[q] for q in query_ids])

    ranked = dense_retrieve(query_embs, corpus_embs, corpus_ids, top_k=max(ks))
    relevant = [qrels[q] for q in query_ids]
    out = {}
    for k in ks:
        out[f"ndcg@{k}"] = ndcg_at_k(ranked, relevant, k=k)
        out[f"recall@{k}"] = recall_at_k(ranked, relevant, k=k)
    return out
