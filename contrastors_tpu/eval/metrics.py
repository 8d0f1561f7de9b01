"""Evaluation metrics (reference: eval/imagenet/metrics.py:4-7 top-k; BEIR's
ndcg/recall are re-implemented here so retrieval eval runs without the beir
package)."""

from typing import Dict, List, Sequence

import numpy as np


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, ks: Sequence[int] = (1, 5)) -> Dict[int, float]:
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out[k] = float(hit.mean())
    return out


def ndcg_at_k(ranked_ids: List[List[str]], relevant: List[Dict[str, int]], k: int = 10) -> float:
    """ranked_ids[i]: doc ids ranked for query i; relevant[i]: {doc_id: gain}.

    LINEAR gain (gain / log2(rank+1)), matching trec_eval's ndcg_cut — the
    formula behind pytrec_eval and therefore BEIR's reported numbers; the
    exponential 2^gain - 1 variant diverges on graded-relevance qrels
    (TREC-COVID, NFCorpus, DBPedia)."""
    scores = []
    for ranked, rel in zip(ranked_ids, relevant):
        dcg = 0.0
        for rank, doc in enumerate(ranked[:k]):
            gain = rel.get(doc, 0)
            if gain > 0:
                dcg += gain / np.log2(rank + 2)
        ideal = sorted(rel.values(), reverse=True)[:k]
        idcg = sum(g / np.log2(r + 2) for r, g in enumerate(ideal) if g > 0)
        scores.append(dcg / idcg if idcg > 0 else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def recall_at_k(ranked_ids: List[List[str]], relevant: List[Dict[str, int]], k: int = 10) -> float:
    scores = []
    for ranked, rel in zip(ranked_ids, relevant):
        pos = {d for d, g in rel.items() if g > 0}
        if not pos:
            continue
        scores.append(len(pos & set(ranked[:k])) / len(pos))
    return float(np.mean(scores)) if scores else 0.0
