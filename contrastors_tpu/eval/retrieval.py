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


def run_beir_dirs(enc, dirs, ks=(10, 100), output=None):
    """Evaluate an Encoder over local BEIR-format dirs, print per-dataset
    scores and the average, optionally dump JSON. Shared by this module's
    CLI and eval_long_context's (which differs only in NTK defaults)."""
    import json
    import os

    from contrastors_tpu.eval.eval_long_context import load_beir_dir

    results = {}
    for path in dirs:
        corpus, queries, qrels = load_beir_dir(path)
        res = evaluate_retrieval(enc, corpus, queries, qrels, ks=tuple(ks))
        name = os.path.basename(os.path.normpath(path))
        while name in results:  # duplicate basenames must not collide
            name += "+"
        results[name] = res
        print(f"{name}: {json.dumps(res)}")
    key = f"ndcg@{ks[0]}"
    avg = float(np.mean([r[key] for r in results.values()]))
    results["avg"] = {key: avg}
    print(f"avg {key}: {avg:.4f}")
    if output:
        with open(output, "w") as f:
            json.dump(results, f, indent=2)
    return results


def main():
    """Standalone BEIR-style retrieval eval over local BEIR-format dirs
    (the reference's eval/eval_beir.py role: eval_beir.py:182-267; the
    multiprocess EncoderWorker pool becomes one jitted SPMD encoder).
    For >max_trained_positions lengths use eval_long_context (DynamicNTK).
    """
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", required=True, help="local HF model dir")
    parser.add_argument("--data", required=True, nargs="+", help="BEIR-format dirs")
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--ks", type=int, nargs="+", default=[10, 100])
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    from contrastors_tpu.eval.eval_long_context import build_long_context_encoder

    enc = build_long_context_encoder(
        args.model_name, seq_len=args.seq_len, batch_size=args.batch_size
    )
    run_beir_dirs(enc, args.data, ks=args.ks, output=args.output)


if __name__ == "__main__":
    main()
