"""Consistency filtering of noisy web pairs on TPU.

Counterpart of the reference's faiss-based filter (reference:
scripts/text/index_filtering.py:1-485 + README: embed with a teacher, keep
a pair only if its document ranks within top-k for its query against a
large sampled pool). On TPU the pool scoring is an exact chunked matmul +
top_k — no ANN index, MXU-bound, and trivially shardable over the mesh.

Usage:
  python -m contrastors_tpu.scripts.consistency_filter \
      --pairs data/pairs.jsonl --model <teacher dir> --output kept.jsonl \
      --top_k 2 --pool_size 100000
"""

import argparse
import json

import numpy as np


def consistency_keep_mask(
    query_embs: np.ndarray,
    doc_embs: np.ndarray,
    top_k: int = 2,
    pool_size: int = 0,
    seed: int = 0,
    chunk: int = 1024,
) -> np.ndarray:
    """keep[i] = document i ranks in the query-i top_k against the pool."""
    import jax
    import jax.numpy as jnp

    n = len(query_embs)
    rng = np.random.default_rng(seed)
    if pool_size and pool_size < n:
        pool_idx = rng.choice(n, size=pool_size, replace=False)
    else:
        pool_idx = np.arange(n)
    pool = jnp.asarray(doc_embs[pool_idx])
    keep = np.zeros(n, dtype=bool)

    @jax.jit
    def pos_rank(q, pos_scores):
        scores = q @ pool.T  # [c, P]
        higher = jnp.sum((scores > pos_scores[:, None]).astype(jnp.int32), axis=1)
        return higher

    for start in range(0, n, chunk):
        q = jnp.asarray(query_embs[start : start + chunk])
        pos_scores = jnp.asarray(
            np.einsum("nd,nd->n", query_embs[start : start + chunk], doc_embs[start : start + chunk])
        )
        higher = np.asarray(pos_rank(q, pos_scores))
        # keep when fewer than top_k pool documents outscore the positive
        keep[start : start + q.shape[0]] = higher < top_k
    return keep


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--top_k", type=int, default=2)
    parser.add_argument("--pool_size", type=int, default=0)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--seq_len", type=int, default=256)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.eval.encoder import Encoder
    from contrastors_tpu.models.auto import load_biencoder

    rows = [json.loads(l) for l in open(args.pairs) if l.strip()]
    margs = ModelArgs(model_type="encoder", model_name=args.model, pooling="mean")
    module, params, _ = load_biencoder(margs)
    enc = Encoder(
        module, params, AutoTokenizer.from_pretrained(args.model),
        seq_len=args.seq_len, batch_size=args.batch_size,
    )
    q = enc.encode_queries([r["query"] for r in rows])
    d = enc.encode_corpus([r["document"] for r in rows])
    keep = consistency_keep_mask(q, d, top_k=args.top_k, pool_size=args.pool_size)
    with open(args.output, "w") as f:
        for r, k in zip(rows, keep):
            if k:
                f.write(json.dumps(r) + "\n")
    print(f"kept {int(keep.sum())}/{len(rows)} pairs -> {args.output}")


if __name__ == "__main__":
    main()
