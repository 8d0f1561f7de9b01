"""Hard-negative mining + false-negative filtering on TPU.

Counterpart of the reference mining scripts (reference:
scripts/text/st_mine_hard_negatives.py, get_negatives.py,
filter_false_negatives.py), re-designed for TPU: instead of a faiss CPU
index, candidate retrieval is a chunked dense q @ D.T matmul + top_k on
device — exact (not ANN) and MXU-bound.

Negatives for each query are the top-ranked non-positive documents below a
false-negative margin: candidates scoring >= margin_fraction * positive
score are treated as probable positives and skipped (the reference's
"filter false negatives" rule).

Usage:
  python -m contrastors_tpu.scripts.mine_hard_negatives \
      --pairs data/pairs.jsonl --model <dir> --output mined.jsonl \
      --num_negatives 7 --margin 0.95
"""

import argparse
import json

import numpy as np


def mine(
    query_embs: np.ndarray,
    doc_embs: np.ndarray,
    positives: np.ndarray,
    num_negatives: int = 7,
    margin: float = 0.95,
    chunk: int = 1024,
):
    """positives[i] = index of query i's positive document.
    Returns list of negative-index lists."""
    import jax
    import jax.numpy as jnp

    D = jnp.asarray(doc_embs)
    out = []
    k = min(num_negatives + 32, doc_embs.shape[0])

    @jax.jit
    def topk_chunk(q):
        scores = q @ D.T
        return jax.lax.top_k(scores, k)

    for start in range(0, len(query_embs), chunk):
        q = jnp.asarray(query_embs[start : start + chunk])
        scores, idx = topk_chunk(q)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        for row in range(q.shape[0]):
            qi = start + row
            pos = positives[qi]
            pos_score = float(query_embs[qi] @ doc_embs[pos])
            negs, overflow = [], []
            for s, j in zip(scores[row], idx[row]):
                if j == pos:
                    continue
                if s >= margin * pos_score:  # probable false negative
                    overflow.append(int(j))
                    continue
                negs.append(int(j))
                if len(negs) == num_negatives:
                    break
            # under-filled rows (e.g. anisotropic embeddings score everything
            # near the positive): fill from the LEAST similar skipped
            # candidates rather than returning an empty list
            while len(negs) < num_negatives and overflow:
                negs.append(overflow.pop())
            out.append(negs)
    short = sum(1 for n in out if len(n) < num_negatives)
    if short:
        print(f"[mine] {short}/{len(out)} queries have < {num_negatives} negatives")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pairs", required=True, help="jsonl with query/document")
    parser.add_argument("--model", required=True, help="local HF checkpoint dir")
    parser.add_argument("--output", required=True)
    parser.add_argument("--num_negatives", type=int, default=7)
    parser.add_argument("--margin", type=float, default=0.95)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--seq_len", type=int, default=256)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.eval.encoder import Encoder
    from contrastors_tpu.models.auto import load_biencoder

    rows = [json.loads(l) for l in open(args.pairs) if l.strip()]
    queries = [r["query"] for r in rows]
    docs = [r["document"] for r in rows]

    margs = ModelArgs(model_type="encoder", model_name=args.model, pooling="mean")
    module, params, _ = load_biencoder(margs)
    enc = Encoder(
        module, params, AutoTokenizer.from_pretrained(args.model),
        seq_len=args.seq_len, batch_size=args.batch_size,
    )
    q_embs = enc.encode_queries(queries)
    d_embs = enc.encode_corpus(docs)

    negatives = mine(
        q_embs, d_embs, np.arange(len(rows)), args.num_negatives, args.margin
    )
    with open(args.output, "w") as f:
        for r, negs in zip(rows, negatives):
            r["negatives"] = [docs[j] for j in negs]
            f.write(json.dumps(r) + "\n")
    print(f"mined negatives for {len(rows)} pairs -> {args.output}")


if __name__ == "__main__":
    main()
