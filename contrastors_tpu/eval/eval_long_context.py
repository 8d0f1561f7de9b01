"""Long-context retrieval evaluation (LoCo / Jina-LC style).

TPU counterpart of the reference harnesses (reference: eval/eval_loco.py,
eval_loco_v1.py, loco_data.py, eval_long_context.py): BEIR-format retrieval
at 2048-8192 token documents. Long context is rotary + DynamicNTK scaling
past the trained window (reference embedding.py:798-866, enabled only at
inference, modeling_biencoder.py:226-227) — here the NTK factor is set on
the trunk config at load time when seq_len exceeds max_trained_positions.

Dataset layout (local, BEIR format): <dir>/corpus.jsonl ({_id, title?,
text}), queries.jsonl ({_id, text}), qrels.tsv (qid \t did \t rel). The
reference pulls qasper/scrolls from the hub; offline runs point at local
exports of the same files.

Usage:
  python -m contrastors_tpu.eval.eval_long_context \
      --model_name <dir> --data <dir> [--seq_len 8192] \
      [--rotary_scaling_factor 2.0]
"""

import argparse
import json
import os


def load_beir_dir(path):
    corpus, queries, qrels = {}, {}, {}
    with open(os.path.join(path, "corpus.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            corpus[str(r["_id"])] = {"title": r.get("title", ""), "text": r["text"]}
    with open(os.path.join(path, "queries.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            queries[str(r["_id"])] = r["text"]
    with open(os.path.join(path, "qrels.tsv")) as f:
        for line in f:
            parts = line.strip().split("\t")
            if parts[0].lower() in ("query-id", "qid"):
                continue
            qid, did, rel = parts[:3]
            qrels.setdefault(qid, {})[did] = int(float(rel))
    return corpus, queries, qrels


def build_long_context_encoder(
    model_name: str,
    seq_len: int = 8192,
    rotary_scaling_factor: float = 2.0,
    batch_size: int = 8,
    query_prefix="search_query",
    document_prefix="search_document",
    dtype=None,
):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.eval.encoder import Encoder
    from contrastors_tpu.models.auto import load_biencoder

    margs = ModelArgs(model_type="encoder", model_name=model_name, pooling="mean")
    overrides = {}
    module, params, cfg = load_biencoder(
        margs, dtype=dtype or jnp.bfloat16, trunk_overrides=overrides
    )
    if cfg.rotary_emb_fraction > 0 and seq_len > cfg.max_trained_positions:
        # rebuild with DynamicNTK enabled for inference past the window
        overrides["rotary_scaling_factor"] = rotary_scaling_factor
        module, params, cfg = load_biencoder(
            margs, dtype=dtype or jnp.bfloat16, trunk_overrides=overrides
        )
    tokenizer = AutoTokenizer.from_pretrained(model_name)
    return Encoder(
        module, params, tokenizer,
        seq_len=seq_len, batch_size=batch_size,
        query_prefix=query_prefix, document_prefix=document_prefix,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--data", required=True, nargs="+", help="BEIR-format dirs")
    parser.add_argument("--seq_len", type=int, default=8192)
    parser.add_argument("--rotary_scaling_factor", type=float, default=2.0)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--ks", type=int, nargs="+", default=[10])
    parser.add_argument("--output", default=None)
    args = parser.parse_args()

    from contrastors_tpu.eval.retrieval import run_beir_dirs

    enc = build_long_context_encoder(
        args.model_name, args.seq_len, args.rotary_scaling_factor, args.batch_size
    )
    run_beir_dirs(enc, args.data, ks=args.ks, output=args.output)


if __name__ == "__main__":
    main()
