"""Standalone embedding CLI: text in, embeddings out.

The inference face of the framework (the reference exposes encoding only
through its eval harnesses, eval/encoder.py:162-337; this wraps the same
jitted SPMD Encoder as a user tool):

  python -m contrastors_tpu.scripts.encode \
      --model_name <local HF dir> --input texts.txt --output embs.npy \
      [--prefix search_document] [--seq_len 512] [--batch_size 256] \
      [--matryoshka_dim 256] [--binarize]

Input: one text per line (.txt), or jsonl with --column. Output: .npy
float32 [N, D] (or packed uint8 bits with --binarize), row-aligned with
the input.
"""

import argparse
import json

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model_name", required=True, help="local HF model dir")
    parser.add_argument("--input", required=True, help=".txt (one per line) or .jsonl")
    parser.add_argument("--column", default="text", help="jsonl column holding the text")
    parser.add_argument("--output", required=True, help=".npy output path")
    parser.add_argument("--prefix", default=None, help="task prefix, e.g. search_query")
    parser.add_argument("--seq_len", type=int, default=512)
    # larger batches amortize dispatch on TPU serving (r5 sweep at 256
    # tokens: 64-class batches leave ~20% on the table vs 512/chip)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--pooling", default="mean")
    parser.add_argument("--matryoshka_dim", type=int, default=None)
    parser.add_argument("--binarize", action="store_true")
    parser.add_argument("--no_normalize", action="store_true")
    args = parser.parse_args()

    texts = []
    with open(args.input) as f:
        if args.input.endswith(".jsonl"):
            for line in f:
                line = line.strip()
                if line:
                    texts.append(str(json.loads(line)[args.column]))
        else:
            texts = [line.rstrip("\n") for line in f if line.strip()]
    if not texts:
        raise SystemExit(f"no texts in {args.input}")

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.eval.encoder import Encoder
    from contrastors_tpu.models.auto import load_biencoder

    margs = ModelArgs(
        model_type="encoder", model_name=args.model_name, pooling=args.pooling,
    )
    module, params, _cfg = load_biencoder(margs, dtype=jnp.bfloat16)
    tokenizer = AutoTokenizer.from_pretrained(args.model_name)
    enc = Encoder(
        module, params, tokenizer,
        seq_len=args.seq_len, batch_size=args.batch_size,
        normalize=not args.no_normalize, binarize=args.binarize,
        matryoshka_dim=args.matryoshka_dim,
    )
    embs = enc.encode(texts, prefix=args.prefix)
    if args.binarize:
        embs = np.packbits((np.asarray(embs) > 0).astype(np.uint8), axis=-1)
    np.save(args.output, np.asarray(embs))
    print(f"{len(texts)} texts -> {embs.shape} saved to {args.output}")


if __name__ == "__main__":
    main()
