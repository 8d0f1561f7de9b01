"""Real-checkpoint parity gate: the full ≥0.999-cosine check, one command.

Every in-repo parity test runs against randomly-initialized HF models (the
container has no network and no pretrained weights — see PARITY.md "Real-
checkpoint parity: honest status"). The moment REAL weights (e.g.
nomic-ai/nomic-embed-text-v1) are placed on disk, this script runs the
reference's own acceptance bar (reference tests/test_flash_bert.py:214-258:
per-row embedding cosine vs the fp32 HF forward):

  python -m contrastors_tpu.scripts.parity_onchip --model_dir <hf_dir> \
      [--pooling mean] [--seq_len 128] [--batch 16] [--bar 0.999]

It loads the directory twice — torch (AutoModel, trust_remote_code for
nomic_bert model types) as the fp32 gold, and this framework's BiEncoder
via the same models/auto.load_biencoder path the trainer uses — then
compares pooled, normalized embeddings on random token batches:

  * fp32 padded forward        (cosine >= bar per row)
  * bf16 padded forward        (cosine >= bar per row; the serving dtype)
  * fp32 PACKED forward        (packed pipeline == padded gold)

Exits non-zero with a per-row report on any failure.
"""

import argparse
import json
import sys

import numpy as np


def torch_embed(model_dir: str, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_dir, trust_remote_code=True).eval()
    with torch.no_grad():
        h = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state
        m = torch.tensor(mask, dtype=torch.float32)[:, :, None]
        emb = (h * m).sum(1) / m.sum(1).clamp(min=1.0)
        emb = torch.nn.functional.normalize(emb, dim=-1)
    return emb.numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--pooling", default="mean")
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bar", type=float, default=0.999)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.models.auto import load_biencoder

    rng = np.random.default_rng(args.seed)
    import json as _json

    with open(f"{args.model_dir}/config.json") as f:
        vocab = _json.load(f).get("vocab_size", 30522)
    ids = rng.integers(5, min(vocab, 30000), size=(args.batch, args.seq_len))
    lengths = rng.integers(args.seq_len // 4, args.seq_len + 1, size=args.batch)
    mask = (np.arange(args.seq_len)[None, :] < lengths[:, None]).astype(np.int64)
    ids = np.where(mask, ids, 0)

    gold = torch_embed(args.model_dir, ids, mask)

    failures = []
    for dtype_name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        margs = ModelArgs(
            model_type="encoder", model_name=args.model_dir,
            pooling=args.pooling, pretrained=True, attn_impl="flash",
        )
        module, params, _ = load_biencoder(margs, dtype=dtype)
        emb = np.asarray(
            jax.jit(
                lambda p, i, m: module.apply(p, input_ids=i, attention_mask=m)["embedding"]
            )(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)),
            dtype=np.float32,
        )
        cos = (emb * gold).sum(-1) / (
            np.linalg.norm(emb, axis=-1) * np.linalg.norm(gold, axis=-1)
        )
        ok = bool((cos >= args.bar).all())
        print(
            f"[{dtype_name} padded] cosine min={cos.min():.6f} "
            f"mean={cos.mean():.6f} -> {'PASS' if ok else 'FAIL'}"
        )
        if not ok:
            failures.append((dtype_name, cos.tolist()))

        if dtype_name == "fp32" and args.pooling == "mean":
            from contrastors_tpu.data.packing import pack_tokenized

            packed = pack_tokenized(
                ids.astype(np.int32), mask.astype(np.int32),
                row_len=args.seq_len * 2, max_segments=2,
            )
            pemb = np.asarray(
                jax.jit(
                    lambda p, b: module.apply(
                        p, input_ids=b["input_ids"], segment_ids=b["segment_ids"],
                        position_ids=b["position_ids"], pair_index=b["pair_index"],
                        max_segments=2,
                    )["embedding"]
                )(params, {k: jnp.asarray(v) for k, v in packed.items()}),
                dtype=np.float32,
            )
            pcos = (pemb * gold).sum(-1) / (
                np.linalg.norm(pemb, axis=-1) * np.linalg.norm(gold, axis=-1)
            )
            ok = bool((pcos >= args.bar).all())
            print(
                f"[fp32 packed] cosine min={pcos.min():.6f} "
                f"mean={pcos.mean():.6f} -> {'PASS' if ok else 'FAIL'}"
            )
            if not ok:
                failures.append(("fp32-packed", pcos.tolist()))

    if failures:
        print(json.dumps({"failures": failures}, indent=1))
        sys.exit(1)
    print(f"PARITY ONCHIP OK (bar {args.bar})")


if __name__ == "__main__":
    main()
