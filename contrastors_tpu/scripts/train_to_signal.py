"""Train-to-signal: prove the trainer LEARNS, not just that loss decreases.

The reference anchors quality to full MTEB/LoCo/ImageNet runs
(reference: eval/mteb_eval/eval_mteb.py:164-186, trainers/text_text.py:453-471
for the in-train NanoBEIR-style eval). Those need network + real
checkpoints; the achievable offline analogue (round-3 VERDICT missing #2)
is: train a model for a few hundred REAL optimizer steps on-chip over a
learnable corpus, run the same NanoBEIR-style retrieval eval the trainer
uses (eval/encoder.Encoder + eval/retrieval.evaluate_retrieval) BEFORE and
AFTER, and assert the retrieval metric improves over init.

The corpus is synthetic but genuinely learnable: T disjoint topics, each
owning a block of vocabulary words split into a QUERY half and a DOCUMENT
half — queries sample only query-half words, documents only document-half
words, so there is ZERO lexical overlap between a query and its relevant
document. A random-init model therefore scores near chance; ranking the
held-out same-topic document first requires the model to LEARN the
query-word -> document-word association from the training pairs.

Run from /root/repo (writes the results JSON + learning curve for
PARITY.md):

  python -m contrastors_tpu.scripts.train_to_signal \
      [--out docs/train_to_signal.json] [--steps 320]
"""

import argparse
import json
import os
import pathlib
import shutil

import numpy as np

TOPICS = 128
WORDS_PER_TOPIC = 12
PAIRS_PER_TOPIC = 64
BATCH = 128


def build_world(tmp: pathlib.Path, seed: int = 0):
    """Tiny random HF BERT checkpoint + topical train pairs + held-out
    BEIR-format retrieval dir (corpus/queries/qrels)."""
    import torch
    from safetensors.torch import save_file
    from transformers import BertConfig, BertModel, BertTokenizerFast

    rng = np.random.default_rng(seed)
    vocab_words = [f"word{i}" for i in range(TOPICS * WORDS_PER_TOPIC)]
    ckpt = tmp / "tiny-bert"
    ckpt.mkdir(parents=True)
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=len(vocab_words) + 5, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    cfg.save_pretrained(str(ckpt))
    save_file(
        {k: v.contiguous() for k, v in BertModel(cfg).state_dict().items()},
        str(ckpt / "model.safetensors"),
    )
    (ckpt / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + vocab_words)
    )
    BertTokenizerFast(vocab_file=str(ckpt / "vocab.txt")).save_pretrained(str(ckpt))

    def sample_text(topic: int, n_words: int, side: str) -> str:
        # query side draws from the topic's first word-half, document side
        # from the second: no lexical overlap between query and document
        half = WORDS_PER_TOPIC // 2
        lo = topic * WORDS_PER_TOPIC + (0 if side == "q" else half)
        ws = rng.integers(lo, lo + half, size=n_words)
        return " ".join(f"word{w}" for w in ws)

    pairs = tmp / "pairs.jsonl"
    with open(pairs, "w") as f:
        for t in range(TOPICS):
            for _ in range(PAIRS_PER_TOPIC):
                f.write(json.dumps({
                    "query": sample_text(t, int(rng.integers(4, 9)), "q"),
                    "document": sample_text(t, int(rng.integers(12, 25)), "d"),
                }) + "\n")

    ev = tmp / "nanobeir"
    ev.mkdir()
    with open(ev / "corpus.jsonl", "w") as f:
        for t in range(TOPICS):
            f.write(json.dumps({"_id": f"d{t}", "title": "", "text": sample_text(t, 20, "d")}) + "\n")
    with open(ev / "queries.jsonl", "w") as f:
        for t in range(TOPICS):
            f.write(json.dumps({"_id": f"q{t}", "text": sample_text(t, 6, "q")}) + "\n")
    with open(ev / "qrels.tsv", "w") as f:
        for t in range(TOPICS):
            f.write(f"q{t}\td{t}\t1\n")
    return str(ckpt), str(pairs), str(ev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/train_to_signal.json")
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--tmp", default="/tmp/train_to_signal")
    args = ap.parse_args()

    tmp = pathlib.Path(args.tmp)
    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    ckpt, pairs, ev_dir = build_world(tmp)

    from contrastors_tpu.config import Config
    from contrastors_tpu.trainers import TRAINER_REGISTRY

    out_dir = str(tmp / "run")
    cfg = Config(
        # finetune-recipe shape (reference contrastive_finetune.yaml: linear
        # schedule + warmup; lr scaled up for the tiny random-init model)
        train_args=dict(
            num_train_steps=args.steps, learning_rate=args.lr, weight_decay=0.01,
            warmup_steps=max(args.steps // 10, 1), schedule_type="linear",
            max_grad_norm=1.0, adam_beta1=0.9, adam_beta2=0.999,
            log_lr_every=10, log_grads_every=1000, wandb=False,
            output_dir=out_dir, clamp_logits=True,
        ),
        data_args=dict(
            input_shards=pairs, batch_size=BATCH, seed=0, workers=0,
            shuffle=True, streaming=False, query_max_length=16,
            document_max_length=32, eval_retrieval=ev_dir, eval_batch_size=64,
        ),
        model_args=dict(
            model_type="encoder", model_name=ckpt, pooling="mean",
            logit_scale=50, trainable_logit_scale=False, pretrained=True,
            attn_impl="sdpa", num_negatives=-1,
        ),
    )
    trainer = TRAINER_REGISTRY["encoder"](cfg, "fp32")

    before = trainer.eval_loop(step=0)
    print("init:", {k: round(v, 4) for k, v in before.items()}, flush=True)

    steps_run = trainer.train()

    after = trainer.eval_loop(step=steps_run)
    print("after:", {k: round(v, 4) for k, v in after.items()}, flush=True)

    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        metrics = [json.loads(l) for l in f]
    losses = [(m["step"], m["loss"]) for m in metrics if "loss" in m and "step" in m]

    key = "retrieval/ndcg@10"
    result = {
        "steps": steps_run,
        "batch": BATCH,
        "topics": TOPICS,
        "ndcg@10_init": before[key],
        "ndcg@10_after": after[key],
        "recall@10_init": before["retrieval/recall@10"],
        "recall@10_after": after["retrieval/recall@10"],
        "loss_curve": losses,
        "devices": str([str(d) for d in __import__("jax").devices()]),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "loss_curve"}))
    assert after[key] > before[key], (
        f"retrieval did not improve over init: {before[key]} -> {after[key]}"
    )
    assert after[key] > 0.9, f"trained nDCG@10 {after[key]} below the learnable-corpus bar"
    print("TRAIN-TO-SIGNAL OK")


if __name__ == "__main__":
    main()
