"""On-chip training smokes: drive the MoE contrastive path (dropless
grouped-matmul kernel in-model) and the CLIP/LiT image-text trainer for a
handful of real optimizer steps on the TPU, checking the losses decrease
and stay finite. Companion to verify_flash_onchip.py; run from /root/repo:

  python -m contrastors_tpu.scripts.verify_train_onchip

Reuses the test-suite fixture builders (tests/ must be importable)."""
import pathlib
import shutil
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")

tmp = pathlib.Path("/tmp/smoke2")
shutil.rmtree(tmp, ignore_errors=True)
tmp.mkdir(parents=True)

# --- 1. MoE contrastive (BiEncoder with dropless MoE trunk) ---------------
from contrastors_tpu.models.model_config import TrunkConfig
from contrastors_tpu.models.biencoder import BiEncoder
from contrastors_tpu.losses import clip_loss, router_aux_loss
from contrastors_tpu.utils.optim import make_optimizer
import optax

cfg = TrunkConfig(
    n_embd=256, n_layer=4, n_head=4, n_inner=512, vocab_size=512, pad_token_id=0,
    n_positions=64, attn_impl="sdpa", activation_function="swiglu",
    num_experts=8, moe_top_k=2, moe_every_n_layers=2, moe_impl="dropless",
)
be = BiEncoder(config=cfg, pooling="mean", dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
B, S = 64, 64
qi = jnp.asarray(rng.integers(5, 500, size=(B, S)), jnp.int32)
di = jnp.asarray(np.roll(np.asarray(qi), 3, axis=1), jnp.int32)
mask = jnp.ones((B, S), jnp.int32)
params = be.init(jax.random.PRNGKey(0), qi, mask)
tx = make_optimizer(params, 3e-3, weight_decay=0.0, max_grad_norm=1.0)
opt = tx.init(params)


@jax.jit
def step(p, o):
    def loss_fn(p):
        q = be.apply(p, qi, mask)
        d = be.apply(p, di, mask)
        loss, acc = clip_loss(q["embedding"], d["embedding"], logit_scale=lambda x: x * 20.0)
        aux = router_aux_loss(
            q["router_logits"] + d["router_logits"], cfg.num_experts, cfg.moe_top_k,
            attention_mask=mask,
        )
        return loss + 0.001 * aux, (acc, aux)

    (l, (acc, aux)), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
    u, o = tx.update(g, o, p)
    return optax.apply_updates(p, u), o, l, acc, aux


losses = []
for i in range(12):
    params, opt, l, acc, aux = step(params, opt)
    losses.append(float(l))
print(f"MoE contrastive: loss {losses[0]:.4f} -> {losses[-1]:.4f}  acc {float(acc):.3f}  aux {float(aux):.4f}")
assert np.isfinite(losses).all() and losses[-1] < losses[0] * 0.9
print("MOE ON-CHIP OK")

# --- 2. CLIP/LiT image-text trainer ---------------------------------------
from test_image_text import make_vision_checkpoint, make_tar_shards
from test_trainer_e2e import make_checkpoint_dir
from contrastors_tpu.config import Config
from contrastors_tpu.trainers import TRAINER_REGISTRY

text_ckpt = make_checkpoint_dir(tmp)
vis_ckpt = make_vision_checkpoint(tmp)
shards = make_tar_shards(tmp, n_shards=2, per_shard=32)
out = str(tmp / "run")
cfg2 = Config(
    train_args=dict(
        num_epochs=1, num_train_steps=8, learning_rate=2e-3, weight_decay=0.0,
        warmup_steps=2, schedule_type="cosine", max_grad_norm=1.0,
        adam_beta1=0.9, adam_beta2=0.999, log_lr_every=2, log_grads_every=100,
        wandb=False, output_dir=out,
    ),
    data_args=dict(
        image_text_shards=shards, batch_size=16, eval_batch_size=16, seed=0,
        workers=0, shuffle=True, train_num_samples=64, dataset_resampled=False,
    ),
    model_args=dict(model_type="locked_text"),
    text_model_args=dict(
        model_type="locked_text", model_name=text_ckpt, pooling="mean",
        logit_scale=50, trainable_logit_scale=True, pretrained=True,
        attn_impl="sdpa", freeze=True, seq_len=16,
    ),
    vision_model_args=dict(
        model_type="locked_text", model_name=vis_ckpt, pooling="map",
        pretrained=True, attn_impl="sdpa",
    ),
    transforms=dict(image_size=32),
)
trainer = TRAINER_REGISTRY["locked_text"](cfg2, "bf16")
trainer.train()
import json, os

with open(os.path.join(out, "metrics.jsonl")) as f:
    metrics = [json.loads(x) for x in f]
ll = [m["loss"] for m in metrics if "loss" in m]
print(f"LiT image-text: loss {ll[0]:.4f} -> {ll[-1]:.4f} over {len(ll)} logs")
assert np.isfinite(ll).all() and ll[-1] < ll[0]
print("CLIP/LIT ON-CHIP OK")

# --- 3. Long-context chain: export -> load -> DynamicNTK -> flash@4096 ----
from contrastors_tpu.models.model_config import TrunkConfig as _TC
from contrastors_tpu.models.nomic_bert import NomicBertModel as _NBM
from contrastors_tpu.export import export_bert_trunk

lc_cfg = _TC(
    n_embd=128, n_layer=2, n_head=2, n_inner=256, vocab_size=1024, pad_token_id=0,
    n_positions=0, rotary_emb_fraction=1.0, rotary_emb_base=10_000,
    activation_function="swiglu", max_trained_positions=512, attn_impl="flash",
)
lc_trunk = _NBM(config=lc_cfg, add_pooling_layer=False)
lc_params = lc_trunk.init(
    jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
)
lc_dir = str(tmp / "hf_lc")
export_bert_trunk(lc_params, lc_cfg, lc_dir)
words = [f"word{i}" for i in range(900)]
(tmp / "hf_lc" / "vocab.txt").write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words))
from transformers import BertTokenizerFast

BertTokenizerFast(vocab_file=str(tmp / "hf_lc" / "vocab.txt")).save_pretrained(lc_dir)

from contrastors_tpu.eval.eval_long_context import build_long_context_encoder

enc = build_long_context_encoder(lc_dir, seq_len=4096, batch_size=2)
docs = [" ".join(f"word{i % 800}" for i in range(3000)), "word1 word2 word3"]
embs = np.asarray(enc.encode(docs, prefix="search_document"))
assert np.isfinite(embs).all() and np.allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-2)
print("LONG-CONTEXT NTK CHAIN OK (export -> load -> NTK@4096 -> flash)")

# --- 4. Remaining trainer families: mmlm / glue / distill ------------------
# (mlm runs in bench.py; encoder via the train CLI; clip/locked_text above)
import json as _json
import os as _os

from test_more_trainers import _train_args, make_tokenized_dataset
from test_trainer_e2e import make_pairs_file, read_metrics
from transformers import AutoTokenizer

from contrastors_tpu.config import Config as _Cfg

tok = AutoTokenizer.from_pretrained(text_ckpt)
ml_root = tmp / "multilingual"
ml_root.mkdir(exist_ok=True)
for lang, n in (("en", 64), ("fr", 32)):
    make_tokenized_dataset(ml_root, tok, n=n, name=lang)
out_mmlm = str(tmp / "run_mmlm")
TRAINER_REGISTRY["mmlm"](_Cfg(
    train_args=_train_args(out_mmlm, num_epochs=3, learning_rate=1e-3),
    data_args=dict(tokenized_dataset=str(ml_root), mlm_prob=0.3, val_mlm_prob=0.15,
                   batch_size=16, seed=0, workers=0, shuffle=True),
    model_args=dict(model_type="mmlm", model_name=text_ckpt, pretrained=True, attn_impl="sdpa"),
), "bf16").train()
ll_mmlm = [m["loss"] for m in read_metrics(out_mmlm) if "loss" in m]
assert np.isfinite(ll_mmlm).all(), ll_mmlm
assert ll_mmlm[-1] < ll_mmlm[0] * 0.9, f"mmlm loss did not decrease: {ll_mmlm}"
print(f"MMLM ON-CHIP OK (loss {ll_mmlm[0]:.3f} -> {ll_mmlm[-1]:.3f})")

from datasets import Dataset, DatasetDict

n = 48
sents = [f"word{i % 20} word{(i * 3) % 20}" for i in range(n)]
labels_g = [int(i % 2) for i in range(n)]
dd = DatasetDict({
    "train": Dataset.from_dict({"sentence": sents, "label": labels_g}),
    "validation": Dataset.from_dict({"sentence": sents[:16], "label": labels_g[:16]}),
})
glue_data = str(tmp / "sst2")
dd.save_to_disk(glue_data)
out_glue = str(tmp / "run_glue")
TRAINER_REGISTRY["glue"](_Cfg(
    train_args=_train_args(out_glue, eval_strategy="steps", eval_steps=3,
                           num_epochs=4, learning_rate=1e-3),
    data_args=dict(tokenized_dataset=glue_data, task_name="sst2",
                   batch_size=16, seed=0, workers=0, shuffle=True),
    model_args=dict(model_type="glue", model_name=text_ckpt, pretrained=True,
                    seq_len=16, attn_impl="sdpa"),
), "bf16").train()
glue_metrics = read_metrics(out_glue)
assert any("glue_sst2/accuracy" in m for m in glue_metrics)
ll_glue = [m["loss"] for m in glue_metrics if "loss" in m]
assert np.isfinite(ll_glue).all(), ll_glue
assert ll_glue[-1] < ll_glue[0] * 0.9, f"glue loss did not decrease: {ll_glue}"
print(f"GLUE ON-CHIP OK (loss {ll_glue[0]:.3f} -> {ll_glue[-1]:.3f})")

pairs = make_pairs_file(tmp, n=32)
out_d = str(tmp / "run_distill")
TRAINER_REGISTRY["distill"](_Cfg(
    train_args=_train_args(out_d, distill_loss_fn="towers", distill_temperature=0.05,
                           num_epochs=3, learning_rate=1e-3),
    data_args=dict(input_shards=pairs, batch_size=8, seed=0, workers=0, shuffle=True,
                   streaming=False, query_max_length=16, document_max_length=16),
    model_args=dict(model_type="distill", model_name=text_ckpt, pooling="mean",
                    pretrained=False, distill_init_pretrained=True, attn_impl="sdpa",
                    logit_scale=50),
    tower_model_args=dict(model_type="distill", model_name=text_ckpt, pooling="mean",
                          pretrained=True, attn_impl="sdpa"),
), "bf16").train()
ll_d = [m["loss"] for m in read_metrics(out_d) if "loss" in m]
assert np.isfinite(ll_d).all(), ll_d
assert ll_d[-1] < ll_d[0] * 0.9, f"distill loss did not decrease: {ll_d}"
print(f"DISTILL ON-CHIP OK (loss {ll_d[0]:.3f} -> {ll_d[-1]:.3f})")
print("ALL TRAINER FAMILIES DRIVEN ON CHIP")
