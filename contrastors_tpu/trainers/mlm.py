"""MLM pretraining trainer (model_type: mlm).

TPU counterpart of the reference MLMTrainer (reference: trainers/mlm.py:20-154):
NomicBertForPreTraining over a pre-tokenized dataset with dynamic masking,
val-loss -> perplexity eval. Masking runs host-side in numpy (the HF
DataCollatorForLanguageModeling recipe: 80% [MASK] / 10% random / 10% keep).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contrastors_tpu.models.auto import _load_hf_config, _load_state_dict
from contrastors_tpu.models.hf_interop import (
    bert_config_to_trunk_config,
    bert_state_dict_to_flax,
)
from contrastors_tpu.models.nomic_bert import NomicBertForPreTraining
from contrastors_tpu.trainers.base import BaseTrainer


def mlm_mask(
    input_ids: np.ndarray,
    mlm_prob: float,
    mask_token_id: int,
    vocab_size: int,
    special_ids,
    rng: np.random.Generator,
):
    labels = input_ids.copy()
    prob = np.full(input_ids.shape, mlm_prob)
    special = np.isin(input_ids, list(special_ids))
    prob[special] = 0.0
    masked = rng.random(input_ids.shape) < prob
    labels[~masked] = -100
    out = input_ids.copy()
    replace = masked & (rng.random(input_ids.shape) < 0.8)
    out[replace] = mask_token_id
    randomize = masked & ~replace & (rng.random(input_ids.shape) < 0.5)
    out[randomize] = rng.integers(0, vocab_size, size=int(randomize.sum()))
    return out, labels


def masked_positions_static(labels: np.ndarray, k: int):
    """dense_seq_output collation: per-row indices of the masked positions
    ([B, S] labels -> [B, k] positions + [B, k] labels), padded/truncated
    to a STATIC per-row k (XLA static shapes; the reference gathers a
    dynamic count, modeling_nomic_bert.py:649-653). Filler slots point at
    position 0 with label -100 (zero loss weight). Per-row indexing keeps
    the gather inside each batch row, so multi-process global-batch
    assembly and "data"-axis sharding need no index offsetting."""
    B = labels.shape[0]
    out_pos = np.zeros((B, k), np.int32)
    out_lab = np.full((B, k), -100, np.int32)
    for b in range(B):
        pos = np.flatnonzero(labels[b] >= 0)
        if len(pos) > k:  # 4-sigma budget: ~never; drop the tail if it happens
            pos = pos[:k]
        out_pos[b, : len(pos)] = pos
        out_lab[b, : len(pos)] = labels[b, pos]
    return out_pos, out_lab


def dense_budget(seq_len: int, prob: float) -> int:
    """Static per-row masked-position budget: mean + 4 sigma, rounded up
    to a lane multiple."""
    mean = seq_len * prob
    sigma = (seq_len * prob * (1 - prob)) ** 0.5
    return max(128, int(-(-(mean + 4 * sigma) // 128) * 128))


class MLMTrainer(BaseTrainer):
    def get_model(self):
        margs = self.config.model_args
        hf_cfg = _load_hf_config(margs.model_name)

        class _NS:
            def __init__(self, d):
                self.__dict__.update(d)

        overrides = dict(attn_impl=margs.attn_impl, tie_word_embeddings=True)
        if margs.rotary_emb_fraction:
            overrides.update(
                rotary_emb_fraction=margs.rotary_emb_fraction,
                rotary_emb_base=margs.rotary_emb_base,
                n_positions=0,
            )
        if margs.pad_vocab_to_multiple_of:
            overrides["pad_vocab_size_multiple"] = margs.pad_vocab_to_multiple_of
        if margs.activation_function:
            overrides["activation_function"] = margs.activation_function
        overrides.update(
            qkv_proj_bias=margs.qkv_proj_bias,
            mlp_fc1_bias=margs.mlp_fc1_bias,
            mlp_fc2_bias=margs.mlp_fc2_bias,
        )
        cfg = bert_config_to_trunk_config(_NS(hf_cfg), **overrides)
        self.trunk_config = cfg
        module = NomicBertForPreTraining(
            config=cfg, dtype=self.dtype, remat=margs.gradient_checkpointing
        )
        dummy = (jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
        self.rng, init_rng = jax.random.split(self.rng)
        params = module.init(init_rng, *dummy)
        if margs.pretrained:
            sd = _load_state_dict(margs.model_name)
            if sd is not None:
                remapped = bert_state_dict_to_flax(sd, cfg, head="pretraining")
                params = _overlay(params, remapped["params"])
        return module, params

    def get_dataloaders(self):
        dargs = self.config.data_args
        from datasets import load_from_disk

        ds = load_from_disk(dargs.tokenized_dataset)
        if hasattr(ds, "keys") and "train" in ds:
            self._val = ds.get("validation") or ds.get("test")
            ds = ds["train"]
        else:
            self._val = None
        self._train_ds = ds
        batch = dargs.batch_size
        steps = len(ds) // batch
        import jax

        rank, world = self.process_index, jax.process_count()
        rank_batch = batch // world
        # the permutation rng is shared across processes (same seed ->
        # disjoint rank windows of one global order); masking draws fold in
        # the rank so patterns decorrelate across hosts
        rng = np.random.default_rng(dargs.seed)
        mask_rng = np.random.default_rng((dargs.seed, rank))
        tok = self.tokenizer
        special = set(tok.all_special_ids)
        mlm_prob = dargs.mlm_prob

        def iterate():
            # evaluated lazily: get_dataloaders runs before get_model sets
            # trunk_config, but iteration starts after init completes
            dense = getattr(getattr(self, "trunk_config", None), "dense_seq_output", False)
            order = rng.permutation(len(ds))
            for b in range(steps):
                # this rank's window of the global batch (multi-host:
                # shard_batch assembles the disjoint windows into the
                # global array; reference mlm.py uses DistributedSampler)
                lo = b * batch + rank * rank_batch
                idx = order[lo : lo + rank_batch]
                rows = ds[idx.tolist()]
                ids = np.asarray(rows["input_ids"], dtype=np.int32)
                masked, labels = mlm_mask(
                    ids, mlm_prob, tok.mask_token_id, len(tok), special, mask_rng
                )
                out = {
                    "input_ids": masked,
                    "attention_mask": np.asarray(
                        rows.get("attention_mask", np.ones_like(ids)), dtype=np.int32
                    ),
                    "labels": labels.astype(np.int32),
                }
                if dense:
                    k = dense_budget(ids.shape[1], mlm_prob)
                    pos, lab = masked_positions_static(labels, k)
                    out["masked_positions"] = pos
                    out["labels"] = lab
                yield out

        class _Loader:
            def __iter__(self):
                return iterate()

        return _Loader(), steps

    def make_train_step(self):
        def loss_fn(params, batch, rng):
            out = self.model.apply(
                params,
                batch["input_ids"],
                attention_mask=batch["attention_mask"],
                labels=batch["labels"],
                masked_positions=batch.get("masked_positions"),
                deterministic=False,
                rngs={"dropout": rng},
            )
            return out["loss"], {}

        return self.make_standard_train_step(loss_fn)

    def eval_loop(self, step: int):
        if self._val is None:
            return {}
        dargs = self.config.data_args
        batch = dargs.eval_batch_size or dargs.batch_size
        rng = np.random.default_rng(0)
        tok = self.tokenizer
        special = set(tok.all_special_ids)
        losses = []

        dense = getattr(self.trunk_config, "dense_seq_output", False)

        if not hasattr(self, "_eval_step_fn"):
            # compile once per trainer — a fresh jit per eval_loop call
            # would retrace at every eval cadence
            @jax.jit
            def eval_step(params, b):
                out = self.model.apply(
                    params,
                    b["input_ids"],
                    attention_mask=b["attention_mask"],
                    labels=b["labels"],
                    masked_positions=b.get("masked_positions"),
                    deterministic=True,
                )
                return out["loss"]

            self._eval_step_fn = eval_step
        eval_step = self._eval_step_fn

        n = min(len(self._val) // batch, 50)
        for i in range(n):
            rows = self._val[list(range(i * batch, (i + 1) * batch))]
            ids = np.asarray(rows["input_ids"], dtype=np.int32)
            val_prob = dargs.val_mlm_prob or dargs.mlm_prob
            masked, labels = mlm_mask(
                ids, val_prob, tok.mask_token_id, len(tok), special, rng
            )
            b = {
                "input_ids": jnp.asarray(masked),
                "attention_mask": jnp.asarray(rows.get("attention_mask", np.ones_like(ids)), dtype=jnp.int32),
                "labels": jnp.asarray(labels),
            }
            if dense:
                pos, lab = masked_positions_static(labels, dense_budget(ids.shape[1], val_prob))
                b["masked_positions"] = jnp.asarray(pos)
                b["labels"] = jnp.asarray(lab)
            losses.append(float(eval_step(self.params, b)))
        loss = float(np.mean(losses))
        return {"val_loss": loss, "val_perplexity": float(np.exp(loss))}


def _overlay(init_params, loaded):
    import jax.numpy as jnp

    init = dict(init_params)

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    rec(dst[k], v)
            elif k in dst:
                dst[k] = jnp.asarray(v, dtype=dst[k].dtype)

    rec(init["params"], loaded)
    return init
