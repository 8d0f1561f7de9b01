"""GLUE finetuning trainer (model_type: glue).

TPU counterpart of the reference GlueTrainer (reference:
trainers/glue.py:13-250): NomicBertForSequenceClassification from a
checkpoint, per-task key/label/problem-type maps, metric computation.
Metrics (accuracy / F1 / Matthews / Pearson-Spearman) are implemented in
numpy so runs don't need the `evaluate` hub. Data comes from a local
HF-datasets directory (data_args.task_name points at it) with the standard
GLUE column names.
"""

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contrastors_tpu.models.auto import _load_hf_config, _load_state_dict
from contrastors_tpu.models.hf_interop import bert_config_to_trunk_config, bert_state_dict_to_flax
from contrastors_tpu.models.nomic_bert import NomicBertForSequenceClassification
from contrastors_tpu.trainers.base import BaseTrainer

# task -> (sentence keys, num_labels, problem_type) (reference glue.py:13-46)
GLUE_TASKS: Dict[str, Tuple[Tuple[str, ...], int, str]] = {
    "cola": (("sentence",), 2, "single_label_classification"),
    "sst2": (("sentence",), 2, "single_label_classification"),
    "mrpc": (("sentence1", "sentence2"), 2, "single_label_classification"),
    "stsb": (("sentence1", "sentence2"), 1, "regression"),
    "qqp": (("question1", "question2"), 2, "single_label_classification"),
    "mnli": (("premise", "hypothesis"), 3, "single_label_classification"),
    "qnli": (("question", "sentence"), 2, "single_label_classification"),
    "rte": (("sentence1", "sentence2"), 2, "single_label_classification"),
    "wnli": (("sentence1", "sentence2"), 2, "single_label_classification"),
}


def matthews_corrcoef(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    tp = float(((y_pred == 1) & (y_true == 1)).sum())
    tn = float(((y_pred == 0) & (y_true == 0)).sum())
    fp = float(((y_pred == 1) & (y_true == 0)).sum())
    fn = float(((y_pred == 0) & (y_true == 1)).sum())
    denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return (tp * tn - fp * fn) / denom if denom > 0 else 0.0


def f1_score(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    tp = float(((y_pred == 1) & (y_true == 1)).sum())
    fp = float(((y_pred == 1) & (y_true == 0)).sum())
    fn = float(((y_pred == 0) & (y_true == 1)).sum())
    return 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) > 0 else 0.0


def pearson(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    a = a - a.mean()
    b = b - b.mean()
    d = np.sqrt((a**2).sum() * (b**2).sum())
    return float((a * b).sum() / d) if d > 0 else 0.0


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    return pearson(ra, rb)


def glue_metrics(task: str, preds: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    if task == "cola":
        return {"matthews_correlation": matthews_corrcoef(labels, preds)}
    if task == "stsb":
        return {"pearson": pearson(labels, preds), "spearmanr": spearman(labels, preds)}
    out = {"accuracy": float((preds == labels).mean())}
    if task in ("mrpc", "qqp"):
        out["f1"] = f1_score(labels, preds)
    return out


class GlueTrainer(BaseTrainer):
    def get_model(self):
        margs = self.config.model_args
        task = self.config.data_args.task_name
        keys, num_labels, problem = GLUE_TASKS[task]
        self._task, self._keys = task, keys

        hf_cfg = _load_hf_config(margs.model_name)

        class _NS:
            def __init__(self, d):
                self.__dict__.update(d)

        cfg = bert_config_to_trunk_config(
            _NS(hf_cfg),
            attn_impl=margs.attn_impl,
            num_labels=num_labels,
            problem_type=problem,
        )
        self.trunk_config = cfg
        module = NomicBertForSequenceClassification(config=cfg, dtype=self.dtype)
        dummy = (jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
        self.rng, init_rng = jax.random.split(self.rng)
        params = module.init(init_rng, *dummy)
        if margs.pretrained:
            sd = _load_state_dict(margs.checkpoint or margs.model_name)
            if sd is not None:
                remapped = bert_state_dict_to_flax(sd, cfg, head="classification", add_pooling_layer=True)
                from contrastors_tpu.trainers.mlm import _overlay

                params = _overlay(params, remapped["params"])
        return module, params

    def get_dataloaders(self):
        dargs = self.config.data_args
        from datasets import load_from_disk

        ds = load_from_disk(dargs.tokenized_dataset)
        self._val = None
        self._val_splits = []  # [(metric suffix, split)] — MNLI has two
        if hasattr(ds, "keys"):
            for split in ("validation", "validation_matched", "test"):
                if split in ds:
                    self._val = ds[split]
                    self._val_splits.append(("", ds[split]))
                    break
            if "validation_mismatched" in ds:
                # MNLI reports matched AND mismatched (reference glue.py:175-231)
                self._val_splits.append(("_mm", ds["validation_mismatched"]))
            ds = ds["train"]
        self._train_ds = ds
        batch = dargs.batch_size
        steps = len(ds) // batch
        rng = np.random.default_rng(dargs.seed)
        seq_len = self.config.model_args.seq_len or 128

        def encode(rows):
            texts = list(rows[self._keys[0]])
            pair = list(rows[self._keys[1]]) if len(self._keys) > 1 else None
            enc = self.tokenizer(
                texts, pair, padding="max_length", truncation=True,
                max_length=seq_len, return_tensors="np",
            )
            labels = np.asarray(rows["label"])
            if self._task == "stsb":
                labels = labels.astype(np.float32)
            else:
                labels = labels.astype(np.int32)
            return {
                "input_ids": enc["input_ids"].astype(np.int32),
                "attention_mask": enc["attention_mask"].astype(np.int32),
                "token_type_ids": enc.get("token_type_ids", np.zeros_like(enc["input_ids"])).astype(np.int32),
                "labels": labels,
            }

        self._encode = encode

        import jax

        rank, world = self.process_index, jax.process_count()
        rank_batch = batch // world

        def iterate():
            # shared permutation, disjoint per-rank windows (multi-host:
            # shard_batch reassembles the global batch)
            order = rng.permutation(len(ds))
            for b in range(steps):
                lo = b * batch + rank * rank_batch
                idx = order[lo : lo + rank_batch]
                yield encode(ds[idx.tolist()])

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
                token_type_ids=batch["token_type_ids"],
                labels=batch["labels"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            return out["loss"], {}

        return self.make_standard_train_step(loss_fn)

    def eval_loop(self, step: int):
        if self._val is None:
            return {}
        batch = self.config.data_args.eval_batch_size or self.config.data_args.batch_size

        if not hasattr(self, "_eval_logits_fn"):
            # compile once per trainer — a fresh jit per eval_loop call
            # would retrace at every eval cadence
            @jax.jit
            def logits_fn(params, b):
                return self.model.apply(
                    params,
                    b["input_ids"],
                    attention_mask=b["attention_mask"],
                    token_type_ids=b["token_type_ids"],
                    deterministic=True,
                )["logits"]

            self._eval_logits_fn = logits_fn
        logits_fn = self._eval_logits_fn

        def eval_split(split):
            """Every example exactly once: the trailing partial batch is
            padded to the jit shape and its extra rows dropped from the
            metric (the reference dedups the last batch across ranks,
            glue.py:175-231; round 1 silently skipped it)."""
            preds, labels = [], []
            n = len(split)
            for start in range(0, n, batch):
                idx = list(range(start, min(start + batch, n)))
                real = len(idx)
                if real < batch:  # pad to the compiled batch shape
                    idx = idx + [idx[-1]] * (batch - real)
                b = self._encode(split[idx])
                lg = np.asarray(
                    logits_fn(self.params, {k: jnp.asarray(v) for k, v in b.items() if k != "labels"})
                )[:real]
                preds.append(lg.squeeze(-1) if self._task == "stsb" else lg.argmax(-1))
                labels.append(b["labels"][:real])
            return glue_metrics(self._task, np.concatenate(preds), np.concatenate(labels))

        out = {}
        for suffix, split in self._val_splits:
            for k, v in eval_split(split).items():
                out[f"glue_{self._task}{suffix}/{k}"] = v
        return out
