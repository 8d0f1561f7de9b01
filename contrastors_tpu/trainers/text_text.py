"""Contrastive text trainer (model_type: encoder).

TPU counterpart of the reference TextTextTrainer
(reference: trainers/text_text.py:24-471): BiEncoder + LogitScale, streaming
or local pair data, per-dataset InfoNCE with gathered documents, optional
matryoshka multi-dim loss, MoE router aux loss, GradCache path, logit clamp.

Execution style is pjit/global: the train step is jitted over the mesh with
the batch sharded on "data"; the q @ D.T similarity runs on global arrays so
XLA inserts the all-gather (SURVEY.md §2.10).
"""

import glob
import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from contrastors_tpu.grad_cache import grad_cache_loss_and_grads
from contrastors_tpu.losses import clip_loss, matryoshka_clip_loss, router_aux_loss
from contrastors_tpu.models.auto import load_biencoder
from contrastors_tpu.models.biencoder import LogitScale
from contrastors_tpu.data import LocalJsonlDataset, StreamingShardDataset
from contrastors_tpu.trainers.base import BaseTrainer


class TextTextTrainer(BaseTrainer):
    def _uses_grad_accumulation(self) -> bool:
        # the grad-cache step updates every loop step (chunking replaces
        # accumulation); the plain path uses the standard stepper
        return not self.config.train_args.grad_cache

    def get_model(self):
        margs = self.config.model_args
        self.rng, init_rng = jax.random.split(self.rng)
        module, params, trunk_cfg = load_biencoder(margs, dtype=self.dtype, rng=init_rng)
        self.biencoder = module
        self.trunk_config = trunk_cfg

        scale = LogitScale(
            logit_scale_init=margs.logit_scale, trainable=margs.trainable_logit_scale
        )
        scale_params = scale.init(jax.random.PRNGKey(0), jnp.ones(()))
        self.logit_scale = scale
        return module, {"model": params, "logit_scale": scale_params}

    def frozen_mask(self):
        margs = self.config.model_args
        mask = jax.tree_util.tree_map(lambda _: True, self.params)
        if margs.freeze:
            mask["model"] = jax.tree_util.tree_map(lambda _: False, self.params["model"])
        if not margs.trainable_logit_scale:
            mask["logit_scale"] = jax.tree_util.tree_map(
                lambda _: False, self.params["logit_scale"]
            )
        return mask

    def get_dataloaders(self):
        dargs = self.config.data_args
        margs = self.config.model_args
        common = dict(
            tokenizer=self.tokenizer,
            seed=dargs.seed,
            add_eos=self.tokenizer.eos_token is not None,
            add_prefix=margs.add_prefix,
            num_negatives=margs.num_negatives,
            sample_negatives=dargs.sample_negatives,
            query_max_length=dargs.query_max_length,
            document_max_length=dargs.document_max_length,
        )
        if dargs.streaming and dargs.input_shards.endswith(".yaml"):
            ds = StreamingShardDataset(
                dargs.input_shards,
                global_batch_size=dargs.batch_size,
                weighted_sampling=dargs.weighted_sampling,
                state_dir=os.path.join(self.config.train_args.output_dir or ".", "data_state"),
                run_name=self.config.train_args.wandb_run_name,
                verbose=dargs.verbose,
                **common,
            )
            steps = len(ds) // dargs.batch_size
        else:
            files = sorted(glob.glob(dargs.input_shards)) if any(
                ch in dargs.input_shards for ch in "*?["
            ) else [dargs.input_shards]
            ds = LocalJsonlDataset(
                files,
                global_batch_size=dargs.batch_size,
                objective={"type": "paired", "columns": ["query", "document"]},
                shuffle=dargs.shuffle,
                **common,
            )
            steps = ds.num_batches()
        return ds, steps

    # -- sequence packing (TPU-only capability, data/packing.py) --------------
    def _pack_geometry(self, col: str):
        dargs = self.config.data_args
        K = dargs.packed_max_segments
        max_len = (
            dargs.query_max_length if col == "query" else dargs.document_max_length
        ) or dargs.seq_len or 256
        # default row length: half the padded token budget of K sequences —
        # right-sized when real lengths average <= max_len / 2
        L = dargs.packed_seq_len or max(128, (K * max_len) // 2)
        return L, K

    def transform_host_batch(self, host_batch):
        dargs = self.config.data_args
        if not getattr(dargs, "packed", False):
            return host_batch
        if getattr(dargs, "packed_auto", False) and not getattr(self, "_packed_decided", False):
            # one-shot decision on the first batch, before the train step is
            # built (base.train defers make_train_step for this). Two parts:
            #   gain — geometry-only token-budget ratio (packing wins only
            #     when removed padding outweighs segment bookkeeping: 7.5x
            #     at the 2048-token pretrain geometry, 0.68x at short docs);
            #   kept — CONTENT-dependent dry pack of this batch: a geometry
            #     too tight for the real lengths silently truncates tokens,
            #     which is worse than training slow.
            self._packed_decided = True
            import numpy as np

            from contrastors_tpu.data.packing import (
                packing_efficiency,
                packing_kept_fraction,
            )

            gains, weights, kept_min = [], [], 1.0
            for col in ("query", "document"):
                mask = host_batch.get(f"{col}_attention_mask")
                if mask is None:
                    continue
                mask = np.asarray(mask)
                L, K = self._pack_geometry(col)
                gains.append(packing_efficiency(mask, L, K))
                weights.append(mask.size)
                kept_min = min(
                    kept_min,
                    packing_kept_fraction(
                        np.asarray(host_batch[f"{col}_input_ids"]), mask, L, K,
                        pad_id=self.tokenizer.pad_token_id or 0,
                    ),
                )
            gain = float(np.average(gains, weights=weights)) if gains else 1.0
            if jax.process_count() > 1:
                # per-rank batches differ; every process must reach the SAME
                # decision or the compiled step shapes diverge (deadlock)
                from contrastors_tpu.utils.dist import process_allmean, process_allmin

                gain = float(process_allmean({"gain": gain})["gain"])
                # kept is a safety gate: one truncating rank must disable
                # packing everywhere — min, not mean
                kept_min = float(process_allmin({"kept": kept_min})["kept"])
            if gain < dargs.packed_auto_threshold or kept_min < 0.99:
                dargs.packed = False
                print(
                    f"[packing] auto-disabled: predicted gain {gain:.2f}x "
                    f"(threshold {dargs.packed_auto_threshold:.2f}x), dry-pack "
                    f"kept {kept_min:.3f} of real tokens", flush=True,
                )
                return host_batch
            print(
                f"[packing] auto-kept: predicted gain {gain:.2f}x, "
                f"dry-pack kept {kept_min:.3f}", flush=True,
            )
        from contrastors_tpu.data.packing import pack_tokenized

        groups = self._packed_gc_groups()
        out = dict(host_batch)
        for col in ("query", "document"):
            ids = out.pop(f"{col}_input_ids", None)
            mask = out.pop(f"{col}_attention_mask", None)
            if ids is None:
                continue
            L, K = self._pack_geometry(col)
            pad_id = self.tokenizer.pad_token_id or 0
            if groups > 1:
                # sharded grad-cache mode: pack each data-axis device's
                # pairs into its OWN row group so rows AND pair indices
                # shard contiguously over "data" and stay device-LOCAL —
                # inside shard_map each device's chunk loop sees only its
                # rows and gathers pairs from its own slot matrix (the loss
                # all-gathers embeddings only; grad_cache_data_axis)
                B = ids.shape[0]
                if B % groups:
                    raise ValueError(
                        f"packed grad-cache sharding needs per-host batch "
                        f"{B} divisible by local data-axis devices {groups}"
                    )
                Bg = B // groups
                parts = [
                    pack_tokenized(
                        ids[g * Bg : (g + 1) * Bg], mask[g * Bg : (g + 1) * Bg],
                        row_len=L, max_segments=K, pad_id=pad_id,
                    )
                    for g in range(groups)
                ]
                import numpy as np

                packed = {
                    k: np.concatenate([p[k] for p in parts], axis=0)
                    for k in parts[0]
                }
            else:
                packed = pack_tokenized(ids, mask, row_len=L, max_segments=K, pad_id=pad_id)
                # multi-host pjit-global mode: pair_index is built against
                # this process's rows, but shard_batch assembles a GLOBAL
                # slot matrix — offset into this rank's slice (rows stack in
                # process order); last_token_index addresses the flat
                # [rows * row_len] token grid, so it offsets by row_len
                rows = packed["input_ids"].shape[0]
                packed["pair_index"] = packed["pair_index"] + jax.process_index() * rows * K
                packed["last_token_index"] = (
                    packed["last_token_index"] + jax.process_index() * rows * L
                )
            for k, v in packed.items():
                out[f"{col}_{k}"] = v
        return out

    def _packed_gc_groups(self) -> int:
        """Per-host packing groups: one per local data-axis device when the
        packed grad-cache step runs sharded (shard_map over "data"), else 1
        (one global pool, pjit-global indices)."""
        if not self.config.train_args.grad_cache:
            return 1
        from contrastors_tpu.grad_cache import grad_cache_data_axis

        if grad_cache_data_axis(self.mesh) is None:
            return 1
        return self.mesh.shape["data"] // jax.process_count()

    def _encode_packed(self, model_params, batch, col, rng):
        _, K = self._pack_geometry(col)
        rngs = {"dropout": rng} if rng is not None else None
        return self.biencoder.apply(
            model_params,
            input_ids=batch[f"{col}_input_ids"],
            segment_ids=batch[f"{col}_segment_ids"],
            position_ids=batch[f"{col}_position_ids"],
            pair_index=batch[f"{col}_pair_index"],
            last_token_index=batch[f"{col}_last_token_index"],
            max_segments=K,
            deterministic=rng is None,
            rngs=rngs,
        )

    # -- loss pieces ----------------------------------------------------------
    def _scale_fn(self, scale_params):
        return lambda x: self.logit_scale.apply(scale_params, x)

    def _encode(self, model_params, input_ids, attention_mask, rng, deterministic=False):
        rngs = {"dropout": rng} if rng is not None else None
        return self.biencoder.apply(
            model_params,
            input_ids=input_ids,
            attention_mask=attention_mask,
            deterministic=deterministic,
            rngs=rngs,
        )

    def eval_loop(self, step: int):
        """NanoBEIR-style in-train retrieval eval
        (reference trainers/text_text.py:453-471, via a SentenceTransformer
        adapter there; here the Encoder adapter + dense retrieval)."""
        path = getattr(self.config.data_args, "eval_retrieval", None)
        if not path:
            return {}
        import json as _json
        import os as _os

        from contrastors_tpu.eval.encoder import Encoder
        from contrastors_tpu.eval.retrieval import evaluate_retrieval

        corpus, queries, qrels = {}, {}, {}
        with open(_os.path.join(path, "corpus.jsonl")) as f:
            for line in f:
                r = _json.loads(line)
                corpus[str(r["_id"])] = {"title": r.get("title", ""), "text": r["text"]}
        with open(_os.path.join(path, "queries.jsonl")) as f:
            for line in f:
                r = _json.loads(line)
                queries[str(r["_id"])] = r["text"]
        with open(_os.path.join(path, "qrels.tsv")) as f:
            for line in f:
                qid, cid, score = line.strip().split("\t")
                qrels.setdefault(qid, {})[cid] = int(score)

        margs = self.config.model_args
        enc = Encoder(
            self.biencoder,
            self.params["model"],
            self.tokenizer,
            seq_len=self.config.data_args.document_max_length or 256,
            # SPMD corpus encode over the data axis (the reference re-encodes
            # the full corpus per rank through a non-sharded adapter,
            # trainers/text_text.py:453-471); the sharded device_put needs
            # the batch to DIVIDE over the axis, so round up to a multiple
            batch_size=-(
                -(self.config.data_args.eval_batch_size or 64)
                // self.mesh.shape.get("data", 1)
            )
            * self.mesh.shape.get("data", 1),
            mesh=self.mesh,
            query_prefix=(
                margs.query_prefix.rstrip(": ") if margs.add_prefix and margs.query_prefix else None
            ),
            document_prefix=(
                margs.document_prefix.rstrip(": ")
                if margs.add_prefix and margs.document_prefix
                else None
            ),
        )
        res = evaluate_retrieval(enc, corpus, queries, qrels, ks=(10,))
        return {f"retrieval/{k}": v for k, v in res.items()}

    def make_train_step(self):
        ta = self.config.train_args
        margs = self.config.model_args
        matryoshka = ta.matryoshka_dims
        use_moe = margs.num_experts > 0
        aux_coef = ta.router_aux_loss_coef
        logit_max = float(jnp.log(ta.logit_max)) if ta.clamp_logits else None

        def clamp_scale(params):
            if logit_max is None or not margs.trainable_logit_scale:
                return params
            s = params["logit_scale"]["params"]["logit_scale"]
            params = dict(params)
            params["logit_scale"] = {"params": {"logit_scale": jnp.minimum(s, logit_max)}}
            return params

        packed = getattr(self.config.data_args, "packed", False) if self.config.data_args else False

        if packed and ta.grad_cache and (self.config.model_args.pooling or "mean") != "mean":
            # the grad-cache packed design chunks over ROWS and returns the
            # raw slot matrix (pairs gathered at the loss stage) — that
            # only pools per segment, i.e. mean pooling; 'last' would need
            # last_token_index threading through the chunk encoder
            raise ValueError(
                "packed + grad_cache supports pooling='mean' only "
                f"(got {self.config.model_args.pooling!r}); disable one of them"
            )

        if ta.grad_cache:
            chunk = ta.chunk_size or 64
            # hybrid direct mode composes with MoE since round 5: the direct
            # forward runs per-chunk (vmap) when router_aux_coef != 0, so the
            # aux keeps its per-chunk accounting (grad_cache.direct_embed)
            direct_q = getattr(ta, "grad_cache_direct_chunks_q", 0)
            direct_d = getattr(ta, "grad_cache_direct_chunks_d", 0)
            embed_par = getattr(ta, "grad_cache_embed_parallel", 1)

            # Sharding (SURVEY §7 hard part 8): the grad-cache chunk loop is a
            # sequential lax.map whose leading (chunk) dim GSPMD cannot
            # partition — under pjit it all-gathers the token arrays and
            # REPLICATES the whole computation per device (verified by HLO in
            # tests/test_sharded_loss_scale.py). So on a data axis > 1 the
            # step runs inside shard_map: each device chunks its LOCAL rows,
            # only document embeddings cross ICI (all_gather in the loss), the
            # logits matrix stays [local_q, global_d] per device, and param
            # grads arrive globally summed via the replicated-input transpose
            # psum. chunk_size is therefore per-device in both modes. Packed
            # batches shard the same way: the host packs per-device row
            # groups with device-local pair indices (transform_host_batch).
            from contrastors_tpu.grad_cache import grad_cache_data_axis

            ndata = self.mesh.shape.get("data", 1)
            gc_axis = grad_cache_data_axis(self.mesh)

            def encode(model_params, chunk_batch, chunk_rng):
                out = self._encode(
                    model_params,
                    chunk_batch["input_ids"],
                    chunk_batch["attention_mask"],
                    chunk_rng,
                )
                res = {"embedding": out["embedding"]}
                if use_moe and out["router_logits"]:
                    res["router_aux"] = router_aux_loss(
                        out["router_logits"],
                        margs.num_experts,
                        margs.moe_top_k,
                        attention_mask=chunk_batch["attention_mask"],
                    )
                return res

            def make_packed_encode(K):
                # chunks are packed ROWS; embeddings are the [rows*K, D]
                # slot matrix — pairs are gathered at the loss stage
                def packed_encode(model_params, chunk_batch, chunk_rng):
                    rngs = {"dropout": chunk_rng} if chunk_rng is not None else None
                    out = self.biencoder.apply(
                        model_params,
                        input_ids=chunk_batch["input_ids"],
                        segment_ids=chunk_batch["segment_ids"],
                        position_ids=chunk_batch["position_ids"],
                        max_segments=K,
                        deterministic=False,
                        rngs=rngs,
                    )
                    res = {"embedding": out["embedding"]}
                    if use_moe and out["router_logits"]:
                        res["router_aux"] = router_aux_loss(
                            out["router_logits"],
                            margs.num_experts,
                            margs.moe_top_k,
                            attention_mask=(chunk_batch["segment_ids"] > 0).astype(jnp.int32),
                        )
                    return res

                return packed_encode

            def loss_fn(q, d, scale_params):
                loss, acc = clip_loss(
                    q, d, self._scale_fn(scale_params),
                    axis_name=gc_axis,
                    bidirectional=ta.loss_fn == "clip_bidirectional",
                )
                if gc_axis is not None:
                    # local mean scaled so the device-sum (what the
                    # replicated-param transpose psum produces for the grads)
                    # equals the global-batch mean objective
                    loss = loss / ndata
                return loss, {"accuracy": acc}

            def _reduce(loss, gc_metrics):
                if gc_axis is not None:
                    loss = jax.lax.psum(loss, gc_axis)
                    gc_metrics = {
                        "accuracy": jax.lax.pmean(gc_metrics["accuracy"], gc_axis),
                        "router_aux": jax.lax.psum(gc_metrics["router_aux"], gc_axis),
                    }
                return loss, gc_metrics

            if packed:
                _, Kq = self._pack_geometry("query")
                _, Kd = self._pack_geometry("document")

                def gc_compute(params, qb, db, rng):
                    # chunks are packed ROWS, per-device under shard_map
                    # (each device's rows were packed from its own pairs, so
                    # pair_index gathers from the LOCAL slot matrix; under
                    # pjit the indices are global — transform_host_batch)
                    if gc_axis is not None:
                        rng = jax.random.fold_in(rng, jax.lax.axis_index(gc_axis))
                    from contrastors_tpu.parallel import divisor_chunk

                    qb, db = dict(qb), dict(db)
                    q_idx = qb.pop("pair_index")
                    d_idx = db.pop("pair_index")
                    cq = divisor_chunk(max(1, chunk // Kq), qb["input_ids"].shape[0])
                    cd = divisor_chunk(max(1, chunk // Kd), db["input_ids"].shape[0])

                    def packed_loss(q_slots, d_slots, scale_params):
                        return loss_fn(q_slots[q_idx], d_slots[d_idx], scale_params)

                    loss, grads_model, grads_scale, gc_metrics = grad_cache_loss_and_grads(
                        params["model"], qb, db,
                        make_packed_encode(Kq), make_packed_encode(Kd),
                        packed_loss, chunk_size=cq, chunk_size_d=cd, rng=rng,
                        router_aux_coef=aux_coef if use_moe else 0.0,
                        extra_params=params["logit_scale"],
                        direct_chunks=direct_q, direct_chunks_d=direct_d,
                        embed_parallel=embed_par,
                        return_metrics=True, loss_has_aux=True,
                    )
                    loss, gc_metrics = _reduce(loss, gc_metrics)
                    return loss, {"model": grads_model, "logit_scale": grads_scale}, gc_metrics

            else:

                def gc_compute(params, qb, db, rng):
                    if gc_axis is not None:
                        rng = jax.random.fold_in(rng, jax.lax.axis_index(gc_axis))
                    # chunk is per-device; clamp to a divisor of the local rows
                    # (execution-only — grads are exact for any chunk size)
                    from contrastors_tpu.parallel import divisor_chunk

                    cq = divisor_chunk(chunk, qb["input_ids"].shape[0])
                    cd = divisor_chunk(chunk, db["input_ids"].shape[0])
                    loss, grads_model, grads_scale, gc_metrics = grad_cache_loss_and_grads(
                        params["model"], qb, db, encode, encode, loss_fn,
                        chunk_size=cq, chunk_size_d=cd, rng=rng,
                        router_aux_coef=aux_coef if use_moe else 0.0,
                        extra_params=params["logit_scale"],
                        direct_chunks=direct_q, direct_chunks_d=direct_d,
                        embed_parallel=embed_par,
                        return_metrics=True, loss_has_aux=True,
                    )
                    loss, gc_metrics = _reduce(loss, gc_metrics)
                    return loss, {"model": grads_model, "logit_scale": grads_scale}, gc_metrics

            if gc_axis is not None:
                from contrastors_tpu.grad_cache import shard_map_grad_cache

                gc_fn = shard_map_grad_cache(gc_compute, self.mesh, n_outputs=3)
            else:
                gc_fn = gc_compute

            packed_keys = ("input_ids", "segment_ids", "position_ids", "pair_index")

            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, batch, rng):
                if packed:
                    qb = {k: batch[f"query_{k}"] for k in packed_keys}
                    db = {k: batch[f"document_{k}"] for k in packed_keys}
                else:
                    qb = {"input_ids": batch["query_input_ids"], "attention_mask": batch["query_attention_mask"]}
                    db = {"input_ids": batch["document_input_ids"], "attention_mask": batch["document_attention_mask"]}
                loss, grads, gc_metrics = gc_fn(params, qb, db, rng)
                updates, new_opt = self.tx.update(grads, opt_state, params)
                new_params = clamp_scale(optax.apply_updates(params, updates))
                gnorm = optax.global_norm(grads)
                metrics = {
                    "loss": loss,
                    "grad_norm": gnorm,
                    "accuracy": gc_metrics["accuracy"],
                }
                if use_moe:
                    metrics["router_aux"] = gc_metrics["router_aux"]
                return new_params, new_opt, metrics

            return train_step

        def loss_fn(params, batch, rng):
            rq, rd = jax.random.split(rng)
            if packed:
                q = self._encode_packed(params["model"], batch, "query", rq)
                d = self._encode_packed(params["model"], batch, "document", rd)
            else:
                q = self._encode(params["model"], batch["query_input_ids"], batch["query_attention_mask"], rq)
                d = self._encode(params["model"], batch["document_input_ids"], batch["document_attention_mask"], rd)
            scale_fn = self._scale_fn(params["logit_scale"])
            metrics = {}
            if matryoshka:
                loss, acc = matryoshka_clip_loss(
                    q["embedding"],
                    d["embedding"],
                    scale_fn,
                    dims=matryoshka,
                    weights=ta.matryoshka_loss_weights,
                )
            else:
                loss, acc = clip_loss(q["embedding"], d["embedding"], scale_fn)
            metrics["accuracy"] = acc
            if use_moe:
                # per-tower aux with that tower's validity mask (padding
                # tokens must not enter the load-balance statistics — same
                # formula the grad-cache chunk encoder uses above)
                aux = jnp.zeros(())
                have_aux = False
                for tower, res in (("query", q), ("document", d)):
                    logits = res["router_logits"] or []
                    if not logits:
                        continue
                    if packed:
                        m = (batch[f"{tower}_segment_ids"] > 0).astype(jnp.int32)
                    else:
                        m = batch[f"{tower}_attention_mask"]
                    aux = aux + router_aux_loss(
                        logits, margs.num_experts, margs.moe_top_k, attention_mask=m
                    )
                    have_aux = True
                if have_aux:
                    loss = loss + aux_coef * aux
                    metrics["router_aux"] = aux
            return loss, metrics

        return self.make_standard_train_step(loss_fn, post_update=clamp_scale)
