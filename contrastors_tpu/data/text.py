"""Streaming contrastive-pair data pipeline.

TPU counterpart of the reference StreamingShardDataset
(reference: dataset/text_text_loader.py:31-823). Same on-disk format and
semantics, host-side numpy output:

  * gzip JSONL shards addressed by a data-spec YAML
    ({datasets: [{name, bucket, objective{type, columns}, ...}]});
  * per-bucket counts.json (rows per shard) and offsets.json.gz
    (row -> (start, end) byte ranges) enabling mid-shard seeks;
  * every step draws ONE rank-batch from ONE dataset (homogeneous batches
    by construction — loss is per-dataset, trainers/text_text.py);
  * per-shard quota = floor(count / world / rank_batch) * rank_batch so
    every rank reads disjoint, aligned windows (text_text_loader.py:306-331);
  * exact resume via a processed-counts JSON cursor (load_state/save_state);
  * objectives: paired [query, document], triplet [query, document,
    negatives (sampled or first-k)], self [query]; kd_scores passthrough;
  * "search_query: "/"search_document: "-style prefixes with per-dataset
    overrides, EOS pinning after truncation, per-column max lengths
    (defaults query 32 / document 256, text_text_loader.py:23).

Differences by design: no torch DataLoader — batches are numpy and feed
jax.device_put via utils/prefetch.py's double-buffer; no webdataset dep
(brace expansion implemented here).
"""

import gzip
import io
import json
import os
import random
import re
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
import yaml

MAPPED_NAMES = {"paired": ["query", "document"], "self": ["query"], "triplet": ["query", "document", "negative"]}
KEY2PREFIX = {"query": "query", "document": "passage", "negative": "passage"}
DEFAULT_MAX_TOKENS = {"query": 32, "document": 256, "negative": 256}

_BRACE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def expand_urls(pattern: str) -> List[str]:
    """webdataset-style brace expansion: a-{000..002}.jsonl.gz -> 3 urls."""
    m = _BRACE.search(pattern)
    if not m:
        return [pattern]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(expand_urls(pattern[: m.start()] + str(i).zfill(width) + pattern[m.end():]))
    return out


class ShardReadError(RuntimeError):
    """A shard read failed irrecoverably (truncated gzip, IO error); the
    iterator drops the shard and keeps training (reference log-and-continue
    semantics, text_text_loader.py:532-536)."""


def validate_eos_placement(input_ids: np.ndarray, attention_mask: np.ndarray, eos_id: int):
    """Host-side check that every sequence's final non-pad token is EOS —
    required for LastTokenPooling. The reference raises inside the model
    forward (modeling_biencoder.py:63-76); value-dependent raises can't live
    under jit, so the check runs here in the data pipeline."""
    lengths = attention_mask.sum(axis=1)
    last = input_ids[np.arange(len(input_ids)), np.maximum(lengths - 1, 0)]
    bad = np.flatnonzero((last != eos_id) & (lengths > 0))
    if bad.size:
        raise ValueError(
            f"sequences {bad[:8].tolist()} do not end in EOS ({eos_id}); "
            f"got trailing tokens {last[bad[:8]].tolist()} — check tokenizer/add_eos"
        )


class TokenizeCollator:
    """Prefix + tokenize + EOS-pin one homogeneous rank batch into numpy
    arrays (reference text_text_loader.py:601-660)."""

    def __init__(
        self,
        tokenizer,
        add_eos: bool = True,
        add_prefix: bool = False,
        col_max_length: Optional[Dict[str, int]] = None,
    ):
        self.tokenizer = tokenizer
        if getattr(tokenizer, "padding_side", "right") != "right":
            # the EOS pin, validate_eos_placement, and last-token indexing
            # all compute positions as lengths-1 from the left — left-padded
            # batches would flag every short sequence as malformed
            tokenizer.padding_side = "right"
        self.add_eos = add_eos and tokenizer.eos_token is not None
        self.add_prefix = add_prefix
        self.col_max_length = col_max_length or dict(DEFAULT_MAX_TOKENS)

    def __call__(
        self,
        samples: List[Dict[str, Any]],
        objective_type: str,
        dataset_name: str = "",
        prefixes: Optional[Dict[str, str]] = None,
        query_only: bool = False,
    ) -> Dict[str, Any]:
        out: Dict[str, Any] = {"dataset_name": dataset_name}
        for col in MAPPED_NAMES[objective_type]:
            if col == "negative":
                continue  # negatives are folded into "document" lists
            texts: List[str] = []
            counts = {len(s[col]) for s in samples if isinstance(s[col], list)}
            if len(counts) > 1:
                # ragged docs-per-query misaligns clip_loss's i * mult labels
                # (num_negatives=-1 with heterogenous records); cycle-pad
                # every list to the batch max so the count stays uniform
                m = max(counts)
                if not getattr(self, "_warned_ragged", False):
                    self._warned_ragged = True
                    print(
                        f"[data] ragged negatives per record (counts {sorted(counts)}); "
                        f"cycle-padding to {m} per query — set num_negatives to a "
                        f"fixed value to control this", flush=True,
                    )
                for s in samples:
                    if isinstance(s[col], list) and len(s[col]) < m:
                        v = s[col]  # [positive, neg...]; pad from negatives only
                        if len(v) < 2:
                            raise ValueError(
                                "cannot pad a record with no negatives to the "
                                f"batch's {m} documents per query"
                            )
                        extra = [1 + (j % (len(v) - 1)) for j in range(m - len(v))]
                        s[col] = v + [v[j] for j in extra]
                        if "kd_scores" in s:  # teacher scores track the docs
                            sc = list(s["kd_scores"])
                            s["kd_scores"] = sc + [sc[j] for j in extra]
            for s in samples:
                v = s[col]
                if isinstance(v, list):
                    texts.extend(v)
                else:
                    texts.append(v)
            if self.add_eos:
                texts = [t + self.tokenizer.eos_token for t in texts]
            if self.add_prefix and not (query_only and col != "query"):
                prefix = (prefixes or {}).get(col) or KEY2PREFIX[col]
                texts = [f"{prefix}: {t}" for t in texts]
            enc = self.tokenizer(
                texts,
                padding="max_length",
                truncation=True,
                max_length=self.col_max_length[col],
                return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            if self.add_eos:
                ids[:, -1] = self.tokenizer.eos_token_id
                # truncated rows had their last slot overwritten with EOS;
                # shorter rows got EOS from the appended text — verify both
                validate_eos_placement(ids, mask, self.tokenizer.eos_token_id)
            out[f"{col}_input_ids"] = ids
            out[f"{col}_attention_mask"] = mask
        if "kd_scores" in samples[0]:
            out["kd_scores"] = np.asarray([s["kd_scores"] for s in samples], dtype=np.float32)
        return out


def _extract_pair(record: Dict, objective: Dict, num_negatives: int, sample_negatives: bool, rng: random.Random):
    """Returns (paired, neg_indices): neg_indices are the positions of the
    KEPT negatives within the record's negative list (None when the
    objective has no negatives column) — kd_scores must be gathered with
    the same indices so teacher scores stay aligned with the documents."""
    columns = objective["columns"]
    ctype = objective["type"]
    meta = record.get("metadata", {}).get("objective")
    if meta is not None:
        valid = meta[ctype]
        if columns not in valid:
            raise ValueError(f"columns {columns} invalid for type {ctype}; valid: {valid}")
    paired: Dict[str, Any] = {}
    neg_idx = None
    for mapped, col in zip(MAPPED_NAMES[ctype], columns):
        if mapped == "negative":
            negs = record[col]
            if not negs and num_negatives != 0:
                # num_negatives == 0 legitimately needs none (idx stays []);
                # otherwise:
                # zero negatives cannot be padded without faking a false
                # negative == the positive; the reference dies here too
                # (random.sample with k > population)
                raise ValueError(
                    f"record has no negatives for column {col!r} but the "
                    f"objective requires them"
                )
            idx = list(range(len(negs)))
            if len(negs) > num_negatives >= 0:
                idx = rng.sample(idx, num_negatives) if sample_negatives else idx[:num_negatives]
            elif 0 <= num_negatives and len(idx) < num_negatives:
                # SHORT record: cycle-pad to the uniform count — clip_loss
                # labels assume a constant docs-per-query (labels = i * mult,
                # losses.py), so a ragged batch silently mislabels every
                # query after the short record. Duplicated negatives are
                # harmless (same logit twice); kd_scores stay aligned
                # because neg_idx carries the duplicates.
                idx = [idx[j % len(idx)] for j in range(num_negatives)]
            neg_idx = idx
            paired["document"] = [paired["document"]] + [negs[j] for j in idx]
        else:
            paired[mapped] = record[col]
    return paired, neg_idx


class StreamingShardDataset:
    def __init__(
        self,
        spec_path: str,
        global_batch_size: int,
        tokenizer,
        seed: int = 42,
        add_eos: bool = True,
        add_prefix: bool = False,
        num_negatives: int = -1,
        weighted_sampling: bool = False,
        infinite: bool = False,
        sample_negatives: bool = False,
        query_max_length: Optional[int] = None,
        document_max_length: Optional[int] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        state_dir: Optional[str] = None,
        run_name: Optional[str] = None,
        verbose: bool = False,
    ):
        import fsspec
        import jax

        self.rank = process_index if process_index is not None else jax.process_index()
        self.world_size = process_count if process_count is not None else jax.process_count()
        self.rank_batch_size = global_batch_size // self.world_size
        # self.rng drives SHARD SELECTION only and must consume the same
        # draw sequence on every rank (shard choice has to agree globally);
        # data-dependent draws (negative sampling, corrupt-record refill)
        # consume rank-varying amounts and live on sample_rng instead
        self.rng = random.Random(seed)
        self.sample_rng = random.Random(f"{seed}/{self.rank}/sample")
        self.num_negatives = num_negatives
        self.sample_negatives = sample_negatives
        self.weighted_sampling = weighted_sampling
        self.infinite = infinite
        self.verbose = verbose
        self._fsspec = fsspec

        col_max = dict(DEFAULT_MAX_TOKENS)
        if query_max_length is not None:
            col_max["query"] = query_max_length
        if document_max_length is not None:
            col_max["document"] = document_max_length
            col_max["negative"] = document_max_length
        self.collator = TokenizeCollator(tokenizer, add_eos, add_prefix, col_max)

        self.path2objective: Dict[str, Dict] = {}
        self.path2offsets: Dict[str, Dict] = {}
        self.path2meta: Dict[str, Dict] = {}  # prefixes / kd / query_only / ds name
        self.counts: Dict[str, int] = {}
        self.max_per_shard: Dict[str, int] = {}
        self.total_samples = 0

        self.ds_paths = self._parse_spec(spec_path)
        self.current_paths = list(self.ds_paths)

        state_dir = state_dir or (spec_path.replace(".yaml", "") + "_state")
        os.makedirs(state_dir, exist_ok=True)
        suffix = f"_{run_name}" if run_name else ""
        self.cursor_path = os.path.join(state_dir, f"rank_{self.rank}_processed{suffix}.json")
        self._write_cursor({p: 0 for p in self.ds_paths})

    # -- spec / index ------------------------------------------------------
    def _open_fs(self, url: str):
        if url.startswith("s3://"):
            return self._fsspec.filesystem("s3")
        return self._fsspec.filesystem("file")

    def _parse_spec(self, spec_path: str) -> List[str]:
        with open(spec_path) as f:
            spec = yaml.safe_load(f)
        paths: List[str] = []
        for ds in spec["datasets"]:
            urls = expand_urls(ds["bucket"])
            fs = self._open_fs(urls[0])
            bucket = "/".join(ds["bucket"].split("/")[:-1])
            with fs.open(f"{bucket}/counts.json", "r") as f:
                counts = json.load(f)
            if "count_per_file" in counts:
                counts = counts["count_per_file"]
            # index keys are stored pre-normalized (see data/indexing.py and
            # the reference's counts convention) — only strip the scheme
            counts = {k.replace("s3://", ""): v for k, v in counts.items()}
            # pretokenized token-array shards (scripts/pretokenize_pairs.py)
            # have fixed-size records — row arithmetic replaces offsets
            pretok = bool(ds.get("pretokenized")) or all(
                u.endswith(".tokens") for u in urls
            )
            if pretok:
                offsets = {}
            else:
                with fs.open(f"{bucket}/offsets.json.gz", "rb", compression="gzip") as f:
                    offsets = json.load(f)
                offsets = {k.replace("s3://", ""): v for k, v in offsets.items()}

            name = ds.get("name") or Path(bucket).name
            prefixes = None
            if ds.get("query_prefix"):
                prefixes = {
                    "query": ds["query_prefix"],
                    "document": ds.get("document_prefix", ds["query_prefix"]),
                    "negative": ds.get("document_prefix", ds["query_prefix"]),
                }
            for url in urls:
                # a silently-dropped shard shrinks the corpus with no
                # signal; resolve_shard_key tolerates mount-depth drift and
                # raises loudly on a genuine index mismatch
                from contrastors_tpu.data.indexing import resolve_shard_key

                key = resolve_shard_key(url, counts)
                n = counts[key]
                quota = (n // self.world_size // self.rank_batch_size) * self.rank_batch_size
                if quota == 0:
                    continue
                paths.append(url)
                self.counts[url] = n
                self.max_per_shard[url] = quota
                self.total_samples += quota * self.world_size
                self.path2objective[url] = ds["objective"]
                self.path2offsets[url] = None if pretok else offsets[key]
                self.path2meta[url] = {
                    "name": name,
                    "prefixes": prefixes,
                    "kd_loss": ds.get("kd_loss", False),
                    "query_only": ds.get("query_only", False),
                    "pretokenized": pretok,
                }
        if not paths:
            raise ValueError(f"no usable shards in {spec_path} for batch {self.rank_batch_size}")
        return paths

    @staticmethod
    def _norm(url: str) -> str:
        from contrastors_tpu.data.indexing import norm_shard_key

        return norm_shard_key(url)

    # -- cursor ------------------------------------------------------------
    # The cursor lives in memory and is flushed to disk only on save_state
    # (exact-resume snapshot) — the reference rewrote the JSON every batch
    # (text_text_loader.py:471-499), which was the slowest host-side residue
    # once the C++ data plane landed (round-1 Weak #10).
    def _write_cursor(self, d: Dict[str, int]):
        self._cursor = dict(d)

    def _read_cursor(self) -> Dict[str, int]:
        return self._cursor

    def _flush_cursor(self, path: str, cursor: Optional[Dict[str, int]] = None):
        with open(path, "w") as f:
            json.dump(self._cursor if cursor is None else cursor, f, indent=1)

    def note_consumed(self, snapshot: Dict[str, Any]):
        """Record the state as of the last batch the TRAINER consumed.
        Under PrefetchIterator the worker thread advances self._cursor (and
        both RNGs) up to depth+1 batches ahead of training; checkpointing
        those overshot values would silently skip the prefetched-but-
        untrained samples on resume. Each yielded batch carries its own
        post-batch snapshot (cursor + rng + sample_rng); the trainer hands
        it back here and save_state prefers it."""
        self._consumed_snapshot = snapshot

    def save_state(self, ckpt_dir: str):
        os.makedirs(ckpt_dir, exist_ok=True)
        snap = getattr(self, "_consumed_snapshot", None)
        # Never swap self._cursor in place: under PrefetchIterator the worker
        # thread reads/advances it concurrently, and a temporary rollback here
        # would feed the worker a stale window (duplicate batches).
        cur = snap["cursor"] if snap is not None else None
        self._flush_cursor(os.path.join(ckpt_dir, f"rank_{self.rank}_processed.json"), cur)
        self._flush_cursor(self.cursor_path, cur)  # debug mirror
        # shard-choice + per-rank sampling RNG: without these a resumed run
        # replays the from-scratch draw sequence over mid-consumed shards —
        # valid but not reproducible vs the uninterrupted run
        rng_state = snap["rng"] if snap is not None else self.rng.getstate()
        samp_state = snap["sample_rng"] if snap is not None else self.sample_rng.getstate()
        with open(os.path.join(ckpt_dir, f"rank_{self.rank}_rng.json"), "w") as f:
            json.dump({"rng": rng_state, "sample_rng": samp_state}, f)

    def load_state(self, ckpt_dir: str):
        with open(os.path.join(ckpt_dir, f"rank_{self.rank}_processed.json")) as f:
            processed = json.load(f)
        self._write_cursor(processed)
        self.current_paths = [
            p for p in self.ds_paths if processed.get(p, 0) < self.max_per_shard[p]
        ]
        rng_path = os.path.join(ckpt_dir, f"rank_{self.rank}_rng.json")
        if os.path.exists(rng_path):  # absent in pre-round-3 checkpoints
            with open(rng_path) as f:
                st = json.load(f)
            self.rng.setstate((st["rng"][0], tuple(st["rng"][1]), st["rng"][2]))
            self.sample_rng.setstate(
                (st["sample_rng"][0], tuple(st["sample_rng"][1]), st["sample_rng"][2])
            )

    def __len__(self):
        return self.total_samples

    # -- iteration -----------------------------------------------------------
    def _get_stream(self, url: str):
        if not hasattr(self, "_streams"):
            self._streams: Dict[str, Any] = {}
        if url not in self._streams:
            if not url.startswith("s3://"):
                # local shards: C++ inflate with forward seek
                # (native/dataplane.cpp); falls back to fsspec below
                try:
                    from contrastors_tpu.native import NativeGzipStream

                    self._streams[url] = NativeGzipStream(url.replace("file://", ""))
                    return self._streams[url]
                except Exception:
                    pass
            fs = self._open_fs(url)
            self._streams[url] = fs.open(
                url, "rb", compression="gzip", cache_type="background", block_size=2**20
            )
        return self._streams[url]

    def _read_rank_batch(self, url: str, already: int) -> List[Dict]:
        """Read rank_batch_size records at global offset
        already*world + rank*rank_batch; offsets index the decompressed
        stream (text_text_loader.py:471-499). The stream is kept open so
        same-shard reads are sequential.

        Fault tolerance (reference text_text_loader.py:410-413, 532-536):
        corrupt records are skipped with a warning and the batch refilled by
        duplicating good records (static batch shapes must hold); stream
        errors raise ShardReadError, which __iter__ turns into dropping the
        shard instead of killing a multi-day run."""
        offsets = self.path2offsets[url]
        start_row = already * self.world_size + self.rank * self.rank_batch_size
        first = offsets[str(start_row)][0]
        last = offsets[str(start_row + self.rank_batch_size - 1)][1]
        try:
            stream = self._get_stream(url)
            if stream.tell() != first:
                stream.seek(first)
            blob = stream.read(last - first)
        except Exception as e:  # noqa: BLE001 — truncated gzip, IO error, ...
            self._streams.pop(url, None)  # stream state is unknown; reopen next time
            raise ShardReadError(f"stream error in {url} @ row {start_row}: {e}") from e
        if len(blob) < last - first:
            self._streams.pop(url, None)
            raise ShardReadError(
                f"short read in {url} @ row {start_row}: got {len(blob)} of {last - first} bytes"
            )
        records = []
        bad = 0
        for i in range(start_row, start_row + self.rank_batch_size):
            s, e = offsets[str(i)]
            try:
                records.append(json.loads(blob[s - first : e - first].decode()))
            except Exception as exc:  # noqa: BLE001 — corrupt line: skip + log
                bad += 1
                print(f"[data] skipping corrupt record {i} in {url}: {exc}", flush=True)
        if not records:
            raise ShardReadError(f"all {self.rank_batch_size} records corrupt in {url} @ {start_row}")
        if bad:
            fill = self.sample_rng.choices(records, k=bad)
            print(f"[data] refilled {bad} corrupt records in {url} by duplication", flush=True)
            records = records + fill
        return records

    # -- pretokenized token-array shards (scripts/pretokenize_pairs.py) -----
    def _load_token_shard(self, url: str) -> Dict[str, Any]:
        """Memory-map a .tokens shard's column arrays (cached per url)."""
        if not hasattr(self, "_token_shards"):
            self._token_shards: Dict[str, Dict[str, Any]] = {}
        if url not in self._token_shards:
            d = url.replace("file://", "")
            try:
                with open(os.path.join(d, "meta.json")) as f:
                    meta = json.load(f)
                sh: Dict[str, Any] = {"meta": meta}
                for name in os.listdir(d):
                    if name.endswith(".npy"):
                        sh[name[:-4]] = np.load(os.path.join(d, name), mmap_mode="r")
            except Exception as e:  # noqa: BLE001 — missing/corrupt shard
                raise ShardReadError(f"cannot open token shard {url}: {e}") from e
            # the negatives-count contract only exists for objectives WITH a
            # negatives column; a paired/self dataset mixed into a
            # num_negatives=7 spec is valid on the streaming path and must
            # stay valid pretokenized
            has_negs = "negative" in MAPPED_NAMES.get(meta.get("objective_type"), [])
            if self.num_negatives >= 0 and has_negs:
                m = meta.get("docs_per_query", 1)
                if m != self.num_negatives + 1:
                    raise ValueError(
                        f"{url} was pretokenized with {m - 1} negatives per "
                        f"query but the config asks for {self.num_negatives} "
                        "— re-run scripts/pretokenize_pairs.py"
                    )
            # baked collator settings must match the runtime config, or the
            # pretokenized datasets silently train on different text than
            # their on-the-fly neighbors in the same spec
            pmeta = self.path2meta.get(url, {})
            runtime = {
                "add_eos": self.collator.add_eos,
                "add_prefix": self.collator.add_prefix,
                "prefixes": pmeta.get("prefixes"),
                "query_only": pmeta.get("query_only", False),
            }
            for k, want in runtime.items():
                if k in meta and meta[k] != want:
                    raise ValueError(
                        f"{url} was pretokenized with {k}={meta[k]!r} but the "
                        f"run config uses {k}={want!r} — re-run "
                        "scripts/pretokenize_pairs.py with matching settings"
                    )
            for col, spec in meta.get("columns", {}).items():
                want_len = self.collator.col_max_length.get(col)
                if want_len is not None and spec["max_length"] != want_len:
                    raise ValueError(
                        f"{url} column {col!r} was pretokenized at "
                        f"max_length={spec['max_length']} but the run config "
                        f"uses {want_len} — re-run scripts/pretokenize_pairs.py"
                    )
            self._token_shards[url] = sh
        return self._token_shards[url]

    def _read_token_batch(self, url: str, already: int) -> Dict[str, Any]:
        """Rank window of a pretokenized shard: pure mmap slice + mask
        reconstruction (masks are right-padded contiguous ones by the
        collator contract, so lengths suffice) — zero tokenizer work."""
        sh = self._load_token_shard(url)
        n_pairs = sh["meta"]["n_pairs"]
        rb = self.rank_batch_size
        start = already * self.world_size + self.rank * rb
        out: Dict[str, Any] = {}
        try:
            for col, spec in sh["meta"]["columns"].items():
                m = spec["rows"] // n_pairs
                lo, hi = start * m, (start + rb) * m
                ids = np.asarray(sh[f"{col}_input_ids"][lo:hi], dtype=np.int32)
                lens = np.asarray(sh[f"{col}_lengths"][lo:hi])
                if ids.shape[0] < rb * m:
                    raise ShardReadError(
                        f"short token window in {url} @ pair {start}: "
                        f"{ids.shape[0]} of {rb * m} rows"
                    )
                L = ids.shape[1]
                out[f"{col}_input_ids"] = ids
                out[f"{col}_attention_mask"] = (
                    np.arange(L, dtype=np.int32)[None, :] < lens[:, None]
                ).astype(np.int32)
            if sh["meta"].get("kd_scores"):
                kd = np.asarray(sh["kd_scores"][start : start + rb], np.float32)
                if kd.shape[0] < rb:
                    # a truncated kd_scores.npy must hit the same
                    # retry/substitute path as a short token window, not
                    # surface later as an opaque shape error inside jit
                    raise ShardReadError(
                        f"short kd_scores window in {url} @ pair {start}: "
                        f"{kd.shape[0]} of {rb} rows"
                    )
                out["kd_scores"] = kd
        except ShardReadError:
            raise
        except Exception as e:  # noqa: BLE001 — mmap IO error mid-read
            self._token_shards.pop(url, None)
            raise ShardReadError(f"token read error in {url} @ pair {start}: {e}") from e
        return out

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        while True:
            while self.current_paths:
                if self.weighted_sampling:
                    cursor = self._read_cursor()
                    weights = [
                        self.counts[p] - cursor[p] * self.world_size for p in self.current_paths
                    ]
                    url = self.rng.choices(self.current_paths, weights=weights, k=1)[0]
                else:
                    url = self.rng.choice(self.current_paths)

                cursor = self._read_cursor()
                already = cursor[url]
                meta = self.path2meta[url]
                read_window = (
                    self._read_token_batch if meta["pretokenized"] else self._read_rank_batch
                )
                try:
                    records = read_window(url, already)
                except ShardReadError as e:
                    # reopen once (transient stream state), then substitute
                    # this rank's first window (keeps per-shard batch counts —
                    # and therefore multi-host cadence — intact), then give up
                    # on the shard
                    print(f"[data] read failure, retrying: {e}", flush=True)
                    try:
                        records = read_window(url, already)
                    except ShardReadError:
                        try:
                            records = read_window(url, 0)
                            print(f"[data] substituted window 0 of {url}", flush=True)
                        except ShardReadError as e2:
                            if self.world_size > 1:
                                # dropping a shard on one rank desynchronizes
                                # the shard-choice RNG across processes —
                                # fail loudly instead of training on skew
                                raise
                            print(f"[data] dropping shard after read failure: {e2}", flush=True)
                            self.current_paths.remove(url)
                            continue
                cursor[url] = already + self.rank_batch_size
                self._write_cursor(cursor)
                if cursor[url] >= self.max_per_shard[url]:
                    self.current_paths.remove(url)
                    # shard exhausted: close its stream / drop its mmaps
                    # (thousands of shards would otherwise accumulate open
                    # fds + decode caches)
                    s = getattr(self, "_streams", {}).pop(url, None)
                    if s is not None:
                        try:
                            s.close()
                        except Exception:
                            pass
                    getattr(self, "_token_shards", {}).pop(url, None)

                if meta["pretokenized"]:
                    batch = dict(records)  # already token arrays
                    batch["dataset_name"] = meta["name"]
                else:
                    objective = self.path2objective[url]
                    pairs = []
                    for r in records:
                        p, neg_idx = _extract_pair(
                            r, objective, self.num_negatives, self.sample_negatives, self.sample_rng
                        )
                        if meta["kd_loss"]:
                            # teacher scores gathered with the SAME indices as
                            # the kept negatives (sampled subsets / -1 = all)
                            neg_scores = r["negatives_scores"]
                            p["kd_scores"] = [r["document_score"]] + [
                                neg_scores[j] for j in (neg_idx or [])
                            ]
                        pairs.append(p)
                    batch = self.collator(
                        pairs,
                        objective["type"],
                        dataset_name=meta["name"],
                        prefixes=meta["prefixes"],
                        query_only=meta["query_only"],
                    )
                # post-batch cursor + RNG snapshot rides along so the
                # consumer can checkpoint what it has actually trained on
                # (note_consumed). RNG states must travel WITH the cursor:
                # under prefetch the live rngs have already advanced through
                # read-ahead batches, so saving them at save_state time would
                # re-draw different shard choices / negatives on resume.
                batch["cursor_snapshot"] = {
                    "cursor": dict(cursor),
                    "rng": self.rng.getstate(),
                    "sample_rng": self.sample_rng.getstate(),
                }
                yield batch
            if not self.infinite:
                return
            self.current_paths = list(self.ds_paths)
            self._write_cursor({p: 0 for p in self.ds_paths})


class LocalJsonlDataset:
    """Map-style loader over local jsonl(.gz) files
    (reference: text_text_loader.py:663-823 LocalShardDataset +
    get_local_dataloader). Used for finetune-scale data."""

    def __init__(
        self,
        files: List[str],
        global_batch_size: int,
        tokenizer,
        objective: Optional[Dict] = None,
        seed: int = 42,
        add_eos: bool = True,
        add_prefix: bool = False,
        num_negatives: int = -1,
        sample_negatives: bool = False,
        query_max_length: Optional[int] = None,
        document_max_length: Optional[int] = None,
        shuffle: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        dataset_name: str = "local",
        infinite: bool = False,
    ):
        self.records = []
        for path in files:
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rt") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self.records.append(json.loads(line))
        self.objective = objective or {"type": "paired", "columns": ["query", "document"]}
        # epoch-shuffle rng must stay in lockstep across ranks (disjoint
        # windows of one shared order); negative sampling draws vary per
        # record and live on a per-rank rng (same split as the streaming
        # dataset above)
        self.rng = random.Random(seed)
        self.sample_rng = random.Random(f"{seed}/{process_index}/sample")
        self.shuffle = shuffle
        self.rank = process_index
        self.world = process_count
        self.rank_batch = global_batch_size // process_count
        self.num_negatives = num_negatives
        self.sample_negatives = sample_negatives
        self.dataset_name = dataset_name
        self.infinite = infinite
        col_max = dict(DEFAULT_MAX_TOKENS)
        if query_max_length:
            col_max["query"] = query_max_length
        if document_max_length:
            col_max["document"] = document_max_length
            col_max["negative"] = document_max_length
        self.collator = TokenizeCollator(tokenizer, add_eos, add_prefix, col_max)

    def __len__(self):
        per_rank = len(self.records) // self.world // self.rank_batch
        return per_rank * self.world * self.rank_batch

    def num_batches(self):
        return len(self.records) // self.world // self.rank_batch

    def __iter__(self):
        while True:
            order = list(range(len(self.records)))
            if self.shuffle:
                self.rng.shuffle(order)
            n = self.num_batches()
            for b in range(n):
                idx = order[(b * self.world + self.rank) * self.rank_batch :][: self.rank_batch]
                pairs = [
                    _extract_pair(
                        self.records[i], self.objective, self.num_negatives,
                        self.sample_negatives, self.sample_rng,
                    )[0]
                    for i in idx
                ]
                yield self.collator(pairs, self.objective["type"], dataset_name=self.dataset_name)
            if not self.infinite:
                return
