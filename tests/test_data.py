"""Streaming shard dataset: format, rank-disjointness, exact resume
(reference: dataset/text_text_loader.py behaviors)."""

import gzip
import json
import os

import numpy as np
import pytest

from contrastors_tpu.data import StreamingShardDataset, LocalJsonlDataset, expand_urls
from contrastors_tpu.data.indexing import build_bucket_index


def make_tokenizer(tmp_path):
    from transformers import BertTokenizerFast

    words = [f"word{i}" for i in range(50)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "search_query", "search_document", ":", "q", "d"] + words
    vocab_file = str(tmp_path / "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(vocab))
    return BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)


def make_bucket(tmp_path, n_shards=2, rows_per_shard=32):
    bucket = tmp_path / "data" / "pairs"
    bucket.mkdir(parents=True)
    r = 0
    for s in range(n_shards):
        with gzip.open(bucket / f"shard-{s:05d}.jsonl.gz", "wt") as f:
            for _ in range(rows_per_shard):
                rec = {
                    "query": f"q word{r // 50} word{r % 50}",
                    "document": f"d word{(r * 7) % 50}",
                    "row_id": r,
                    "metadata": {"objective": {"paired": [["query", "document"]]}},
                }
                f.write(json.dumps(rec) + "\n")
                r += 1
    build_bucket_index(str(bucket))
    spec = {
        "datasets": [
            {
                "name": "pairs",
                "bucket": str(bucket / ("shard-{00000..%05d}.jsonl.gz" % (n_shards - 1))),
                "objective": {"type": "paired", "columns": [["query", "document"]]},
            }
        ]
    }
    # columns in the reference spec is a flat list for paired
    spec["datasets"][0]["objective"]["columns"] = ["query", "document"]
    spec_path = tmp_path / "spec.yaml"
    import yaml

    with open(spec_path, "w") as f:
        yaml.safe_dump(spec, f)
    return str(spec_path)


def test_expand_urls():
    assert expand_urls("a-{000..002}.gz") == ["a-000.gz", "a-001.gz", "a-002.gz"]
    assert expand_urls("plain.gz") == ["plain.gz"]


def test_streaming_shapes_and_content(tmp_path):
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)
    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=tok, seed=0, add_prefix=True,
        process_index=0, process_count=1, state_dir=str(tmp_path / "state"),
    )
    assert len(ds) == 64
    batches = list(ds)
    assert len(batches) == 8
    b = batches[0]
    assert b["query_input_ids"].shape == (8, 32)
    assert b["document_input_ids"].shape == (8, 256)
    assert b["dataset_name"] == "pairs"
    assert b["query_input_ids"].dtype == np.int32


def test_rank_disjoint_reads(tmp_path):
    """Two ranks reading the same shard sequence must see disjoint rows."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)

    seen = {}
    for rank in (0, 1):
        ds = StreamingShardDataset(
            spec, global_batch_size=8, tokenizer=tok, seed=123,
            process_index=rank, process_count=2,
            state_dir=str(tmp_path / f"state{rank}"),
        )
        ids = []
        for batch in ds:
            ids.append(batch["query_input_ids"])
        seen[rank] = np.concatenate(ids)
    # decode back the distinguishing token (word{r%50}) and compare rows
    rows0 = {tuple(r) for r in seen[0].tolist()}
    rows1 = {tuple(r) for r in seen[1].tolist()}
    # queries repeat every 50 rows; with 64 rows total overlap would need
    # duplicate row ids — disjointness means few identical tokenized rows
    assert len(rows0 & rows1) == 0


def test_resume_exact(tmp_path):
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)

    def fresh(state_dir):
        return StreamingShardDataset(
            spec, global_batch_size=8, tokenizer=tok, seed=7,
            process_index=0, process_count=1, state_dir=str(tmp_path / state_dir),
        )

    ds = fresh("s1")
    it = iter(ds)
    consumed = [next(it) for _ in range(3)]
    ckpt = tmp_path / "ckpt"
    ds.save_state(str(ckpt))
    rest_a = [b["query_input_ids"] for b in it]

    ds2 = fresh("s2")
    ds2.load_state(str(ckpt))
    # rng state differs across instances only via seed — same seed, but the
    # rng has advanced in ds; replay the same number of choices
    for _ in range(3):
        ds2.rng.choice([0, 1])  # advance rng like the 3 consumed picks
    rest_b = [b["query_input_ids"] for b in iter(ds2)]

    assert len(rest_a) == len(rest_b)
    total = sum(a.shape[0] for a in rest_a) + sum(c["query_input_ids"].shape[0] for c in consumed)
    assert total == 64


def test_local_jsonl_dataset(tmp_path):
    tok = make_tokenizer(tmp_path)
    f = tmp_path / "train.jsonl"
    with open(f, "w") as fh:
        for i in range(20):
            fh.write(json.dumps({"query": f"q word{i}", "document": f"d word{i}", "negatives": [f"word{i+1}", f"word{i+2}"]}) + "\n")
    ds = LocalJsonlDataset(
        [str(f)], global_batch_size=4, tokenizer=tok,
        objective={"type": "triplet", "columns": ["query", "document", "negatives"]},
        num_negatives=2, seed=0,
    )
    batches = list(ds)
    assert len(batches) == 5
    # 1 positive + 2 negatives per query -> documents 3x the queries
    assert batches[0]["document_input_ids"].shape[0] == 12
    assert batches[0]["query_input_ids"].shape[0] == 4


def test_corrupt_record_skipped_and_refilled(tmp_path):
    """A corrupt JSON line must not kill the run: it is skipped, logged, and
    the batch refilled by duplication (reference text_text_loader.py:532-536
    log-and-continue semantics)."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path, n_shards=1, rows_per_shard=16)

    # corrupt row 3 in place, preserving byte length so offsets stay valid
    bucket = tmp_path / "data" / "pairs"
    shard = bucket / "shard-00000.jsonl.gz"
    lines = gzip.open(shard, "rt").read().splitlines(keepends=True)
    lines[3] = "x" * (len(lines[3]) - 1) + "\n"
    with gzip.open(shard, "wt") as f:
        f.write("".join(lines))

    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=tok, seed=7,
        process_index=0, process_count=1, state_dir=str(tmp_path / "st"),
    )
    batches = list(iter(ds))
    assert len(batches) == 2
    for b in batches:
        assert b["query_input_ids"].shape[0] == 8  # batch shape preserved


def test_truncated_shard_dropped_run_continues(tmp_path):
    """A truncated gzip shard is dropped with a warning; remaining shards
    keep serving batches."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path, n_shards=2, rows_per_shard=32)

    shard = tmp_path / "data" / "pairs" / "shard-00001.jsonl.gz"
    raw = shard.read_bytes()
    shard.write_bytes(raw[: len(raw) // 4])  # truncate the compressed stream

    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=tok, seed=7,
        process_index=0, process_count=1, state_dir=str(tmp_path / "st"),
    )
    batches = list(iter(ds))
    # the good shard's 4 batches survive; some/all of the bad one is dropped
    assert len(batches) >= 4
    for b in batches:
        assert b["query_input_ids"].shape[0] == 8


def test_cursor_in_memory_until_save(tmp_path):
    """The cursor file is written on save_state, not per batch (round-1
    Weak #10), and stays resume-exact."""
    import os as _os

    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path, n_shards=1, rows_per_shard=32)
    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=tok, seed=7,
        process_index=0, process_count=1, state_dir=str(tmp_path / "st"),
    )
    it = iter(ds)
    next(it), next(it)
    assert not _os.path.exists(ds.cursor_path), "cursor flushed per-batch"
    ckpt = tmp_path / "ck"
    ds.save_state(str(ckpt))
    assert _os.path.exists(ds.cursor_path)
    with open(ckpt / "rank_0_processed.json") as f:
        saved = json.load(f)
    assert sum(saved.values()) == 16


def test_eos_validation_raises_on_bad_placement(tmp_path):
    import numpy as np
    import pytest as _pytest

    from contrastors_tpu.data.text import validate_eos_placement

    ids = np.array([[5, 6, 9, 0], [5, 9, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.int32)
    validate_eos_placement(ids, mask, eos_id=9)  # ok
    ids_bad = ids.copy()
    ids_bad[0, 2] = 7
    with _pytest.raises(ValueError, match="do not end in EOS"):
        validate_eos_placement(ids_bad, mask, eos_id=9)


def test_kd_scores_align_with_sampled_negatives(tmp_path):
    """kd_scores must be gathered with the SAME indices as the kept
    negatives — sampled subsets previously paired first-k teacher scores
    with a random-k document subset, and num_negatives=-1 dropped the
    last score."""
    import random as pyrandom

    from contrastors_tpu.data.text import _extract_pair

    record = {
        "query": "q",
        "document": "pos",
        "negatives": [f"n{i}" for i in range(6)],
        "negatives_scores": [float(i) for i in range(6)],
        "document_score": 99.0,
    }
    objective = {"type": "triplet", "columns": ["query", "document", "negatives"]}
    rng = pyrandom.Random(0)
    p, idx = _extract_pair(record, objective, num_negatives=3, sample_negatives=True, rng=rng)
    assert len(idx) == 3 and p["document"][1:] == [f"n{j}" for j in idx]
    scores = [record["document_score"]] + [record["negatives_scores"][j] for j in idx]
    # every kept document's teacher score is the one for THAT document
    for doc, s in zip(p["document"][1:], scores[1:]):
        assert record["negatives_scores"][int(doc[1:])] == s

    # num_negatives=-1 keeps everything, scores included
    p, idx = _extract_pair(record, objective, num_negatives=-1, sample_negatives=False, rng=rng)
    assert len(p["document"]) == 7 and idx == list(range(6))


def test_short_record_negatives_cycle_padded():
    """A record with fewer negatives than num_negatives cycle-pads to the
    uniform count — ragged docs-per-query misaligns clip_loss's i * mult
    labels (round-3 review #1); zero negatives raises."""
    import random as pyrandom

    import pytest as _pytest

    from contrastors_tpu.data.text import _extract_pair

    objective = {"type": "triplet", "columns": ["query", "document", "negatives"]}
    rng = pyrandom.Random(0)
    record = {"query": "q", "document": "pos", "negatives": ["n0", "n1"]}
    p, idx = _extract_pair(record, objective, num_negatives=5, sample_negatives=True, rng=rng)
    assert len(p["document"]) == 6  # positive + exactly num_negatives
    assert set(p["document"][1:]) == {"n0", "n1"}
    assert len(idx) == 5  # kd_scores gather stays aligned with duplicates

    with _pytest.raises(ValueError, match="no negatives"):
        _extract_pair(
            {"query": "q", "document": "pos", "negatives": []},
            objective, num_negatives=5, sample_negatives=True, rng=rng,
        )

    # num_negatives=0 legitimately requires none: an empty list must NOT
    # raise — the batch stays uniform at 1 doc/query (round-3 review)
    p, idx = _extract_pair(
        {"query": "q", "document": "pos", "negatives": []},
        objective, num_negatives=0, sample_negatives=True, rng=rng,
    )
    assert p["document"] == ["pos"] and idx == []


def test_collator_pads_ragged_document_lists(tmp_path):
    """num_negatives=-1 over heterogeneous records: the collator cycle-pads
    every document list (negatives only, never the positive) to the batch
    max and keeps kd_scores aligned."""
    from contrastors_tpu.data.text import TokenizeCollator

    tok = make_tokenizer(tmp_path)
    c = TokenizeCollator(tok, add_eos=False)
    samples = [
        {"query": "q0", "document": ["p0", "a", "b", "c"], "kd_scores": [9.0, 1.0, 2.0, 3.0]},
        {"query": "q1", "document": ["p1", "d"], "kd_scores": [8.0, 4.0]},
    ]
    out = c(samples, "paired")
    n_docs = out["document_input_ids"].shape[0]
    assert n_docs == 8  # 2 queries x 4 docs each
    # the padded sample's extra docs cycle over its own negatives, and the
    # positive is never duplicated into the negative slots
    assert samples[1]["document"] == ["p1", "d", "d", "d"]
    assert samples[1]["kd_scores"] == [8.0, 4.0, 4.0, 4.0]
    assert out["kd_scores"].shape == (2, 4)


def test_left_padding_tokenizer_forced_right(tmp_path):
    from contrastors_tpu.data.text import TokenizeCollator

    tok = make_tokenizer(tmp_path)
    tok.padding_side = "left"
    TokenizeCollator(tok, add_eos=False)
    assert tok.padding_side == "right"


def test_resolve_shard_key_depth_tolerant(tmp_path):
    """The same bucket keyed at a different mount depth still resolves
    (round-3 review #6: the 5/6-segment cliff)."""
    import pytest as _pytest

    from contrastors_tpu.data.indexing import norm_shard_key, resolve_shard_key

    # index built at depth 5 (3-segment keys); read at depth 6+
    keys = {norm_shard_key("/a/b/c/d/shard-0.jsonl.gz"): 1}
    assert resolve_shard_key("file:///x/a/b/c/d/shard-0.jsonl.gz", keys) in keys
    assert resolve_shard_key("/mnt/y/x/c/d/shard-0.jsonl.gz", keys) in keys
    with _pytest.raises(KeyError, match="build_index"):
        resolve_shard_key("/a/b/c/d/other.jsonl.gz", keys)
    # ambiguous basenames stay an error
    two = {"c/d/s.gz": 1, "e/f/s.gz": 2}
    with _pytest.raises(KeyError, match="2 keys"):
        resolve_shard_key("/zz/q/s.gz", two)


def test_prefetch_cursor_checkpoints_consumed_not_read_ahead(tmp_path):
    """save_state under PrefetchIterator writes the cursor of the batch the
    trainer consumed, not wherever the worker read ahead to (round-3 review
    #3); resume then replays the prefetched-but-untrained batches, and the
    shard-choice RNG is restored so the schedule is reproducible."""
    spec = make_bucket(tmp_path, n_shards=2, rows_per_shard=32)
    from contrastors_tpu.utils.prefetch import PrefetchIterator

    def make_ds():
        return StreamingShardDataset(
            spec, global_batch_size=8, tokenizer=make_tokenizer(tmp_path), seed=3,
        )

    ds = make_ds()
    it = PrefetchIterator(iter(ds), depth=3)
    first = next(it)
    ds.note_consumed(first["cursor_snapshot"])
    import time as _t

    _t.sleep(0.3)  # let the worker read ahead past the consumed point
    ckpt = tmp_path / "ck"
    ds.save_state(str(ckpt))
    # uninterrupted continuation
    expected = [next(it)["query_input_ids"] for _ in range(3)]

    ds2 = make_ds()
    ds2.load_state(str(ckpt))
    it2 = iter(ds2)
    got = [next(it2)["query_input_ids"] for _ in range(3)]
    for a, b in zip(expected, got):
        np.testing.assert_array_equal(a, b)


def test_save_state_does_not_touch_live_cursor(tmp_path):
    """save_state must flush the consumed snapshot WITHOUT swapping
    self._cursor in place: the PrefetchIterator worker thread reads/advances
    the live cursor concurrently, and a temporary rollback hands the worker
    a stale window (duplicate batches) or clobbers its advance (round-3
    review: parametrized _flush_cursor instead of swap/restore)."""
    import json as _json

    spec = make_bucket(tmp_path, n_shards=2, rows_per_shard=32)
    ds = StreamingShardDataset(
        spec, global_batch_size=8, tokenizer=make_tokenizer(tmp_path), seed=3,
    )
    it = iter(ds)
    first = next(it)
    ds.note_consumed(first["cursor_snapshot"])
    next(it)  # live cursor advances past the consumed snapshot
    live_before = dict(ds._cursor)
    ckpt = tmp_path / "ck2"
    ds.save_state(str(ckpt))
    assert ds._cursor == live_before  # never mutated, not even transiently
    with open(ckpt / "rank_0_processed.json") as f:
        flushed = _json.load(f)
    assert flushed == first["cursor_snapshot"]["cursor"]
    assert flushed != live_before  # the snapshot, not the read-ahead cursor


def _pretokenize(tmp_path, spec, out_name="pretok", **extra_flags):
    """Run scripts/pretokenize_pairs over `spec`, return the new spec path."""
    import sys

    from contrastors_tpu.scripts import pretokenize_pairs as pp

    tok_dir = tmp_path / "tok_dir"
    if not tok_dir.exists():
        make_tokenizer(tmp_path).save_pretrained(str(tok_dir))
    out = tmp_path / out_name
    argv = [
        "pretokenize_pairs", "--spec", spec, "--tokenizer", str(tok_dir),
        "--out", str(out),
    ] + [f for f in extra_flags.get("flags", [])]
    old = sys.argv
    sys.argv = argv
    try:
        pp.main()
    finally:
        sys.argv = old
    return str(out / "spec.yaml")


def make_triplet_bucket(tmp_path, neg_counts=(2, 2, 2, 2), rows=16, scores=False,
                        kd_loss=None, name="trips"):
    """Triplet bucket with per-record negative counts cycling through
    `neg_counts`; optional teacher scores."""
    import yaml

    bucket = tmp_path / "data" / name
    bucket.mkdir(parents=True)
    with gzip.open(bucket / "shard-00000.jsonl.gz", "wt") as f:
        for r in range(rows):
            k = neg_counts[r % len(neg_counts)]
            rec = {
                "query": f"q word{r % 50}",
                "document": f"d word{(r * 7) % 50}",
                "negatives": [f"n word{(r * 3 + j) % 50}" for j in range(k)],
            }
            if scores:
                rec["document_score"] = 1.0
                rec["negatives_scores"] = [0.5 - 0.01 * j for j in range(k)]
            f.write(json.dumps(rec) + "\n")
    build_bucket_index(str(bucket))
    ds = {
        "name": name,
        "bucket": str(bucket / "shard-{00000..00000}.jsonl.gz"),
        "objective": {"type": "triplet", "columns": ["query", "document", "negatives"]},
    }
    if kd_loss is not None:
        ds["kd_loss"] = kd_loss
    spec_path = tmp_path / f"spec_{name}.yaml"
    with open(spec_path, "w") as f:
        yaml.safe_dump({"datasets": [ds]}, f)
    return str(spec_path)


def test_pretokenized_equals_on_the_fly(tmp_path):
    """Exact equivalence: a StreamingShardDataset over token-array shards
    yields byte-identical batches to the on-the-fly tokenizing path with the
    same seed (r3 VERDICT next #4)."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)
    tok_spec = _pretokenize(tmp_path, spec, flags=["--add_prefix"])

    kw = dict(
        global_batch_size=8, tokenizer=tok, seed=11, add_prefix=True,
        process_index=0, process_count=1,
    )
    ds_fly = StreamingShardDataset(spec, state_dir=str(tmp_path / "s1"), **kw)
    ds_tok = StreamingShardDataset(tok_spec, state_dir=str(tmp_path / "s2"), **kw)
    assert len(ds_fly) == len(ds_tok)

    n = 0
    for a, b in zip(ds_fly, ds_tok):
        assert a["dataset_name"] == b["dataset_name"]
        for k in (
            "query_input_ids", "query_attention_mask",
            "document_input_ids", "document_attention_mask",
        ):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        n += 1
    assert n == 8


def test_pretokenized_resume_and_rank_windows(tmp_path):
    """The cursor/resume machinery is shared: a pretokenized dataset resumes
    exactly, and two ranks read disjoint windows."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)
    tok_spec = _pretokenize(tmp_path, spec)

    kw = dict(global_batch_size=8, tokenizer=tok, seed=5)
    ds = StreamingShardDataset(tok_spec, state_dir=str(tmp_path / "sa"), **kw)
    it = iter(ds)
    first = next(it)
    ds.note_consumed(first["cursor_snapshot"])
    ckpt = tmp_path / "ckpt"
    ds.save_state(str(ckpt))
    rest = [b["query_input_ids"] for b in it]

    ds2 = StreamingShardDataset(tok_spec, state_dir=str(tmp_path / "sb"), **kw)
    ds2.load_state(str(ckpt))
    rest2 = [b["query_input_ids"] for b in iter(ds2)]
    assert len(rest) == len(rest2)
    for x, y in zip(rest, rest2):
        np.testing.assert_array_equal(x, y)

    rows = {}
    for rank in (0, 1):
        d = StreamingShardDataset(
            tok_spec, global_batch_size=8, tokenizer=tok, seed=9,
            process_index=rank, process_count=2,
            state_dir=str(tmp_path / f"sr{rank}"),
        )
        rows[rank] = {tuple(r) for b in d for r in b["query_input_ids"].tolist()}
    assert not rows[0] & rows[1]


def test_pretokenized_num_negatives_mismatch_raises(tmp_path):
    """Asking the loader for a different negative count than TRIPLET shards
    were written with must fail loudly, not silently mislabel clip_loss —
    while a paired dataset (no negatives column) in the same-numbered spec
    must stay loadable, exactly as it is on the streaming path (round-4
    review #2)."""
    tok = make_tokenizer(tmp_path)
    spec = make_triplet_bucket(tmp_path, neg_counts=(2,))
    tok_spec = _pretokenize(tmp_path, spec, out_name="pt_trip",
                            flags=["--num_negatives", "2"])
    ds = StreamingShardDataset(
        tok_spec, global_batch_size=8, tokenizer=tok, seed=0, num_negatives=3,
        state_dir=str(tmp_path / "sn"),
    )
    with pytest.raises(ValueError, match="pretokenized with"):
        next(iter(ds))

    # paired shards: the contract doesn't exist, num_negatives is ignored
    paired_spec = make_bucket(tmp_path)
    paired_tok = _pretokenize(tmp_path, paired_spec, out_name="pt_paired")
    ds2 = StreamingShardDataset(
        paired_tok, global_batch_size=8, tokenizer=tok, seed=0, num_negatives=3,
        state_dir=str(tmp_path / "sp"),
    )
    b = next(iter(ds2))
    assert b["document_input_ids"].shape[0] == b["query_input_ids"].shape[0]


def test_pretokenize_ragged_chunks_stay_uniform(tmp_path, monkeypatch):
    """num_negatives=-1 on a ragged corpus spanning multiple writer chunks
    must produce ONE uniform docs-per-query for the whole shard (round-4
    review #1: chunk-local cycle-pad maxima silently corrupted the reader's
    row arithmetic, pairing queries with other records' documents)."""
    import json as _json

    from contrastors_tpu.scripts import pretokenize_pairs as pp

    # chunk 4 over 12 records: chunk A max 2 negatives, chunk B max 4 —
    # without the global pre-scan these bake different strides
    monkeypatch.setattr(pp, "CHUNK", 4)
    counts = (1, 2, 1, 2, 4, 3, 2, 1, 2, 2, 1, 1)
    tok = make_tokenizer(tmp_path)
    spec = make_triplet_bucket(tmp_path, neg_counts=counts, rows=12)
    tok_spec = _pretokenize(tmp_path, spec, out_name="pt_ragged")

    import yaml

    with open(tok_spec) as f:
        url = yaml.safe_load(f)["datasets"][0]["bucket"]
    shard_dir = expand_urls(url)[0].replace("file://", "")
    with open(os.path.join(shard_dir, "meta.json")) as f:
        meta = _json.load(f)
    assert meta["docs_per_query"] == 5  # 1 positive + global max 4 negatives
    doc_rows = np.load(os.path.join(shard_dir, "document_input_ids.npy"))
    assert doc_rows.shape[0] == 12 * 5

    # alignment: every pretokenized window equals the on-the-fly batch at
    # the equivalent fixed num_negatives (= the global max)
    kw = dict(global_batch_size=4, tokenizer=tok, seed=2, num_negatives=4)
    fly = StreamingShardDataset(spec, state_dir=str(tmp_path / "f"), **kw)
    pre = StreamingShardDataset(tok_spec, state_dir=str(tmp_path / "p"), **kw)
    n = 0
    for a, b in zip(fly, pre):
        np.testing.assert_array_equal(a["document_input_ids"], b["document_input_ids"])
        np.testing.assert_array_equal(a["query_input_ids"], b["query_input_ids"])
        n += 1
    assert n == 3


def test_pretokenize_global_stride_across_shards(tmp_path):
    """num_negatives=-1 over MULTIPLE source shards with different max
    negative counts must bake ONE docs-per-query stride for the whole
    dataset (round-4 advisor #4: per-shard maxima silently varied batch
    document counts across shards)."""
    import json as _json

    import yaml

    bucket = tmp_path / "data" / "multi"
    bucket.mkdir(parents=True)
    # shard 0: max 1 negative; shard 1: max 3 negatives
    for s, kmax in enumerate((1, 3)):
        with gzip.open(bucket / f"shard-{s:05d}.jsonl.gz", "wt") as f:
            for r in range(8):
                rec = {
                    "query": f"q word{r % 50}",
                    "document": f"d word{(r * 7) % 50}",
                    "negatives": [f"n word{(r + j) % 50}" for j in range(1 + (r % kmax if kmax > 1 else 0))],
                }
                f.write(json.dumps(rec) + "\n")
    build_bucket_index(str(bucket))
    spec_path = tmp_path / "spec_multi.yaml"
    with open(spec_path, "w") as f:
        yaml.safe_dump(
            {
                "datasets": [
                    {
                        "name": "multi",
                        "bucket": str(bucket / "shard-{00000..00001}.jsonl.gz"),
                        "objective": {"type": "triplet", "columns": ["query", "document", "negatives"]},
                    }
                ]
            },
            f,
        )
    tok_spec = _pretokenize(tmp_path, str(spec_path), out_name="pt_multi")
    with open(tok_spec) as f:
        url = yaml.safe_load(f)["datasets"][0]["bucket"]
    strides = set()
    for u in expand_urls(url):
        with open(os.path.join(u.replace("file://", ""), "meta.json")) as f:
            strides.add(_json.load(f)["docs_per_query"])
    assert strides == {4}  # 1 positive + global max 3 negatives, BOTH shards


def test_pretokenize_kd_follows_spec_flag(tmp_path):
    """kd_scores baking follows the spec's kd_loss flag — the same gate the
    streaming path applies — not record sniffing (round-4 review #3)."""
    import yaml

    tok = make_tokenizer(tmp_path)
    # records CARRY scores but the spec does not enable kd_loss
    spec_off = make_triplet_bucket(tmp_path, neg_counts=(2,), scores=True,
                                   kd_loss=False, name="kdoff")
    tok_off = _pretokenize(tmp_path, spec_off, out_name="pt_kdoff")
    ds = StreamingShardDataset(
        tok_off, global_batch_size=8, tokenizer=tok, seed=0, num_negatives=2,
        state_dir=str(tmp_path / "k0"),
    )
    assert "kd_scores" not in next(iter(ds))

    spec_on = make_triplet_bucket(tmp_path, neg_counts=(2,), scores=True,
                                  kd_loss=True, name="kdon")
    tok_on = _pretokenize(tmp_path, spec_on, out_name="pt_kdon")
    kw = dict(global_batch_size=8, tokenizer=tok, seed=0, num_negatives=2)
    a = next(iter(StreamingShardDataset(spec_on, state_dir=str(tmp_path / "k1"), **kw)))
    b = next(iter(StreamingShardDataset(tok_on, state_dir=str(tmp_path / "k2"), **kw)))
    np.testing.assert_allclose(a["kd_scores"], b["kd_scores"])

    # kd_loss on a corpus with no scores: loud writer error, not a KeyError
    spec_bad = make_triplet_bucket(tmp_path, neg_counts=(2,), scores=False,
                                   kd_loss=True, name="kdbad")
    with pytest.raises(ValueError, match="kd_loss"):
        _pretokenize(tmp_path, spec_bad, out_name="pt_kdbad")


def test_pretokenized_settings_mismatch_raises(tmp_path):
    """Baked collator settings (add_prefix, max_length) must match the run
    config, or the dataset silently trains on different text than its
    on-the-fly neighbors (round-4 review #4)."""
    tok = make_tokenizer(tmp_path)
    spec = make_bucket(tmp_path)
    tok_spec = _pretokenize(tmp_path, spec, out_name="pt_plain")  # no prefix

    ds = StreamingShardDataset(
        tok_spec, global_batch_size=8, tokenizer=tok, seed=0, add_prefix=True,
        state_dir=str(tmp_path / "m1"),
    )
    with pytest.raises(ValueError, match="add_prefix"):
        next(iter(ds))

    ds2 = StreamingShardDataset(
        tok_spec, global_batch_size=8, tokenizer=tok, seed=0,
        document_max_length=128, state_dir=str(tmp_path / "m2"),
    )
    with pytest.raises(ValueError, match="max_length"):
        next(iter(ds2))
