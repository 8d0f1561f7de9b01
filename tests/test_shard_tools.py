"""shard_tools CLI: corpus -> paired shards -> index -> streaming read,
plus filter / lengths / sizes (reference scripts/text/{filter_rows,
get_lengths,convert_to_arrow}.py, multilingual/process_mc4.py roles)."""

import gzip
import json
import os

from contrastors_tpu.scripts.shard_tools import main as shard_tools


def _write_corpus(path, n=25, lang=None):
    with gzip.open(path, "wt") as f:
        for i in range(n):
            row = {"text": f"Title {i}\nBody text number {i} with some words."}
            if lang is not None:
                row["lang"] = lang[i % len(lang)]
            f.write(json.dumps(row) + "\n")


def test_to_paired_index_and_stream(tmp_path):
    corpus = tmp_path / "corpus.jsonl.gz"
    _write_corpus(str(corpus), n=25)
    out = tmp_path / "bucket"
    shard_tools([
        "to_paired", "--input", str(corpus), "--output_dir", str(out),
        "--query_col", "query", "--document_col", "document",
        "--split_title_text", "--shard_size", "10",
    ])
    shards = sorted(os.listdir(out))
    assert [s for s in shards if s.startswith("shard-")] == [
        "shard-00000.jsonl.gz", "shard-00001.jsonl.gz", "shard-00002.jsonl.gz"
    ]
    with gzip.open(out / "shard-00000.jsonl.gz", "rt") as f:
        r = json.loads(f.readline())
    assert r["query"] == "Title 0" and r["document"].startswith("Body text number 0")
    assert r["metadata"]["objective"]["paired"] == [["query", "document"]]

    # index + stream through StreamingShardDataset
    from contrastors_tpu.data.indexing import build_bucket_index

    build_bucket_index(str(out))
    spec = tmp_path / "spec.yaml"
    spec.write_text(
        "datasets:\n"
        f"  - name: toy\n"
        f"    bucket: {out}/shard-{{00000..00002}}.jsonl.gz\n"
        "    objective:\n"
        "      type: paired\n"
        "      columns: [query, document]\n"
    )
    from contrastors_tpu.data.text import StreamingShardDataset
    from tests.test_data import make_tokenizer

    tok = make_tokenizer(tmp_path)
    ds = StreamingShardDataset(
        str(spec), global_batch_size=5, tokenizer=tok,
        process_index=0, process_count=1, state_dir=str(tmp_path / "state"),
    )
    batch = next(iter(ds))
    assert batch["query_input_ids"].shape[0] == 5


def test_to_paired_per_language_dirs(tmp_path):
    corpus = tmp_path / "corpus.jsonl.gz"
    _write_corpus(str(corpus), n=20, lang=["en", "de"])
    out = tmp_path / "multi"
    shard_tools([
        "to_paired", "--input", str(corpus), "--output_dir", str(out),
        "--split_title_text", "--lang_col", "lang", "--shard_size", "100",
        "--query_col", "query", "--document_col", "document",
    ])
    assert sorted(os.listdir(out)) == ["de", "en"]
    with gzip.open(out / "en" / "shard-00000.jsonl.gz", "rt") as f:
        assert sum(1 for _ in f) == 10


def test_filter_by_ids_and_predicates(tmp_path, capsys):
    src = tmp_path / "src"
    src.mkdir()
    for s in range(2):
        with gzip.open(src / f"shard-0000{s}.jsonl.gz", "wt") as f:
            for i in range(10):
                gid = s * 10 + i
                f.write(json.dumps({"query": f"q{gid}", "document": "d" * (gid + 1)}) + "\n")
    ids_dir = tmp_path / "ids"
    ids_dir.mkdir()
    keep = [0, 3, 12, 19]
    (ids_dir / "ids_to_keep_0.json").write_text(json.dumps(keep))
    out = tmp_path / "filtered"
    shard_tools([
        "filter", "--input_dir", str(src), "--output_dir", str(out),
        "--ids_dir", str(ids_dir),
    ])
    rows = []
    for s in sorted(os.listdir(out)):
        with gzip.open(out / s, "rt") as f:
            rows += [json.loads(x) for x in f]
    assert [r["query"] for r in rows] == ["q0", "q3", "q12", "q19"]

    # predicate filter: min_chars on document drops the short rows
    out2 = tmp_path / "filtered2"
    shard_tools([
        "filter", "--input_dir", str(src), "--output_dir", str(out2),
        "--min_chars", "15", "--require_cols", "document",
    ])
    rows2 = []
    for s in sorted(os.listdir(out2)):
        with gzip.open(out2 / s, "rt") as f:
            rows2 += [json.loads(x) for x in f]
    assert len(rows2) == 6  # gids 14..19 have len(document) >= 15

    # drop-list inverts
    out3 = tmp_path / "filtered3"
    shard_tools([
        "filter", "--input_dir", str(src), "--output_dir", str(out3),
        "--ids_dir", str(ids_dir), "--drop",
    ])
    n3 = 0
    for s in sorted(os.listdir(out3)):
        with gzip.open(out3 / s, "rt") as f:
            n3 += sum(1 for _ in f)
    assert n3 == 16


def test_lengths_and_sizes(tmp_path, capsys):
    src = tmp_path / "src"
    src.mkdir()
    with gzip.open(src / "shard-00000.jsonl.gz", "wt") as f:
        for i in range(8):
            f.write(json.dumps({"document": "x" * (10 * (i + 1))}) + "\n")
    shard_tools(["lengths", "--input_dir", str(src), "--column", "document"])
    out = capsys.readouterr().out
    assert "8 rows" in out and "p50=" in out

    shard_tools(["sizes", str(src)])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {str(src): 8}
