"""End-to-end MTEB harness run (round-2 VERDICT missing #1 / next #4): the
REAL eval_mteb.main run loop executes over all six task types via the
offline mini_mteb runner, writes mteb-shaped result JSONs, and the
mteb_tools score table + model-card metadata consume them."""

import json
import os

import numpy as np
import pytest

from contrastors_tpu.eval import mini_mteb
from contrastors_tpu.eval.mini_mteb import (
    average_precision,
    kmeans,
    softmax_regression,
    spearman,
    v_measure,
)

from test_trainer_e2e import make_checkpoint_dir


# ---- metric kernels vs known values ---------------------------------------


def test_spearman_known_values():
    a = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    assert spearman(a, a * 10 + 3) == pytest.approx(1.0)
    assert spearman(a, -a) == pytest.approx(-1.0)
    # ties are average-ranked (scipy.rankdata): rho([1,2,2,3],[1,2,3,4])
    assert spearman(
        np.array([1.0, 2.0, 2.0, 3.0]), np.array([1.0, 2.0, 3.0, 4.0])
    ) == pytest.approx(0.9486832980505138)


def test_average_precision_known_values():
    # ranked [1,0,1]: AP = (1/1 + 2/3) / 2
    s = np.array([3.0, 2.0, 1.0])
    y = np.array([1, 0, 1])
    assert average_precision(s, y) == pytest.approx((1.0 + 2.0 / 3.0) / 2)
    assert average_precision(s, np.array([0, 0, 0])) == 0.0


def test_v_measure_known_values():
    y = np.array([0, 0, 1, 1])
    assert v_measure(y, np.array([1, 1, 0, 0])) == pytest.approx(1.0)  # relabel-invariant
    assert v_measure(y, np.array([0, 0, 0, 0])) == pytest.approx(0.0)


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.05, (20, 4)), rng.normal(5, 0.05, (20, 4))])
    a = kmeans(x, 2, seed=1)
    assert v_measure(np.array([0] * 20 + [1] * 20), a) == pytest.approx(1.0)


def test_softmax_regression_separable():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(-2, 0.1, (30, 8)), rng.normal(2, 0.1, (30, 8))])
    y = np.array(["a"] * 30 + ["b"] * 30)
    pred = softmax_regression(x, y, x)
    assert (pred == y).mean() == 1.0


# ---- task data builders ----------------------------------------------------


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _sent(rng, group=None):
    base = rng.integers(0, 100, size=4) if group is None else (group * 10 + rng.integers(0, 5, size=4)) % 100
    return " ".join(f"word{int(x)}" for x in base)


def make_mteb_data(root):
    rng = np.random.default_rng(0)
    # retrieval (BEIR): identical query/doc text => perfect ranking expected
    d = root / "SciFact"
    d.mkdir(parents=True)
    texts = [_sent(rng) for _ in range(12)]
    _write_jsonl(d / "corpus.jsonl", [{"_id": f"d{i}", "title": "", "text": t} for i, t in enumerate(texts)])
    _write_jsonl(d / "queries.jsonl", [{"_id": f"q{i}", "text": texts[i]} for i in range(6)])
    with open(d / "qrels.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(6):
            f.write(f"q{i}\td{i}\t1\n")

    # sts: identical pairs scored 5, disjoint pairs 0
    d = root / "STSBenchmark"
    d.mkdir()
    rows = []
    for i in range(8):
        t = _sent(rng)
        rows.append({"sentence1": t, "sentence2": t, "score": 5.0})
        rows.append({"sentence1": _sent(rng), "sentence2": _sent(rng), "score": 0.0})
    _write_jsonl(d / "pairs.jsonl", rows)

    # classification: two word-disjoint classes
    d = root / "Banking77Classification"
    d.mkdir()
    mk = lambda n: [{"text": _sent(rng, group=g), "label": int(g)} for g in (0, 7) for _ in range(n)]
    _write_jsonl(d / "train.jsonl", mk(8))
    _write_jsonl(d / "test.jsonl", mk(4))

    # clustering: same two groups
    d = root / "TwentyNewsgroupsClustering"
    d.mkdir()
    _write_jsonl(d / "docs.jsonl", [{"text": _sent(rng, group=g), "label": int(g)} for g in (0, 7) for _ in range(8)])

    # pair classification: duplicates vs non-duplicates
    d = root / "SprintDuplicateQuestions"
    d.mkdir()
    rows = []
    for i in range(8):
        t = _sent(rng)
        rows.append({"sentence1": t, "sentence2": t, "label": 1})
        rows.append({"sentence1": _sent(rng), "sentence2": _sent(rng), "label": 0})
    _write_jsonl(d / "pairs.jsonl", rows)

    # reranking: positive == query text
    d = root / "SciDocsRR"
    d.mkdir()
    rows = []
    for i in range(4):
        q = _sent(rng)
        rows.append({"query": q, "positive": [q], "negative": [_sent(rng), _sent(rng)]})
    _write_jsonl(d / "samples.jsonl", rows)

    return [
        "SciFact", "STSBenchmark", "Banking77Classification",
        "TwentyNewsgroupsClustering", "SprintDuplicateQuestions", "SciDocsRR",
    ]


def test_eval_mteb_main_end_to_end(tmp_path):
    """eval_mteb.main's run-loop lines execute for real over all six task
    types; the score table and model-card metadata build from the output."""
    ckpt = make_checkpoint_dir(tmp_path)
    tasks = make_mteb_data(tmp_path / "mteb_data")
    out = str(tmp_path / "results")

    from contrastors_tpu.eval.eval_mteb import main as mteb_main

    mteb_main([
        "--model_name", ckpt,
        "--seq_len", "16",
        "--batch_size", "8",
        "--local_data_dir", str(tmp_path / "mteb_data"),
        "--output_dir", out,
        "--tasks", *tasks,
    ])

    from contrastors_tpu.eval.mteb_tools import mteb_meta, score_table

    table = score_table(out)
    assert set(table["per_task"]) == set(tasks)
    assert len(table["per_type"]) == 6
    assert np.isfinite(table["average"])
    # identical-text retrieval must be perfect; every score in range
    assert table["per_task"]["SciFact"] == pytest.approx(1.0)
    assert table["per_task"]["SciDocsRR"] == pytest.approx(1.0)
    for v in table["per_task"].values():
        assert -1.0 <= v <= 1.0

    readme = mteb_meta(out, "contrastors-tpu-test")
    assert os.path.exists(readme)
    assert "MTEB SciFact" in open(readme).read()


def test_mini_mteb_matryoshka_binarize_variants(tmp_path):
    """The harness composes with the Encoder's matryoshka/binarize flags
    (reference eval_mteb.py --binarize/--matryoshka_dim CLI surface)."""
    ckpt = make_checkpoint_dir(tmp_path)
    tasks = ["SciFact"]
    root = tmp_path / "mteb_data"
    make_mteb_data(root)
    from contrastors_tpu.eval.eval_mteb import main as mteb_main

    out = str(tmp_path / "res_matryoshka")
    mteb_main([
        "--model_name", ckpt, "--seq_len", "16", "--batch_size", "8",
        "--local_data_dir", str(root), "--output_dir", out,
        "--tasks", *tasks, "--matryoshka_dim", "16",
    ])
    payload = json.load(open(os.path.join(out, "SciFact.json")))
    assert payload["test"]["ndcg_at_10"] == pytest.approx(1.0)
