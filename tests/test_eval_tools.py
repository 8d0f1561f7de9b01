"""Eval post-processing tools: LoCo -> BEIR converters and MTEB result
tools (reference: eval/loco_data.py, eval/mteb_eval/)."""

import json
import os

import numpy as np
import pytest


def test_loco_scrolls_converter(tmp_path):
    from datasets import Dataset, DatasetDict
    from contrastors_tpu.eval.loco_data import export_beir_dir, load_scrolls

    dd = DatasetDict(
        {
            "validation": Dataset.from_dict(
                {
                    "input": [f"long document {i} " * 5 for i in range(6)],
                    "output": [f"summary {i}" for i in range(6)],
                }
            )
        }
    )
    src = str(tmp_path / "gov_report")
    dd.save_to_disk(src)
    corpus, queries, qrels = load_scrolls(src)
    assert len(corpus) == len(queries) == len(qrels) == 6
    assert qrels["Query_3"] == {"Passage_3": 1}
    assert queries["Query_2"] == "summary 2"

    out = export_beir_dir(corpus, queries, qrels, str(tmp_path / "beir"))
    lines = open(os.path.join(out, "corpus.jsonl")).read().splitlines()
    assert len(lines) == 6 and json.loads(lines[0])["_id"] == "Passage_0"
    qrel_lines = open(os.path.join(out, "qrels.tsv")).read().splitlines()
    assert "Query_0\tPassage_0\t1" in qrel_lines

    # the exported dir round-trips through the in-train retrieval eval format
    from contrastors_tpu.eval.retrieval import evaluate_retrieval

    class ToyEnc:
        def encode_queries(self, texts, **kw):
            return self._emb(texts)

        def encode_corpus(self, docs, **kw):
            return self._emb([d["text"] if isinstance(d, dict) else d for d in docs])

        def _emb(self, texts):
            out = np.zeros((len(texts), 8), np.float32)
            for i, t in enumerate(texts):
                for j, tok in enumerate(t.split()[:8]):
                    out[i, hash(tok) % 8] += 1
            return out / (np.linalg.norm(out, axis=1, keepdims=True) + 1e-6)

    corpus2 = {
        json.loads(l)["_id"]: json.loads(l) for l in open(os.path.join(out, "corpus.jsonl"))
    }
    queries2 = {json.loads(l)["_id"]: json.loads(l)["text"] for l in open(os.path.join(out, "queries.jsonl"))}
    res = evaluate_retrieval(ToyEnc(), corpus2, queries2, qrels, ks=(1,))
    assert 0.0 <= res["ndcg@1"] <= 1.0


def test_loco_qasper_full_text():
    from contrastors_tpu.eval.loco_data import qasper_full_text

    body = qasper_full_text(
        {
            "section_name": ["Intro", None, "Methods"],
            "paragraphs": [["a b", "c"], ["floating"], []],
        }
    )
    assert "Intro\na b c" in body
    assert "floating" in body
    assert body.endswith("Methods")


def _write_result(d, task, scores):
    with open(os.path.join(d, f"{task}.json"), "w") as f:
        json.dump({"mteb_dataset_name": task, "test": scores}, f)


def test_merge_cqadupstack_and_score_table(tmp_path):
    from contrastors_tpu.eval.mteb_tools import (
        CQADUPSTACK_SUBSETS,
        merge_cqadupstack,
        score_table,
    )

    d = str(tmp_path / "results")
    os.makedirs(d)
    for i, t in enumerate(CQADUPSTACK_SUBSETS):
        _write_result(d, t, {"ndcg_at_10": 0.30 + i * 0.01, "recall_at_100": 0.5})
    _write_result(d, "NFCorpus", {"ndcg_at_10": 0.35})
    _write_result(d, "STSBenchmark", {"cos_sim": {"spearman": 0.85}})
    _write_result(d, "Banking77Classification", {"accuracy": 0.80})

    path = merge_cqadupstack(d)
    merged = json.load(open(path))
    np.testing.assert_allclose(
        merged["test"]["ndcg_at_10"], np.mean([0.30 + i * 0.01 for i in range(12)])
    )

    table = score_table(d)
    # 12 subsets fold into 1 merged task: 4 tasks total
    assert table["n_tasks"] == 4
    assert "CQADupstackRetrieval" in table["per_task"]
    assert abs(table["per_task"]["STSBenchmark"] - 0.85) < 1e-9
    assert abs(table["per_type"]["classification"] - 0.80) < 1e-9
    expect_avg = np.mean([merged["test"]["ndcg_at_10"], 0.35, 0.85, 0.80])
    assert abs(table["average"] - expect_avg) < 1e-9


def test_merge_cqadupstack_refuses_partial(tmp_path):
    from contrastors_tpu.eval.mteb_tools import CQADUPSTACK_SUBSETS, merge_cqadupstack

    d = str(tmp_path / "partial")
    os.makedirs(d)
    for t in CQADUPSTACK_SUBSETS[:5]:
        _write_result(d, t, {"ndcg_at_10": 0.3})
    with pytest.raises(FileNotFoundError, match="subsets missing"):
        merge_cqadupstack(d)


def test_mteb_meta_yaml(tmp_path):
    from contrastors_tpu.eval.mteb_tools import mteb_meta

    d = str(tmp_path / "res")
    os.makedirs(d)
    _write_result(d, "NFCorpus", {"ndcg_at_10": 0.35})
    path = mteb_meta(d, "org/my-model")
    text = open(path).read()
    assert text.startswith("---")
    assert "name: my-model" in text
    assert "MTEB NFCorpus" in text
    assert "35.0000" in text


def test_ndcg_linear_gain_matches_trec_eval():
    """nDCG uses trec_eval's LINEAR gain (pytrec_eval / BEIR convention):
    a rel-2 doc at rank 1 over a rel-1 doc at rank 2 -> hand-computed
    value; the exponential 2^g-1 variant would differ on graded qrels."""
    from contrastors_tpu.eval.metrics import ndcg_at_k

    ranked = [["d1", "d2", "d3"]]
    rel = [{"d1": 1, "d2": 2}]
    # dcg = 1/log2(2) + 2/log2(3); idcg = 2/log2(2) + 1/log2(3)
    dcg = 1.0 + 2.0 / np.log2(3)
    idcg = 2.0 + 1.0 / np.log2(3)
    np.testing.assert_allclose(ndcg_at_k(ranked, rel, k=10), dcg / idcg, rtol=1e-9)
