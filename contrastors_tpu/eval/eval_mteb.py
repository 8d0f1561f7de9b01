"""MTEB evaluation harness (reference: eval/mteb_eval/eval_mteb.py:18-186).

Requires the `mteb` package (not baked into this image) — the adapter and
task/prefix maps are ready; the run loop raises a clear error offline.

Usage: python -m contrastors_tpu.eval.eval_mteb --model_name=<local dir> \
           [--seq_len 512] [--binarize] [--matryoshka_dim 256]
"""

import argparse

TASK_LIST_CLASSIFICATION = [
    "AmazonCounterfactualClassification",
    "AmazonPolarityClassification",
    "AmazonReviewsClassification",
    "Banking77Classification",
    "EmotionClassification",
    "ImdbClassification",
    "MassiveIntentClassification",
    "MassiveScenarioClassification",
    "MTOPDomainClassification",
    "MTOPIntentClassification",
    "ToxicConversationsClassification",
    "TweetSentimentExtractionClassification",
]
TASK_LIST_CLUSTERING = [
    "ArxivClusteringP2P",
    "ArxivClusteringS2S",
    "BiorxivClusteringP2P",
    "BiorxivClusteringS2S",
    "MedrxivClusteringP2P",
    "MedrxivClusteringS2S",
    "RedditClustering",
    "RedditClusteringP2P",
    "StackExchangeClustering",
    "StackExchangeClusteringP2P",
    "TwentyNewsgroupsClustering",
]
TASK_LIST_PAIR_CLASSIFICATION = [
    "SprintDuplicateQuestions",
    "TwitterSemEval2015",
    "TwitterURLCorpus",
]
TASK_LIST_RERANKING = [
    "AskUbuntuDupQuestions",
    "MindSmallReranking",
    "SciDocsRR",
    "StackOverflowDupQuestions",
]
TASK_LIST_RETRIEVAL = [
    "ArguAna",
    "ClimateFEVER",
    "CQADupstackAndroidRetrieval",
    "CQADupstackEnglishRetrieval",
    "CQADupstackGamingRetrieval",
    "CQADupstackGisRetrieval",
    "CQADupstackMathematicaRetrieval",
    "CQADupstackPhysicsRetrieval",
    "CQADupstackProgrammersRetrieval",
    "CQADupstackStatsRetrieval",
    "CQADupstackTexRetrieval",
    "CQADupstackUnixRetrieval",
    "CQADupstackWebmastersRetrieval",
    "CQADupstackWordpressRetrieval",
    "DBPedia",
    "FEVER",
    "FiQA2018",
    "HotpotQA",
    "MSMARCO",
    "NFCorpus",
    "NQ",
    "QuoraRetrieval",
    "SCIDOCS",
    "SciFact",
    "Touche2020",
    "TRECCOVID",
]
TASK_LIST_STS = [
    "BIOSSES",
    "SICK-R",
    "STS12",
    "STS13",
    "STS14",
    "STS15",
    "STS16",
    "STS17",
    "STS22",
    "STSBenchmark",
    "SummEval",
]
TASK_LIST = (
    TASK_LIST_CLASSIFICATION
    + TASK_LIST_CLUSTERING
    + TASK_LIST_PAIR_CLASSIFICATION
    + TASK_LIST_RERANKING
    + TASK_LIST_RETRIEVAL
    + TASK_LIST_STS
)

# per-task-type prefixes (reference eval_mteb.py:145-162)
TYPE2PREFIX = {
    "classification": "classification",
    "clustering": "clustering",
    "pair_classification": "classification",
    "reranking": "classification",
    "retrieval": ("search_query", "search_document"),
    "sts": "classification",
}


def task_prefixes(task_name: str):
    if task_name in TASK_LIST_RETRIEVAL:
        return TYPE2PREFIX["retrieval"]
    if task_name in TASK_LIST_CLUSTERING:
        p = TYPE2PREFIX["clustering"]
    else:
        p = "classification"
    return (p, p)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", required=True)
    parser.add_argument("--seq_len", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--binarize", action="store_true")
    parser.add_argument("--matryoshka_dim", type=int, default=None)
    parser.add_argument("--output_dir", default="mteb_results")
    parser.add_argument("--tasks", nargs="*", default=None)
    parser.add_argument(
        "--local_data_dir", default=None,
        help="run tasks from local data via the offline mini_mteb runner "
        "(<dir>/<TaskName>/ — see eval/mini_mteb.py) instead of the mteb pkg",
    )
    args = parser.parse_args(argv)

    if args.local_data_dir:
        from contrastors_tpu.eval import mini_mteb as mteb

        mteb.set_data_dir(args.local_data_dir)
    else:
        try:
            import mteb
        except ImportError as e:
            raise SystemExit(
                "the `mteb` package is not installed in this image; either "
                "install mteb in a networked environment, or pass "
                "--local_data_dir to run the offline mini_mteb tasks."
            ) from e

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from contrastors_tpu.config import ModelArgs
    from contrastors_tpu.eval.encoder import Encoder
    from contrastors_tpu.models.auto import load_biencoder

    margs = ModelArgs(model_type="encoder", model_name=args.model_name, pooling="mean")
    module, params, _ = load_biencoder(margs, dtype=jnp.bfloat16)
    tokenizer = AutoTokenizer.from_pretrained(args.model_name)

    for task in args.tasks or TASK_LIST:
        qp, dp = task_prefixes(task)
        enc = Encoder(
            module, params, tokenizer,
            seq_len=args.seq_len, batch_size=args.batch_size,
            query_prefix=qp, document_prefix=dp,
            binarize=args.binarize, matryoshka_dim=args.matryoshka_dim,
        )
        evaluation = mteb.MTEB(tasks=[task], task_langs=["en"])
        evaluation.run(enc, output_folder=args.output_dir, eval_splits=["test"])


if __name__ == "__main__":
    main()
