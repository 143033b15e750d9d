"""Benchmark decontamination for training-data pipelines.

The published method (Brown et al. 2020 §C "Measuring and Preventing
Memorization Of Benchmarks"; also Chowdhery et al. 2022 §7): a training
document is contaminated iff it shares at least one word n-gram (GPT-3
used 13-grams) with any document of an evaluation set. Exact n-gram
overlap — not fuzzy similarity — is the industry gate because it is
cheap, deterministic and auditable.

Plan shape at 100 TB: the EVAL side is tiny (benchmarks are thousands
of documents, the corpus is billions), so its distinct-shingle set is
broadcast — the corpus is scanned ONCE, shingled, and hash-joined with
no shuffle of corpus rows at all. The output is the contaminated-doc
list (doc_id, n_shared), which downstream drops with a broadcast
anti-join. Tokenization and shingling reuse the dedup operators'
normalize/split/zip_with machinery (operators/dedup.py), so the
decontamination gate and the dedup gate agree on what a "token" is.

Reference scope note: proycon/skosConverter has no corpus operators;
this extends the engine for the pretraining-pipeline tier (SURVEY.md
§2 extension block), value-checked against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skosconverter_spark.operators.dedup import doc_shingles

N_DECONTAM = 8  # word n-gram length of the overlap gate


def contaminated_docs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = N_DECONTAM,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shared): corpus documents sharing >= 1 word n-gram with
    the eval set, with the count of distinct shared n-grams.

    The eval shingle set is deduplicated across eval documents and
    broadcast: the join adds no shuffle on the corpus side."""
    corpus_sh = doc_shingles(corpus, text_col, n)
    eval_sh = (
        doc_shingles(eval_docs, text_col, n).select("shingle").distinct()
    )
    return (
        corpus_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    n: int = N_DECONTAM,
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus contaminated documents (broadcast anti-join on
    the contaminated-id list — eval-sized, tiny)."""
    hits = contaminated_docs(corpus, eval_docs, n, text_col).select("doc_id")
    return corpus.join(F.broadcast(hits), "doc_id", "left_anti")
