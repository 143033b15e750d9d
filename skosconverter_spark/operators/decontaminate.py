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


def fuzzy_contaminated_docs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(doc_id, eval_doc_id, jaccard): corpus documents NEAR-duplicating
    an eval document — the fuzzy complement to the exact n-gram gate
    (catches paraphrase-lite contamination: reformatted, re-punctuated
    or lightly edited benchmark text that shares no verbatim 8-gram).

    Same minhash+LSH machinery as the self-dedup (operators/dedup.py),
    pointed ACROSS two tables instead of at one: corpus band rows
    equi-join the broadcast eval band rows (eval sets are tiny — no
    corpus shuffle), candidates verify with exact shingle jaccard ≥ τ.
    A band-bucket match implies a shared min-shingle, so every candidate
    pair shares ≥ 1 shingle and the verify join is an inner join."""
    from skosconverter_spark.operators.dedup import doc_shingles, minhash_band_rows

    sh_c = doc_shingles(corpus, text_col).localCheckpoint(eager=True)
    sh_e = doc_shingles(eval_docs, text_col).localCheckpoint(eager=True)
    bc = minhash_band_rows(sh_c, k, bands)
    be = minhash_band_rows(sh_e, k, bands).select(
        F.col("doc_id").alias("eval_doc_id"), "band", "bucket"
    )
    candidates = (
        bc.join(F.broadcast(be), ["band", "bucket"])
        .select("doc_id", "eval_doc_id")
        .distinct()
        .localCheckpoint(eager=True)  # read twice below (semi + verify)
    )
    sets_c = (
        sh_c.join(candidates.select("doc_id").distinct(), "doc_id", "semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh_c"), F.count("*").alias("n_c"))
    )
    sets_e = sh_e.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sh_e"), F.count("*").alias("n_e")
    )
    common = F.size(F.array_intersect(F.col("sh_c"), F.col("sh_e")))
    jac = common.cast("double") / (
        F.col("n_c") + F.col("n_e") - common
    ).cast("double")
    return (
        candidates.join(sets_c, "doc_id")
        .join(
            F.broadcast(sets_e.select(F.col("doc_id").alias("eval_doc_id"), "sh_e", "n_e")),
            "eval_doc_id",
        )
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "eval_doc_id", "jaccard")
    )
