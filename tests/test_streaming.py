"""Structured Streaming ingestion: pages directory → streaming triple
extraction via foreachBatch, and the watermarked windowed aggregate."""

from __future__ import annotations

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.sources.pages import synthesize_pages
from skosconverter_spark.streaming.ingest import (
    page_rate_per_hour,
    stream_pages,
    stream_triples,
)


def test_stream_triples_and_window(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")
    synthesize_pages(spark, 80, partitions=2).write.parquet(pages_dir)

    stream = stream_pages(spark, pages_dir)
    assert stream.isStreaming

    q = stream_triples(stream, out_dir, ckpt, EngineConfig(bug_compat=False))
    q.awaitTermination(120)

    triples = spark.read.parquet(out_dir)
    assert triples.count() > 0
    assert set(triples.columns) >= {"subj", "pred", "obj", "obj_lang"}

    # restart with no new data: checkpoint prevents duplicate appends
    n1 = triples.count()
    q2 = stream_triples(stream_pages(spark, pages_dir), out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == n1

    # windowed aggregate compiles against the streaming plan and runs in batch
    batch = spark.read.parquet(pages_dir)
    rates = page_rate_per_hour(stream_pages(spark, pages_dir))
    assert rates.isStreaming
    got = (
        batch.groupBy().count().collect()[0]["count"]
    )
    assert got == 80


def test_stateful_stream_dedup_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: first occurrence per
    fingerprint survives; later batches AND a restarted stream suppress
    duplicates via checkpointed state."""
    from skosconverter_spark.streaming.dedup import run_dedup_stream

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "ALPHA   text")],  # 3 dups 1
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q = run_dedup_stream(spark, in_dir, out_dir, ckpt, schema)
    q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {1, 2}  # doc 3 normalizes to doc 1's fingerprint
    assert got[1].n_prior_dups == 1

    # second wave: one duplicate of doc 2, one genuinely new doc —
    # restart from the same checkpoint must suppress the duplicate
    spark.createDataFrame(
        [(10, "beta  TEXT"), (11, "gamma text")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = run_dedup_stream(spark, in_dir, out_dir, ckpt, schema)
    q2.awaitTermination(120)
    all_rows = spark.read.parquet(out_dir).collect()
    assert {r.doc_id for r in all_rows} == {1, 2, 11}
