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
