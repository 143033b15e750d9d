"""Structured Streaming ingestion over the pages table (SURVEY.md §2.12).

The reference is a batch CLI; the engine keeps every stage a pure
``DataFrame → DataFrame`` function, which makes streaming reuse
trivial: ``readStream`` on the pages directory → the SAME
extract/mention/triple stages inside ``foreachBatch`` → parquet sinks.
Late data is handled with a ``warc_ts`` watermark; the windowed
page-rate aggregate demonstrates stateful streaming (update mode).

Batch-first remains the posture (resumability comes from stage
checkpoints, not streaming state — SURVEY §2.12); this module is the
continuous-ingestion face of the same pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.kg.extract import extract_text
from skosconverter_spark.schemas import PAGES
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a growing directory of pages parquet files."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def page_rate_per_hour(pages_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window page counts per lang — the windowed
    aggregation + late-data shape of Structured Streaming."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )


def stream_triples(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
) -> StreamingQuery:
    """Continuous pages → triples: each micro-batch runs the identical
    batch stages (extract_text → markdown triple extraction → dedup) and
    writes to a parquet triples sink. Exactly-once = streaming checkpoint
    (no batch replayed after commit) + idempotent batch writes: each
    micro-batch OVERWRITES its own ``batch_id=N`` subdirectory, so a
    retry after a partial/failed write replaces the partial output
    instead of appending duplicates. Readers ``spark.read.parquet(out_dir)``
    and discover batch_id as a partition column."""
    cfg = config or EngineConfig()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = extract_text(batch_df).select(
            "url", F.lit("md").alias("fmt"), F.col("text").alias("payload")
        )
        triples = ok_triples(extract_triples(docs, cfg))
        triples.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
