"""Streaming cross-batch deduplication: a custom stateful operator.

The batch engine dedups a corpus in one shot (operators.dedup); a
continuously-ingesting pipeline must instead suppress documents whose
fingerprint arrived in ANY earlier micro-batch. Spark's built-in
``dropDuplicates`` on a stream keeps unbounded per-key state rows
managed opaquely; this operator makes the state explicit with
``applyInPandasWithState`` (the custom-stateful-operator seam of
SURVEY.md §2.12 / the task brief):

- stream is grouped by the md5 content fingerprint (same kernel as
  batch exact dedup, functions.text.fingerprint — so batch and stream
  agree on what "duplicate" means);
- per-group state is one small record ``(n_seen)``: whether (and how
  often) this fingerprint has ever been seen across batches; state
  lives in the streaming checkpoint, so a restart resumes suppression
  exactly where it stopped;
- output (append mode) is the FIRST document per fingerprint, chosen
  deterministically (min doc_id within the micro-batch that first
  carries the fingerprint).

At 100 TB the state store shards by the fingerprint hash across
executors (uniform by construction — md5), and each micro-batch
shuffles only its own rows: state size is O(distinct documents), the
same cardinality any exact dedup must hold somewhere.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from skosconverter_spark.functions.text import fingerprint

OUTPUT_SCHEMA = "fp string, doc_id long, text string, n_prior_dups long"
STATE_SCHEMA = "n_seen long"


def _keep_first(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    rows = [pdf for pdf in pdfs if len(pdf)]
    batch = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame()
    n_new = int(len(batch))
    (n_seen,) = state.get if state.exists else (0,)
    if n_seen == 0 and n_new > 0:
        first = batch.sort_values("doc_id").iloc[[0]].copy()
        first["fp"] = fp
        first["n_prior_dups"] = n_new - 1
        yield first[["fp", "doc_id", "text", "n_prior_dups"]]
    state.update((n_seen + n_new,))


def dedup_stream(docs_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """docs stream (doc_id, text, ...) → first-ever document per content
    fingerprint, exactly once across micro-batches AND restarts."""
    src = docs_stream.select(
        "doc_id",
        F.col(text_col).alias("text"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    return src.groupBy("fp").applyInPandasWithState(
        _keep_first,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark, input_dir: str, out_dir: str, checkpoint_dir: str, schema: Any
):
    """Wire the stateful dedup over a growing parquet directory and sink
    the survivors to parquet (idempotent batch_id-keyed writes, same
    pattern as streaming.ingest.stream_triples)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    deduped = dedup_stream(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
