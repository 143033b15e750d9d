"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[32], single JVM); the same
settings are what we would submit with ``spark-submit --py-files`` on a
real cluster — AQE on, Arrow on, UTC session timezone (duckdb-oracle
comparability), shuffle partitions sized to cores rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "skosconverter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # size shuffles to parallelism; AQE coalesces small ones at runtime
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalesce floor defaults to 1m, which collapses small-byte
        # but CPU-dense shuffle stages (k×md5 minhash signatures over short
        # docs: 29 s of task CPU squeezed onto 10 of 32 cores — measured
        # r6) down to a handful of tasks. A 64k floor lets such stages keep
        # core-count parallelism; at production data volumes partitions are
        # far above either floor, so the setting is inert there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # allow joins to co-partition on a SUBSET of the join keys when
        # both sides already share that partitioning (e.g. url-keyed
        # mention tables joining on (url, concept_uri)): the default
        # true forces a full-key re-shuffle of both sides, which costs
        # two exchanges + sorts per such join (measured r6 in the
        # links scoring DAG). The guard the default provides — skew
        # when the subset key is coarse — does not apply here: every
        # deliberate subset key in this engine (url, doc_id) is a
        # uniform high-cardinality key by design, and AQE skew-join
        # handling stays on regardless.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
