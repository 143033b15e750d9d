"""Catalog seam: where stage outputs commit and how commits are named.

The north-rule deployment writes stage outputs as Iceberg table commits
and resumes by comparing input SNAPSHOT IDs; this sandbox has plain
parquet. ``StageRunner`` therefore talks to a ``CatalogAdapter`` and
never to the storage layer directly, so swapping parquet → Iceberg is
an adapter change, not a pipeline rewrite:

==================  ============================  =========================
concern             ParquetCatalogAdapter          IcebergCatalogAdapter
==================  ============================  =========================
stage output        <base>/data parquet files      table commit (snapshot)
commit record       <base>/_MANIFEST.json          snapshot summary props
input fingerprint   count:xor-hash of the input    input table snapshot id
per-part lineage    parquet FOOTER row counts      manifest-file row counts
partitioned sink    write.partitionBy(...)         partitioned + bucketed
                                                   table spec
==================  ============================  =========================

Both adapters expose the same five operations; everything else in
kg/pipeline.py is adapter-agnostic.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ParquetCatalogAdapter:
    """Stage persistence on a plain filesystem: parquet data + a JSON
    manifest as the commit record, footers as the lineage source."""

    codec: str = "zstd"

    def committed_fingerprint(self, base: Path) -> str | None:
        """The input fingerprint recorded by the last commit at this
        location, or None if never committed."""
        manifest = base / "_MANIFEST.json"
        if not manifest.exists():
            return None
        return json.loads(manifest.read_text()).get("input_fingerprint")

    def write(self, df: DataFrame, base: Path, partition_by: tuple[str, ...] = ()) -> None:
        w = df.write.mode("overwrite").option("compression", self.codec)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(base / "data"))

    def read(self, spark: SparkSession, base: Path) -> DataFrame:
        return spark.read.parquet(str(base / "data"))

    def partition_rows(self, base: Path) -> list[tuple[int, int]]:
        """(write_partition_id, rows) per output file, from parquet
        footers only — the Iceberg-manifest analogue: metadata reads,
        no Spark job, no second scan of the stage output."""
        import pyarrow.parquet as pq

        out = []
        for f in sorted((base / "data").glob("part-*.parquet")):
            out.append(
                (int(f.name.split("-")[1]), pq.ParquetFile(f).metadata.num_rows)
            )
        return out

    def commit(
        self, base: Path, stage: str, input_fingerprint: str, rows: int, wall_ms: int
    ) -> None:
        manifest = base / "_MANIFEST.json"
        manifest.parent.mkdir(parents=True, exist_ok=True)
        manifest.write_text(
            json.dumps(
                {
                    "stage": stage,
                    "input_fingerprint": input_fingerprint,
                    "rows": rows,
                    "wall_ms": wall_ms,
                },
                indent=2,
            )
        )


@dataclass
class IcebergCatalogAdapter:
    """The production shape: each stage is an Iceberg table under
    ``namespace``; a commit IS the snapshot, the resume fingerprint is
    read from the snapshot the stage was committed against, lineage
    comes from the snapshot's manifest entries. Requires an Iceberg
    catalog on the session (spark.sql.catalog.<name> configured with
    the iceberg runtime jar — not present in this sandbox, hence the
    guarded probe)."""

    namespace: str = "kg"
    catalog: str = "spark_catalog"

    _COMMIT_PROP = "skosconverter.input_fingerprint"

    def _table(self, base: Path) -> str:
        return f"{self.catalog}.{self.namespace}.{base.name}"

    def _require_iceberg(self, spark: SparkSession) -> None:
        if (
            spark.conf.get(f"spark.sql.catalog.{self.catalog}", None) is None
        ):  # pragma: no cover - sandbox has no iceberg runtime
            raise NotImplementedError(
                f"IcebergCatalogAdapter needs spark.sql.catalog.{self.catalog} "
                "configured with the Iceberg runtime; this environment has "
                "plain parquet only — use ParquetCatalogAdapter."
            )

    def committed_fingerprint(self, base: Path) -> str | None:  # pragma: no cover
        raise NotImplementedError(
            "read snapshot summary property "
            f"{self._COMMIT_PROP} of {self._table(base)} (requires catalog)"
        )

    def write(self, df: DataFrame, base: Path, partition_by: tuple[str, ...] = ()) -> None:  # pragma: no cover
        self._require_iceberg(df.sparkSession)
        w = df.writeTo(self._table(base)).using("iceberg")
        if partition_by:
            # one varargs call: DataFrameWriterV2.partitionedBy REPLACES the
            # partitioning each call, so a per-column loop would keep only
            # the last column of a multi-column spec
            from pyspark.sql import functions as F

            w = w.partitionedBy(*(F.col(c) for c in partition_by))
        w.createOrReplace()

    def read(self, spark: SparkSession, base: Path) -> DataFrame:  # pragma: no cover
        self._require_iceberg(spark)
        return spark.read.table(self._table(base))

    def partition_rows(self, base: Path) -> list[tuple[int, int]]:  # pragma: no cover
        raise NotImplementedError(
            f"SELECT file, record_count FROM {self._table(base)}.files "
            "(requires catalog)"
        )

    def commit(self, base: Path, stage: str, input_fingerprint: str, rows: int, wall_ms: int) -> None:  # pragma: no cover
        raise NotImplementedError(
            "ALTER TABLE ... SET TBLPROPERTIES on the committed snapshot "
            "(requires catalog)"
        )
