"""Bridge: the harness's TPC-H-ish tables → a SKOS triple graph.

The driver's correctness gate runs each query against a DuckDB oracle
over the same parquet tables, so the SKOS engine's graph operators
(views, hierarchy fixpoint, closure, validator checks) are exercised on
a vocabulary derived deterministically from region/nation:

- each region is a ConceptScheme (prefLabel = r_name)
- each nation is a Concept (prefLabel = n_name, inScheme its region)
- nations with n_nationkey % 7 == 3 are ORPHANS (inScheme only)
- the remaining nations form a broader-chain per region in n_nationkey
  order: the first is the scheme's top concept (hasTopConcept +
  topConceptOf), each later one is broader of its predecessor
- nations with n_nationkey % 11 == 5 get an EXTRA broader edge to the
  region's top concept (polyhierarchy material)
- multilingual labels: prefLabel@en = n_name, prefLabel@fr =
  lower(n_name), altLabel (untagged) = n_name || '-alt'

Every rule is one SQL expression, so the DuckDB oracles in
__spark_entry__ mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from skosconverter_spark.config import (
    RDF_TYPE,
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_PREF_LABEL,
    SKOS_TOP_CONCEPT_OF,
)

NATION_URI = "urn:tpch:nation:"
REGION_URI = "urn:tpch:region:"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _frames(spark: SparkSession, sf_dir: str):
    """(region, nation, chain) — the shared bridge frames."""
    region = load(spark, sf_dir, "region").select(
        F.concat(F.lit(REGION_URI), F.col("r_regionkey")).alias("scheme"),
        F.col("r_name"),
        F.col("r_regionkey").cast("long").alias("rkey"),
    )
    nation = load(spark, sf_dir, "nation").select(
        F.concat(F.lit(NATION_URI), F.col("n_nationkey")).alias("uri"),
        F.col("n_name"),
        F.col("n_nationkey").cast("long").alias("nkey"),
        F.col("n_regionkey").cast("long").alias("rkey"),
    )
    nation = nation.join(region.select("rkey", "scheme", "r_name"), "rkey")
    eligible = nation.filter(F.col("nkey") % 7 != 3)
    w = Window.partitionBy("rkey").orderBy("nkey")
    chain = eligible.withColumn("pos", F.row_number().over(w)).withColumn(
        "prev_uri", F.lag("uri").over(w)
    )
    return region, nation, chain


def _t(df, subj, pred, obj, lit=False, lang=None, seq=None):
    return df.select(
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(bool(lit)).alias("obj_is_literal"),
        (F.lit(lang) if lang else F.lit(None)).cast("string").alias("obj_lang"),
        F.lit("tpch").alias("src_url"),
        (seq if seq is not None else F.lit(0)).cast("long").alias("seq"),
    )


def triples_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bridge vocabulary as a triples DataFrame (with seq)."""
    region, nation, chain = _frames(spark, sf_dir)
    t = _t

    parts = [
        t(region, F.col("scheme"), RDF_TYPE, F.lit(SKOS_CONCEPT_SCHEME), seq=F.col("rkey")),
        t(region, F.col("scheme"), SKOS_PREF_LABEL, F.col("r_name"), lit=True, lang="en", seq=F.col("rkey") + 100),
        t(nation, F.col("uri"), RDF_TYPE, F.lit(SKOS_CONCEPT), seq=F.col("nkey") + 1000),
        t(nation, F.col("uri"), SKOS_PREF_LABEL, F.col("n_name"), lit=True, lang="en", seq=F.col("nkey") + 2000),
        t(nation, F.col("uri"), SKOS_PREF_LABEL, F.lower(F.col("n_name")), lit=True, lang="fr", seq=F.col("nkey") + 3000),
        t(nation, F.col("uri"), SKOS_ALT_LABEL, F.concat(F.col("n_name"), F.lit("-alt")), lit=True, seq=F.col("nkey") + 4000),
        t(nation, F.col("uri"), SKOS_IN_SCHEME, F.col("scheme"), seq=F.col("nkey") + 5000),
    ]
    tops = chain.filter(F.col("pos") == 1)
    parts += [
        t(tops, F.col("scheme"), SKOS_HAS_TOP_CONCEPT, F.col("uri"), seq=F.col("nkey") + 6000),
        t(tops, F.col("uri"), SKOS_TOP_CONCEPT_OF, F.col("scheme"), seq=F.col("nkey") + 7000),
    ]
    rest = chain.filter(F.col("pos") > 1)
    parts.append(
        t(rest, F.col("uri"), SKOS_BROADER, F.col("prev_uri"), seq=F.col("nkey") + 8000)
    )
    # extra broader to the region's top concept → polyhierarchy
    top_by_region = tops.select("rkey", F.col("uri").alias("top_uri"))
    poly = (
        rest.filter(F.col("nkey") % 11 == 5)
        .join(top_by_region, "rkey")
        .filter(F.col("prev_uri") != F.col("top_uri"))
    )
    parts.append(
        t(poly, F.col("uri"), SKOS_BROADER, F.col("top_uri"), seq=F.col("nkey") + 9000)
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


GHOST_URI = "urn:tpch:ghost:"
CYC_URI = "urn:tpch:cyc:"


def dirty_triples_from_tpch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clean bridge plus deterministically planted defects, one SQL
    rule each, so every validator check (operators/validate.py, reference
    skos_converter.py:104-411) has non-empty output a DuckDB oracle can
    re-derive:

    - nkey % 13 == 1 → nation ALSO typed ConceptScheme (duplicate URI)
    - nkey % 9 == 2  → unlabeled, schemeless Concept urn:tpch:ghost:nkey
      (missing label + no inScheme + validator orphan)
    - nkey % 6 == 0  → second @en prefLabel n_name || '-bis'
    - nkey % 17 == 4 → broader self-edge
    - nkey % 5 == 1  → untagged prefLabel 'SHARED-' || (nkey % 2)
      (duplicate labels across concepts)
    - chain pos == 2 → hasTopConcept with no inverse (missing_top_of);
      pos == 3 → topConceptOf with no inverse (missing_has_top)
    - chain gets NARROWER mirror edges (prev narrower cur) so hierarchy
      depth from each top slot (pos 1..3) is elig_count − pos + 1
    - per region, a labeled in-scheme 3-cycle urn:tpch:cyc:rkey:0→1→2→0
      over broader (circular reference; reported rotation starts at the
      min-type_seq member, :0)

    Used ONLY by the skos_val_* driver queries; the clean bridge backs
    everything else."""
    region, nation, chain = _frames(spark, sf_dir)
    t = _t
    nkey = F.col("nkey")
    parts = [triples_from_tpch(spark, sf_dir)]

    dup_typed = nation.filter(nkey % 13 == 1)
    parts.append(
        t(dup_typed, F.col("uri"), RDF_TYPE, F.lit(SKOS_CONCEPT_SCHEME), seq=nkey + 20000)
    )
    shared = nation.filter(nkey % 5 == 1)
    parts.append(
        t(shared, F.col("uri"), SKOS_PREF_LABEL,
          F.concat(F.lit("SHARED-"), nkey % 2), lit=True, seq=nkey + 21000)
    )
    multi = nation.filter(nkey % 6 == 0)
    parts.append(
        t(multi, F.col("uri"), SKOS_PREF_LABEL,
          F.concat(F.col("n_name"), F.lit("-bis")), lit=True, lang="en",
          seq=nkey + 22000)
    )
    ghost = nation.filter(nkey % 9 == 2).withColumn(
        "ghost_uri", F.concat(F.lit(GHOST_URI), nkey)
    )
    parts.append(
        t(ghost, F.col("ghost_uri"), RDF_TYPE, F.lit(SKOS_CONCEPT), seq=nkey + 23000)
    )
    selfs = nation.filter(nkey % 17 == 4)
    parts.append(
        t(selfs, F.col("uri"), SKOS_BROADER, F.col("uri"), seq=nkey + 24000)
    )
    pos2 = chain.filter(F.col("pos") == 2)
    parts.append(
        t(pos2, F.col("scheme"), SKOS_HAS_TOP_CONCEPT, F.col("uri"), seq=nkey + 25000)
    )
    pos3 = chain.filter(F.col("pos") == 3)
    parts.append(
        t(pos3, F.col("uri"), SKOS_TOP_CONCEPT_OF, F.col("scheme"), seq=nkey + 26000)
    )
    rest = chain.filter(F.col("pos") > 1)
    parts.append(
        t(rest, F.col("prev_uri"), SKOS_NARROWER, F.col("uri"), seq=nkey + 27000)
    )
    rkey = F.col("rkey")
    for i in range(3):
        cyc_i = F.concat(F.lit(CYC_URI), rkey, F.lit(f":{i}"))
        cyc_next = F.concat(F.lit(CYC_URI), rkey, F.lit(f":{(i + 1) % 3}"))
        parts += [
            t(region, cyc_i, RDF_TYPE, F.lit(SKOS_CONCEPT), seq=rkey * 10 + i + 30000),
            t(region, cyc_i, SKOS_BROADER, cyc_next, seq=rkey * 10 + i + 31000),
            t(region, cyc_i, SKOS_PREF_LABEL,
              F.concat(F.lit("Cycle "), rkey, F.lit(f"-{i}")), lit=True, lang="en",
              seq=rkey * 10 + i + 32000),
            t(region, cyc_i, SKOS_IN_SCHEME, F.col("scheme"), seq=rkey * 10 + i + 33000),
        ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# the SQL building blocks oracles share (DuckDB dialect)
ORACLE_CHAIN_CTE = """
elig AS (
  SELECT n_nationkey AS nkey, n_name, n_regionkey AS rkey
  FROM nation WHERE n_nationkey % 7 != 3
),
chain AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY rkey ORDER BY nkey) AS pos,
         LAG(nkey) OVER (PARTITION BY rkey ORDER BY nkey) AS prev_nkey,
         LAG(n_name) OVER (PARTITION BY rkey ORDER BY nkey) AS prev_name
  FROM elig
)
"""
