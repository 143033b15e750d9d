"""Deterministic large-vocabulary synthesizer (bench + scale tests).

Generates a SKOS vocabulary as a triples DataFrame directly (no files):
``n_schemes`` schemes, each a ``branching``-ary tree of ``depth``
levels. Pure function of the concept id — generated executor-side from
spark.range, so a million-concept vocabulary synthesizes in parallel.

Shape matches what the reference was measured on in BASELINE.md
(22,100 concepts / 176,808 triples → ~8 triples per concept): every
concept gets type, prefLabel(en), altLabel, definition, inScheme,
broader+narrower to its parent; tree roots are top concepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skosconverter_spark.config import (
    RDF_TYPE,
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_PREF_LABEL,
    SKOS_TOP_CONCEPT_OF,
)

NS = "urn:bench:"


def synthesize_vocab(
    spark: SparkSession,
    n_concepts: int,
    n_schemes: int = 4,
    branching: int = 10,
) -> DataFrame:
    """Triples for a deterministic forest vocabulary of ``n_concepts``."""
    ids = spark.range(0, n_concepts).select(F.col("id").cast("long"))
    scheme = F.concat(F.lit(NS + "scheme"), (F.col("id") % n_schemes))
    uri = F.concat(F.lit(NS + "c"), F.col("id"))
    # forest: scheme s owns ids ≡ s (mod n_schemes); within a scheme the
    # j-th concept's parent is the floor((j-1)/branching)-th — a
    # branching-ary tree whose root (j=0, the first n_schemes ids) is the
    # scheme's top concept
    s = F.col("id") % n_schemes
    j = (F.col("id") - s) / n_schemes
    pj = F.floor((j - 1) / branching)
    parent_id = pj.cast("long") * n_schemes + s
    is_root = F.col("id") < n_schemes
    parent_uri = F.concat(F.lit(NS + "c"), parent_id.cast("long"))
    label = F.concat(F.lit("Concept "), F.lpad(F.col("id").cast("string"), 9, "0"))

    base = ids.select(
        "id", uri.alias("uri"), scheme.alias("scheme"), is_root.alias("is_root"),
        parent_uri.alias("parent_uri"), label.alias("label"),
    )

    def t(df, subj, pred, obj, lit=False, lang=None, seq_off=0):
        return df.select(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(bool(lit)).alias("obj_is_literal"),
            (F.lit(lang) if lang else F.lit(None)).cast("string").alias("obj_lang"),
            F.lit("bench").alias("src_url"),
            (F.col("id") * 10 + seq_off).alias("seq"),
        )

    c = F.col("uri")
    parts = [
        t(base, c, RDF_TYPE, F.lit(SKOS_CONCEPT), seq_off=0),
        t(base, c, SKOS_PREF_LABEL, F.col("label"), lit=True, lang="en", seq_off=1),
        t(base, c, SKOS_ALT_LABEL, F.concat(F.col("label"), F.lit(" alias")), lit=True, seq_off=2),
        t(base, c, SKOS_DEFINITION, F.concat(F.lit("Definition of "), F.col("label")), lit=True, lang="en", seq_off=3),
        t(base, c, SKOS_IN_SCHEME, F.col("scheme"), seq_off=4),
        t(base.filter(~F.col("is_root")), c, SKOS_BROADER, F.col("parent_uri"), seq_off=5),
        t(base.filter(~F.col("is_root")), F.col("parent_uri"), SKOS_NARROWER, c, seq_off=6),
        t(base.filter(F.col("is_root")), F.col("scheme"), SKOS_HAS_TOP_CONCEPT, c, seq_off=7),
        t(base.filter(F.col("is_root")), c, SKOS_TOP_CONCEPT_OF, F.col("scheme"), seq_off=8),
    ]
    schemes_df = (
        ids.filter(F.col("id") < n_schemes)
        .select("id", F.concat(F.lit(NS + "scheme"), F.col("id")).alias("uri"))
    )
    parts.append(
        t(schemes_df, F.col("uri"), RDF_TYPE, F.lit(SKOS_CONCEPT_SCHEME), seq_off=0)
    )
    parts.append(
        t(
            schemes_df,
            F.col("uri"),
            SKOS_PREF_LABEL,
            F.concat(F.lit("Scheme "), F.col("id").cast("string")),
            lit=True,
            lang="en",
            seq_off=1,
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # the 11-branch union multiplies spark.range's parallelism into ~11×
    # cores partitions of a few hundred rows each; driver-side consumers
    # (collect_triples, localCheckpoint) then pay task dispatch 11× over.
    # coalesce (narrow, no shuffle) folds the branches back to one task
    # per core.
    return out.coalesce(spark.sparkContext.defaultParallelism)
