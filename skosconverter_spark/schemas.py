"""Canonical DataFrame schemas (SURVEY.md §1.2)."""

from pyspark.sql import types as T

# The graph table — replaces the reference's in-memory rdflib.Graph
# (skos_converter.py:544, :1290). At scale this is written partitioned by
# `pred` and bucketed by `subj` so predicate-pattern scans prune and
# subject-keyed joins co-locate.
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_literal", T.BooleanType(), False),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("src_url", T.StringType(), True),
    ]
)

# Per-document conversion unit (reference analog: one input file of the
# batch loop, skos_converter.py:488-499).
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("fmt", T.StringType(), False),  # 'ttl' | 'md' | 'jsonld'
        T.StructField("payload", T.StringType(), True),
    ]
)

# Input corpus for the web-scale pipeline (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("norm_surface", T.StringType(), False),
        T.StructField("begin", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

STAGE_METRICS = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("input_fingerprint", T.StringType(), True),
    ]
)
