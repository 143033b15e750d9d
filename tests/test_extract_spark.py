"""Spark triple-extraction stage: all fixture documents in ONE DataFrame
through the Arrow-batched mapInPandas stage — per-doc parity, per-doc
error isolation, and seq/dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.metrics import canonicalize, precision_recall
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.parse_udf import doc_errors, extract_triples, ok_triples

from .conftest import (
    load_fixture_text,
    load_golden_json,
    md_fixture_names,
    ttl_fixture_names,
)


def _docs_df(spark, names, fmt):
    rows = [(n, n, fmt, load_fixture_text(n)) for n in names]
    return spark.createDataFrame(rows, schema=DOCS)


def test_extract_all_ttl_fixtures_one_job(spark):
    docs = _docs_df(spark, ttl_fixture_names(), "ttl")
    extracted = extract_triples(docs, EngineConfig()).cache()
    ok = ok_triples(extracted)
    rows = ok.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.src_url, []).append(
            (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang)
        )
    for name in ttl_fixture_names():
        golden = canonicalize(load_golden_json(name, "triples.json"))
        assert canonicalize(by_doc[name]) == golden, name
    assert doc_errors(extracted).count() == 0
    extracted.unpersist()


def test_extract_md_bugcompat_pr(spark):
    docs = _docs_df(spark, md_fixture_names(), "md")
    ok = ok_triples(extract_triples(docs, EngineConfig(bug_compat=True)))
    rows = ok.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r.src_url, []).append(
            (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang)
        )
    for name in md_fixture_names():
        golden = load_golden_json(name, "triples_bugcompat.json")
        p, r_ = precision_recall(by_doc.get(name, []), golden)
        assert p == 1.0 and r_ == 1.0, f"{name}: P={p} R={r_}"


def test_extract_error_isolation(spark):
    rows = [
        ("good", "good", "ttl", load_fixture_text("vocab_basic")),
        ("bad", "bad", "ttl", "not } turtle at all ."),
    ]
    docs = spark.createDataFrame(rows, schema=DOCS)
    extracted = extract_triples(docs, EngineConfig()).cache()
    errs = doc_errors(extracted).collect()
    assert len(errs) == 1 and errs[0].url == "bad" and "turtle" in errs[0].error
    assert ok_triples(extracted).filter(F.col("src_url") == "good").count() > 0
    extracted.unpersist()


def test_seq_preserves_document_order(spark):
    docs = _docs_df(spark, ["vocab_basic"], "ttl")
    ok = ok_triples(extract_triples(docs, EngineConfig()))
    ordered = [
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang)
        for r in ok.orderBy("seq").collect()
    ]
    golden = [
        (g["subj"], g["pred"], g["obj"], g["obj_is_literal"], g["obj_lang"])
        for g in load_golden_json("vocab_basic", "triples.json")
    ]
    assert ordered == golden
