"""Web-scale KG pipeline stages on the synthesized pages corpus:
extraction invariant, mention detection known answers, linking,
canonicalization closure, checkpoint/resume, lineage metrics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from skosconverter_spark.config import EngineConfig, OWL_SAME_AS, SKOS_EXACT_MATCH
from skosconverter_spark.kg.canonicalize import (
    canonicalize_triples,
    connected_components,
    equivalence_edges,
    transitive_closure,
)
from skosconverter_spark.kg.extract import extract_text
from skosconverter_spark.kg.mentions import mention_candidates, scan_mentions
from skosconverter_spark.kg.pipeline import run_pipeline
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.pages import VOCAB_CONCEPTS, page_record, synthesize_pages
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples

N_PAGES = 120


def vocab_ttl() -> str:
    lines = ["@prefix skos: <http://www.w3.org/2004/02/skos/core#> ."]
    ns = "http://example.org/kg#"
    lines.append(f"<{ns}scheme> a skos:ConceptScheme ; skos:prefLabel \"Things\"@en .")
    for key, label, alts in VOCAB_CONCEPTS:
        lines.append(f'<{ns}{key}> a skos:Concept ; skos:prefLabel "{label}"@en .')
        for a in alts:
            lines.append(f'<{ns}{key}> skos:altLabel "{a}" .')
    return "\n".join(lines)


@pytest.fixture(scope="module")
def pages(spark):
    return synthesize_pages(spark, N_PAGES, partitions=4).cache()


@pytest.fixture(scope="module")
def vocab(spark):
    docs = spark.createDataFrame([("v", "v", "ttl", vocab_ttl())], schema=DOCS)
    return ok_triples(extract_triples(docs, EngineConfig())).cache()


def test_pages_deterministic_and_skewed(pages, spark):
    again = synthesize_pages(spark, N_PAGES, partitions=7)  # different partitioning
    a = {r.url: (r.text, bytes(r.html)) for r in pages.collect()}
    b = {r.url: (r.text, bytes(r.html)) for r in again.collect()}
    assert a == b
    domains = (
        pages.withColumn("d", F.split_part(F.col("url"), F.lit("/"), F.lit(3)))
        .groupBy("d").count().collect()
    )
    counts = sorted((r["count"] for r in domains), reverse=True)
    assert counts[0] >= 4 * counts[-1]  # Zipf skew present


def test_extract_text_byte_identical_per_url(pages):
    extracted = {r.url: r.text for r in extract_text(pages).collect()}
    for i in range(N_PAGES):
        rec = page_record(i)
        assert extracted[rec["url"]] == rec["_expected_text"], rec["url"]
        # the invariant the harness checks: stable sha256 per url
        assert hashlib.sha256(extracted[rec["url"]].encode()).hexdigest()


def test_mentions_find_known_concepts(spark, pages, vocab):
    pt = extract_text(pages)
    cands = mention_candidates(scan_mentions(pt, vocab), vocab)
    got = {
        (r.url, r.concept_uri.rsplit("#", 1)[1])
        for r in cands.select("url", "concept_uri").distinct().collect()
    }
    for i in range(N_PAGES):
        rec = page_record(i)
        for key in rec["_concepts"]:
            assert (rec["url"], key) in got, f"missing mention {key} in {rec['url']}"


def test_multiword_and_altlabel_mentions(spark, vocab):
    pt = spark.createDataFrame(
        [("u1", "A canine and a feline met; Mammalia rejoiced.")], "url string, text string"
    )
    cands = mention_candidates(scan_mentions(pt, vocab), vocab)
    keys = {r.concept_uri.rsplit("#", 1)[1] for r in cands.collect()}
    assert {"dog", "cat", "mammal"} <= keys


def test_connected_components_and_closure(spark):
    rows = [
        ("a", SKOS_EXACT_MATCH, "b"),
        ("b", OWL_SAME_AS, "c"),
        ("x", SKOS_EXACT_MATCH, "y"),
    ]
    t = spark.createDataFrame(
        [(s, p, o, False, None, "u", i) for i, (s, p, o) in enumerate(rows)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, src_url string, seq long",
    )
    comp = {r.uri: r.component for r in connected_components(equivalence_edges(t)).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"

    edges = spark.createDataFrame(
        [("c1", "p1"), ("p1", "g1"), ("g1", "r1")], "child string, parent string"
    )
    reach = {(r.descendant, r.ancestor) for r in transitive_closure(edges).collect()}
    assert ("c1", "r1") in reach and ("c1", "g1") in reach and len(reach) == 6


def test_canonicalize_rewrites_aliases(spark):
    P = "http://example.org/p#knows"
    rows = [
        ("a", SKOS_EXACT_MATCH, "b", False),
        ("b", P, "z", False),
        ("a", P, "z", False),
    ]
    t = spark.createDataFrame(
        [(s, p, o, lit, None, "u", i) for i, (s, p, o, lit) in enumerate(rows)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, src_url string, seq long",
    )
    out = canonicalize_triples(t)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    # b collapses into a; duplicate edges dedup; self-loop equivalence dropped
    assert got == {("a", P, "z")}


def test_pipeline_end_to_end_and_resume(spark, pages, vocab, tmp_path):
    root = str(tmp_path / "kg")
    out = run_pipeline(spark, pages, vocab, root, partitions=4)
    assert out["links"].count() > 0
    assert out["triples"].count() > 0
    # per-partition lineage metrics exist for every stage
    stages = {r.stage for r in out["metrics"].select("stage").distinct().collect()}
    assert {"10_extract", "20_mentions", "30_links", "40_page_triples", "50_canonical"} <= stages

    # resume: second run must reuse checkpoints (same fingerprints)
    import time

    t0 = time.time()
    out2 = run_pipeline(spark, pages, vocab, root, partitions=4)
    resume_s = time.time() - t0
    assert out2["triples"].count() == out["triples"].count()
    assert resume_s < 30, f"resume took {resume_s:.1f}s — checkpoints not reused?"


def test_salted_repartition_bounds_skew(spark, pages):
    from skosconverter_spark.kg.extract import salted_repartition

    # the corpus is domain-skewed (test_pages_deterministic_and_skewed:
    # the hottest domain holds ≥4x the coldest's rows); after salted
    # url-hash repartitioning every partition must sit near the mean
    salted = salted_repartition(pages, 8)
    salt_sizes = [
        r["count"]
        for r in salted.groupBy(F.spark_partition_id().alias("p")).count().collect()
    ]
    mean = sum(salt_sizes) / len(salt_sizes)
    assert max(salt_sizes) <= 1.6 * mean, f"salted partitions skewed: {salt_sizes}"
    assert min(salt_sizes) >= 0.4 * mean, f"salted partitions skewed: {salt_sizes}"
