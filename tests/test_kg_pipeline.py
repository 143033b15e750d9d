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


def test_pipeline_unpersisted_intermediates_identical(spark, pages, vocab, tmp_path):
    """persist_intermediate=False keeps 20_mentions/40_page_triples
    executor-local: same results, lineage metrics still present, and no
    parquet checkpoint written for those stages."""
    persisted = run_pipeline(
        spark, pages, vocab, str(tmp_path / "kg_p"), partitions=4
    )
    local = run_pipeline(
        spark,
        pages,
        vocab,
        str(tmp_path / "kg_l"),
        partitions=4,
        persist_intermediate=False,
    )
    key = lambda df: sorted(
        (r.subj, r.pred, r.obj, r.obj_lang) for r in df.collect()
    )
    assert key(local["triples"]) == key(persisted["triples"])
    assert local["links"].count() == persisted["links"].count()
    for stage in ("20_mentions", "40_page_triples"):
        base = tmp_path / "kg_l" / stage
        assert not (base / "data").exists()
        assert not (base / "_MANIFEST.json").exists()
        assert (base / "metrics").exists()
    stages = {r.stage for r in local["metrics"].select("stage").distinct().collect()}
    assert {"10_extract", "20_mentions", "30_links", "40_page_triples", "50_canonical"} <= stages


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


def test_catalog_adapter_seam(spark, pages, vocab, tmp_path):
    """StageRunner delegates storage/commit to a CatalogAdapter: an
    explicit parquet adapter behaves like the default, and the Iceberg
    adapter fails loudly (not silently) without a configured catalog."""
    import pytest as _pytest

    from skosconverter_spark.kg.catalog import (
        IcebergCatalogAdapter,
        ParquetCatalogAdapter,
    )
    from skosconverter_spark.kg.pipeline import StageRunner, fingerprint_of

    runner = StageRunner(
        spark, str(tmp_path / "kg"), catalog=ParquetCatalogAdapter(codec="snappy")
    )
    fp = fingerprint_of(pages, ["url"])
    out = runner.run_stage("10_extract", fp, lambda: pages.select("url"))
    assert out.count() == pages.count()
    # commit recorded -> second call loads instead of rebuilding
    calls = []
    out2 = runner.run_stage(
        "10_extract", fp, lambda: calls.append(1) or pages.select("url")
    )
    assert out2.count() == pages.count() and not calls
    # lineage came from the adapter's commit metadata
    assert runner.stage_metrics().count() > 0

    ice = StageRunner(spark, str(tmp_path / "ice"), catalog=IcebergCatalogAdapter())
    with _pytest.raises(NotImplementedError, match="requires catalog"):
        ice.run_stage("10_extract", fp, lambda: pages.select("url"))


def test_pipeline_adversarial_pages(spark, vocab, tmp_path):
    """Nulls, empties, and a pathological page must not break the
    pipeline: null html -> empty text; empty text -> no mentions; a
    500 KB single page flows through the Arrow stages."""
    import datetime as dt

    from skosconverter_spark.schemas import PAGES

    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("http://x.test/null-html", ts, None, None, "en"),
        ("http://x.test/empty-html", ts, b"", None, "en"),
        ("http://x.test/huge", ts,
         ("<html><body>" + "<p>the dog saw the dog. </p>" * 20000 + "</body></html>").encode(),
         None, "en"),
        ("http://x.test/no-vocab", ts, b"<html><body><p>zzz qqq</p></body></html>", None, None),
    ]
    pages = spark.createDataFrame(rows, PAGES)
    out = run_pipeline(spark, pages, vocab, str(tmp_path / "kg_adv"), partitions=2)
    texts = {r.url: r.text for r in out["pages_text"].collect()}
    assert set(texts) == {r[0] for r in rows}
    # contract: null html -> null text, empty html -> "" (both flow
    # through the scan/parse stages, which skip falsy text)
    assert texts["http://x.test/null-html"] is None
    assert texts["http://x.test/empty-html"] == ""
    assert len(texts["http://x.test/huge"]) > 100_000
    # mentions only on the page that contains vocabulary
    urls_with_mentions = {r.url for r in out["mentions"].select("url").distinct().collect()}
    assert urls_with_mentions == {"http://x.test/huge"}
    assert out["triples"].count() > 0  # vocabulary triples survive canonicalization
