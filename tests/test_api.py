"""High-level API: batch directory conversion — every ttl fixture
converted in ONE job, each output byte-identical to its golden; the
validation gate (D7); reverse batch to a pred-partitioned triples table."""

from __future__ import annotations

import pytest

from skosconverter_spark.api import (
    ValidationError,
    convert_directory,
    notion_to_skos,
    skos_to_notion,
)
from skosconverter_spark.config import EngineConfig
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples

from .conftest import (
    DATA,
    load_fixture_text,
    load_golden_bytes,
    md_fixture_names,
    ttl_fixture_names,
)

# reference's own sibling order for vocab_dup is a hash-seed artifact
AMBIGUOUS = {"vocab_dup"}


def test_batch_convert_matches_goldens(spark, tmp_path):
    out = str(tmp_path / "out")
    status = convert_directory(spark, str(DATA), out, fmt="csv", operation="skos2notion")
    rows = {r.url: r.status for r in status.collect()}
    assert all(s == "ok" for s in rows.values())
    for name in ttl_fixture_names():
        got = (tmp_path / "out" / f"{name}.csv").read_bytes()
        golden = load_golden_bytes(name, "out.csv")
        if name in AMBIGUOUS:
            assert sorted(got.splitlines()) == sorted(golden.splitlines()), name
        else:
            assert got == golden, name


def test_batch_reverse_writes_graph_table(spark, tmp_path):
    out = str(tmp_path / "rev")
    status = convert_directory(
        spark, str(DATA), out, operation="notion2skos",
        config=EngineConfig(bug_compat=False),
    )
    assert status.filter("status = 'error'").count() == 0
    triples = spark.read.parquet(f"{out}/triples")
    assert triples.count() > 0
    assert "pred" in triples.columns


def test_validation_gate_raises_and_forces(spark):
    docs = spark.createDataFrame(
        [("v", "v", "ttl", load_fixture_text("vocab_selfref"))], schema=DOCS
    )
    triples = ok_triples(extract_triples(docs, EngineConfig())).cache()
    with pytest.raises(ValidationError) as exc:
        skos_to_notion(triples, "csv")
    assert any("itself as broader" in i for i in exc.value.issues)
    text, issues, _ = skos_to_notion(triples, "csv", force=True)
    assert text.startswith("Title,") and issues
    text2, issues2, _ = skos_to_notion(triples, "csv", skip_validation=True)
    assert text2 == text and issues2 == []
    triples.unpersist()


def test_notion_to_skos_api(spark):
    docs = spark.createDataFrame(
        [(n, n, "md", load_fixture_text(n)) for n in md_fixture_names()], schema=DOCS
    )
    triples, errors = notion_to_skos(docs, EngineConfig(bug_compat=True))
    assert errors.count() == 0
    assert triples.count() > 0


def test_driver_size_guards_trip(spark):
    """render.py:guard_driver_sized — misusing a driver-sized path on a
    corpus-sized table fails loudly instead of OOMing the driver."""
    from skosconverter_spark.operators.export import export_turtle_text
    from skosconverter_spark.operators.render import (
        collect_triples,
        guard_driver_sized,
        render_document_text,
    )

    big = spark.range(50).selectExpr(
        "cast(id as string) subj", "'p' pred", "'o' obj",
        "true obj_is_literal", "cast(null as string) obj_lang",
        "'u' src_url", "id seq",
    )
    with pytest.raises(ValueError, match="gated at 10 rows"):
        guard_driver_sized(big, "test", 10)
    with pytest.raises(ValueError):
        collect_triples(big, max_rows=10)
    with pytest.raises(ValueError):
        export_turtle_text(big, max_rows=10)
    # under the gate: passes through
    assert len(collect_triples(big.limit(5), max_rows=10)) == 5
    # render path: the guard fires before any row is pulled to the driver
    with pytest.raises(ValueError):
        render_document_text(big.selectExpr("subj"), "csv", max_rows=10)
