"""Validator parity: the engine's 11 checks must produce the same
issue/warning strings the reference produced (goldens = actual
reference runs). Compared as MULTISETS: the reference enumerates Python
sets whose order is a hash-seed artifact; content (including the first
5/10 truncation counts and exact formatting) must match."""

from __future__ import annotations

from collections import Counter

import pytest

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.operators.validate import gate, validation_report
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples

from .conftest import load_fixture_text, load_golden_json, ttl_fixture_names


@pytest.mark.parametrize("name", ttl_fixture_names())
def test_validation_matches_golden(spark, name):
    docs = spark.createDataFrame(
        [(name, name, "ttl", load_fixture_text(name))], schema=DOCS
    )
    triples = ok_triples(extract_triples(docs, EngineConfig())).cache()
    issues, warnings = validation_report(triples, EngineConfig())
    golden = load_golden_json(name, "validation.json")
    assert Counter(issues) == Counter(golden["issues"]), f"{name} issues"
    assert Counter(warnings) == Counter(golden["warnings"]), f"{name} warnings"
    triples.unpersist()


def test_gate_semantics():
    # D7 (skos_converter.py:1789-1798): errors abort unless forced/skipped
    assert gate([], force=False)
    assert not gate(["boom"], force=False)
    assert gate(["boom"], force=True)
    assert gate(["boom"], skip_validation=True)
