"""Differential test: the driver-local DFS kernel and the distributed
min-path fixpoint must render byte-identical documents on every ttl
fixture — so the fast path can never drift from the scale path."""

from __future__ import annotations

import pytest

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.operators.render import (
    document_rows,
    render_document_text,
    render_text_local,
)
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples

from .conftest import load_fixture_text, ttl_fixture_names


@pytest.mark.parametrize("fmt", ["csv", "md", "json", "xml"])
def test_local_equals_distributed(spark, fmt):
    cfg = EngineConfig()
    for name in ttl_fixture_names():
        docs = spark.createDataFrame(
            [(name, name, "ttl", load_fixture_text(name))], schema=DOCS
        )
        triples = ok_triples(extract_triples(docs, cfg)).cache()
        local = render_text_local(triples, fmt, cfg)
        dist = render_document_text(document_rows(triples, cfg), fmt)
        assert local == dist, f"{name}/{fmt}: strategies diverge"
        triples.unpersist()
