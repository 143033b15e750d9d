"""Pure-Python kernel parity: the per-document parse kernels must emit
exactly the triples the reference emits (goldens produced by executing
the reference; tools/gen_golden.py). No Spark session needed — these
kernels are what runs inside the Arrow batches."""

from __future__ import annotations

import pytest

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.metrics import canonicalize, precision_recall
from skosconverter_spark.sources.markdown_parse import parse_markdown
from skosconverter_spark.sources.turtle import parse_turtle

from .conftest import (
    load_fixture_text,
    load_golden_json,
    md_fixture_names,
    ttl_fixture_names,
)


def golden_keyset(fixture: str, filename: str):
    return canonicalize(load_golden_json(fixture, filename))


@pytest.mark.parametrize("name", ttl_fixture_names())
def test_turtle_kernel_matches_golden(name):
    triples = parse_turtle(load_fixture_text(name))
    ours = canonicalize(
        [(t.subj, t.pred, t.obj, t.obj_is_literal, t.obj_lang) for t in triples]
    )
    assert ours == golden_keyset(name, "triples.json")


@pytest.mark.parametrize("name", ttl_fixture_names())
def test_turtle_kernel_preserves_statement_order(name):
    # seq-order downstream picks depend on file order being preserved
    triples = parse_turtle(load_fixture_text(name))
    golden = load_golden_json(name, "triples.json")
    ours = [(t.subj, t.pred, t.obj, t.obj_is_literal, t.obj_lang) for t in triples]
    theirs = [
        (g["subj"], g["pred"], g["obj"], g["obj_is_literal"], g["obj_lang"])
        for g in golden
    ]
    assert ours == theirs


@pytest.mark.parametrize("mode", ["bugcompat", "fixed"])
@pytest.mark.parametrize("name", md_fixture_names())
def test_markdown_kernel_pr(name, mode):
    cfg = EngineConfig(bug_compat=(mode == "bugcompat"))
    triples = parse_markdown(load_fixture_text(name), cfg)
    ours = [(t.subj, t.pred, t.obj, t.obj_is_literal, t.obj_lang) for t in triples]
    golden = load_golden_json(name, f"triples_{mode}.json")
    p, r = precision_recall(ours, golden)
    assert p == 1.0 and r == 1.0, (
        f"{name}/{mode}: P={p:.3f} R={r:.3f}\n"
        f"ours-only={sorted(canonicalize(ours) - canonicalize(golden))[:5]}\n"
        f"golden-only={sorted(canonicalize(golden) - canonicalize(ours))[:5]}"
    )


def test_turtle_kernel_rejects_garbage():
    with pytest.raises(ValueError):
        parse_turtle("this is } not turtle .")
