"""CLI surface (python -m skosconverter_spark), mirroring the reference
argparse commands (skos_converter.py:1586-1701)."""

from __future__ import annotations

import pytest

from skosconverter_spark.__main__ import build_parser, run

from .conftest import DATA, load_golden_bytes


def test_parser_surface_matches_reference():
    p = build_parser()
    for cmd in ("to-csv", "to-markdown", "to-json", "to-xml", "to-skos"):
        # every subcommand parses its reference flag set
        args = p.parse_args([cmd, "in.x", "--output", "o"])
        assert args.command == cmd
    a = p.parse_args(
        ["to-csv", "v.ttl", "--force", "--skip-validation", "--language", "fr",
         "--fallback-languages", "en", "nl", "--batch-dir", "d", "--output-dir", "o"]
    )
    assert a.force and a.skip_validation and a.language == "fr"
    assert a.fallback_languages == ["en", "nl"]
    s = p.parse_args(["to-skos", "n.md", "--namespace", "urn:x#", "--prefix", "x"])
    assert s.namespace == "urn:x#" and s.prefix == "x"


def test_cli_to_csv_golden(spark, tmp_path):
    out = tmp_path / "basic"
    rc = run(
        ["to-csv", str(DATA / "vocab_basic.ttl"), "--output", str(out)],
        spark=spark,
    )
    assert rc == 0
    assert (tmp_path / "basic.csv").read_bytes() == load_golden_bytes(
        "vocab_basic", "out.csv"
    )


def test_cli_validation_gate(spark, tmp_path):
    out = tmp_path / "selfref"
    rc = run(
        ["to-markdown", str(DATA / "vocab_selfref.ttl"), "--output", str(out)],
        spark=spark,
    )
    assert rc == 1 and not (tmp_path / "selfref.md").exists()
    rc = run(
        ["to-markdown", str(DATA / "vocab_selfref.ttl"), "--output", str(out),
         "--force"],
        spark=spark,
    )
    assert rc == 0
    assert (tmp_path / "selfref.md").read_bytes() == load_golden_bytes(
        "vocab_selfref", "out.md"
    )


def test_cli_to_skos_roundtrip(spark, tmp_path):
    rc = run(
        ["to-skos", str(DATA / "md_basic.md"), "--output", str(tmp_path / "rt")],
        spark=spark,
    )
    assert rc == 0
    text = (tmp_path / "rt.ttl").read_text(encoding="utf-8")
    assert "skos:Concept" in text or "skos:prefLabel" in text


def test_cli_rejects_dead_markdown_styles(spark):
    rc = run(["to-markdown", "x.md", "--markdown-style", "bullets"], spark=spark)
    assert rc == 1


def test_cli_missing_input(spark):
    rc = run(["to-csv", "/nonexistent/file.ttl"], spark=spark)
    assert rc == 1


def test_cli_prints_reference_import_hints(spark, tmp_path, capsys):
    rc = run(
        ["to-csv", str(DATA / "vocab_basic.ttl"), "--output", str(tmp_path / "h")],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Conversion to CSV complete!" in out
    assert "• Use 'Title' column as the main identifier" in out

    rc = run(
        ["to-skos", str(DATA / "md_basic.md"), "--output", str(tmp_path / "s")],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "✅ Notion to SKOS conversion complete!" in out
    assert "- Missing definitions replaced with 'Lorem ipsum'" in out
