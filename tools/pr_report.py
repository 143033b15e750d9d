"""Corpus-level triple P/R report — the BASELINE.json scored metric.

Runs the engine's markdown→SKOS extraction over the whole round-trip
fixture corpus (both bug-compat and fixed modes) and the turtle parser
over every forward fixture, scores each against the golden triples the
reference actually emitted, and prints one JSON line:

    {"pr_bugcompat": {"precision": .., "recall": ..}, ...}

The P/R >= 0.95 gate scores bug-compat mode (SURVEY §2.10 D1).

Usage: python tools/pr_report.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from skosconverter_spark.config import EngineConfig  # noqa: E402
from skosconverter_spark.metrics import canonicalize  # noqa: E402
from skosconverter_spark.sources.markdown_parse import parse_markdown  # noqa: E402
from skosconverter_spark.sources.turtle import parse_turtle  # noqa: E402

GOLDEN = REPO / "tests" / "golden"
DATA = REPO / "tests" / "fixtures" / "data"


def corpus_pr(pairs):
    """Micro-averaged P/R over (ours, golden) triple-set pairs."""
    tp = fp = fn = 0
    for ours, golden in pairs:
        a, b = canonicalize(ours), canonicalize(golden)
        tp += len(a & b)
        fp += len(a - b)
        fn += len(b - a)
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    return {"precision": round(p, 4), "recall": round(r, 4), "tp": tp, "fp": fp, "fn": fn}


def main():
    manifest = json.loads((GOLDEN / "MANIFEST.json").read_text())
    md_names = [n for n, m in manifest["fixtures"].items() if m["kind"] == "md"]
    ttl_names = [n for n, m in manifest["fixtures"].items() if m["kind"] == "ttl"]

    def md_pairs(mode: str):
        cfg = EngineConfig(bug_compat=(mode == "bugcompat"))
        for n in md_names:
            ours = [
                (t.subj, t.pred, t.obj, t.obj_is_literal, t.obj_lang)
                for t in parse_markdown((DATA / f"{n}.md").read_text(), cfg)
            ]
            golden = json.loads((GOLDEN / n / f"triples_{mode}.json").read_text())
            yield ours, golden

    def ttl_pairs():
        for n in ttl_names:
            ours = [
                (t.subj, t.pred, t.obj, t.obj_is_literal, t.obj_lang)
                for t in parse_turtle((DATA / f"{n}.ttl").read_text())
            ]
            golden = json.loads((GOLDEN / n / "triples.json").read_text())
            yield ours, golden

    report = {
        "corpus": {"md_fixtures": len(md_names), "ttl_fixtures": len(ttl_names)},
        "pr_bugcompat": corpus_pr(md_pairs("bugcompat")),
        "pr_fixed": corpus_pr(md_pairs("fixed")),
        "pr_turtle": corpus_pr(ttl_pairs()),
        "gate": "P/R >= 0.95 on bug-compat round-trip corpus (BASELINE.json)",
    }
    ok = (
        report["pr_bugcompat"]["precision"] >= 0.95
        and report["pr_bugcompat"]["recall"] >= 0.95
    )
    report["pass"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
