"""Golden-output generator: EXECUTES the reference converter.

Run with Python >= 3.12 (the reference needs PEP 701 f-strings)::

    PYTHONHASHSEED=0 /root/.pyenv/versions/3.12.1/bin/python3.12 tools/gen_golden.py

Produces, per vocabulary fixture under ``tests/golden/<name>/``:

- ``out.csv`` / ``out.md`` / ``out.json`` / ``out.xml`` — the
  reference's four forward sinks, byte-exact
- ``validation.json`` — the validator's issues/warnings lists
- ``triples.json`` — the input triples (for the engine's parser test)

and per markdown fixture:

- ``triples_bugcompat.json`` — triples from the reference's actual
  ``parse_markdown`` (scheme-propagation bug intact, SURVEY D1)
- ``triples_fixed.json`` — triples from the intended semantics,
  produced by driving the reference's own ``_process_concept_scheme``
  / ``_process_concept`` / ``_extract_metadata`` with the scheme
  variable propagated correctly
- the fixture source text itself under ``tests/fixtures/data/``

Also writes ``tests/golden/MANIFEST.json`` (sha256 of every golden).

Determinism: PYTHONHASHSEED=0 enforced; ``uuid.uuid4`` monkeypatched to
a counter.

KNOWN REFERENCE HANG: ``parse_markdown`` loops forever on a literal
``## Table of Contents`` line (skos_converter.py:1350-1353 returns the
cursor unchanged). For the md_toc fixture the bug-compat golden is
produced by the same line-driver used for fixed mode, with the scheme
bug preserved — noted in the manifest as ``"toc_workaround": true``.
"""

import hashlib
import json
import re
import sys
import uuid
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import fixture_defs  # noqa: E402
import rdflib_stub  # noqa: E402

rdflib_stub.install()
sys.path.insert(0, "/root/reference")
import skos_converter  # noqa: E402  (the reference, executed not copied)

from rdflib import Literal, URIRef  # resolves to the stub  # noqa: E402


def make_counter_uuid():
    state = {"n": 0}

    def fake_uuid4():
        state["n"] += 1
        return f"00000000-0000-4000-8000-{state['n']:012d}"

    return fake_uuid4


def build_graph(triples):
    g = rdflib_stub.Graph()
    for s, p, o, is_lit, lang in triples:
        obj = Literal(o, lang=lang) if is_lit else URIRef(o)
        g.add((URIRef(s), URIRef(p), obj))
    return g


def graph_to_json(graph):
    return [
        {
            "subj": str(s),
            "pred": str(p),
            "obj": str(o),
            "obj_is_literal": isinstance(o, rdflib_stub.Literal),
            "obj_lang": getattr(o, "language", None),
        }
        for s, p, o in graph
    ]


def run_forward(name, triples, outdir):
    cfg = skos_converter.ConverterConfig()
    conv = skos_converter.SKOSToNotionConverter(cfg)
    conv.graph = build_graph(triples)
    conv.to_notion_csv(str(outdir / "out.csv"))
    conv.to_notion_markdown(str(outdir / "out.md"))
    conv.to_notion_json(str(outdir / "out.json"))
    conv.to_xml(str(outdir / "out.xml"))
    validator = skos_converter.SKOSValidator(conv.graph)
    validator.validate_all()
    (outdir / "validation.json").write_text(
        json.dumps(
            {"issues": validator.issues, "warnings": validator.warnings},
            indent=2,
            ensure_ascii=False,
        )
    )
    (outdir / "triples.json").write_text(
        json.dumps(
            [
                {
                    "subj": s,
                    "pred": p,
                    "obj": o,
                    "obj_is_literal": lit,
                    "obj_lang": lang,
                }
                for s, p, o, lit, lang in triples
            ],
            indent=2,
            ensure_ascii=False,
        )
    )


def reset_uuid_counter():
    fake = make_counter_uuid()
    uuid.uuid4 = fake
    skos_converter.uuid.uuid4 = fake


def run_reverse_bugcompat(md_path):
    reset_uuid_counter()
    conv = skos_converter.NotionToSKOSConverter()
    conv.parse_markdown(str(md_path))
    return graph_to_json(conv.graph)


def run_reverse_driver(md_path, fix_scheme_bug):
    """Drive the reference's per-line methods with an external loop.

    Identical to parse_markdown's loop (skos_converter.py:1316-1338)
    except (a) the TOC skip actually advances past the TOC heading, and
    (b) when fix_scheme_bug, current_scheme propagates across lines
    (the intended semantics per :1958-1967).
    """
    reset_uuid_counter()
    conv = skos_converter.NotionToSKOSConverter()
    lines = md_path.read_text(encoding="utf-8").splitlines(keepends=True)
    current_scheme = None
    stack = []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("<!--"):
            i += 1
            continue
        if line == "## Table of Contents":
            i += 1
            while i < len(lines) and not lines[i].strip().startswith("#"):
                i += 1
            continue
        m = re.match(r"^(#+)\s+(.+)$", line)
        if m:
            level = len(m.group(1))
            title = conv._clean_title(m.group(2))
            if conv._should_skip_section(title):
                i += 1
                continue
            metadata = conv._extract_metadata(lines, i)
            if level == 1:
                current_scheme = conv._process_concept_scheme(title, metadata, stack)
                if not fix_scheme_bug:
                    current_scheme_effective = None
                else:
                    current_scheme_effective = current_scheme
            elif level >= 2:
                eff = current_scheme if fix_scheme_bug else None
                if eff:
                    conv._process_concept(title, metadata, level, eff, stack)
        i += 1
    return graph_to_json(conv.graph)


def main():
    uuid.uuid4 = make_counter_uuid()
    skos_converter.uuid.uuid4 = uuid.uuid4

    golden_root = REPO / "tests" / "golden"
    data_root = REPO / "tests" / "fixtures" / "data"
    golden_root.mkdir(parents=True, exist_ok=True)
    data_root.mkdir(parents=True, exist_ok=True)

    manifest = {"fixtures": {}, "toc_workaround": ["md_toc"]}

    for name, triples in fixture_defs.TTL_FIXTURES.items():
        outdir = golden_root / name
        outdir.mkdir(exist_ok=True)
        (data_root / f"{name}.ttl").write_text(
            fixture_defs.render_ttl(triples), encoding="utf-8"
        )
        run_forward(name, triples, outdir)
        manifest["fixtures"][name] = {
            "kind": "ttl",
            "files": sorted(f.name for f in outdir.iterdir()),
        }
        print(f"forward golden: {name}")

    for name, text in fixture_defs.MD_FIXTURES.items():
        outdir = golden_root / name
        outdir.mkdir(exist_ok=True)
        md_path = data_root / f"{name}.md"
        md_path.write_text(text, encoding="utf-8")
        if name == "md_toc":
            bug = run_reverse_driver(md_path, fix_scheme_bug=False)
        else:
            bug = run_reverse_bugcompat(md_path)
            # cross-check: the external driver with the bug preserved must
            # reproduce parse_markdown exactly on non-TOC fixtures
            drv = run_reverse_driver(md_path, fix_scheme_bug=False)
            assert bug == drv, f"driver mismatch for {name}"
        fixed = run_reverse_driver(md_path, fix_scheme_bug=True)
        (outdir / "triples_bugcompat.json").write_text(
            json.dumps(bug, indent=2, ensure_ascii=False)
        )
        (outdir / "triples_fixed.json").write_text(
            json.dumps(fixed, indent=2, ensure_ascii=False)
        )
        manifest["fixtures"][name] = {
            "kind": "md",
            "files": sorted(f.name for f in outdir.iterdir()),
            "bugcompat_triples": len(bug),
            "fixed_triples": len(fixed),
        }
        print(f"reverse golden: {name} (bug={len(bug)}, fixed={len(fixed)})")

    hashes = {}
    for f in sorted(golden_root.rglob("*")):
        if f.is_file() and f.name != "MANIFEST.json":
            hashes[str(f.relative_to(golden_root))] = hashlib.sha256(
                f.read_bytes()
            ).hexdigest()
    manifest["sha256"] = hashes
    (golden_root / "MANIFEST.json").write_text(json.dumps(manifest, indent=2))
    print(f"wrote {len(hashes)} golden files + MANIFEST.json")


if __name__ == "__main__":
    main()
