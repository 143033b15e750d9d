"""Notion-style markdown → SKOS triples (per-document kernel).

Re-implements the semantics of the reference's NotionToSKOSConverter
(skos_converter.py:1296-1549) from scratch, in two modes:

- ``bug_compat=True`` (default, the scored mode): reproduces the
  reference's *observed* behavior, including its scheme-propagation bug
  (SURVEY.md §2.10 D1): ``_process_line`` (:1340) receives
  ``current_scheme`` by value and the caller never updates it, so every
  H2+ concept is skipped with a warning (:1378-1381) and only H1 scheme
  triples (rdf:type skos:ConceptScheme + skos:prefLabel) are emitted.

- ``bug_compat=False``: the intended semantics per the reference's own
  summary (:1958-1967) and ``_process_concept`` (:1504-1549): H1 →
  ConceptScheme, H2 → top concept (hasTopConcept/topConceptOf), H3+ →
  broader/narrower against a parent stack, with inScheme, definition
  (default "Lorem ipsum", :1520-1522), altLabels, and notation.

Metadata-line parsing reproduces the reference's split-on-colon artifacts
byte-for-byte (SURVEY.md D3): ``'_Definition:_ X'`` yields ``'_ X'``.

This module is pure Python on strings — no Spark imports — so it can run
inside an Arrow batch (one Python call per batch, never per row) and be
unit-tested without a session.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from skosconverter_spark.config import (
    EngineConfig,
    RDF_TYPE,
    SKOS_ALT_LABEL,
    SKOS_BROADER,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_HAS_TOP_CONCEPT,
    SKOS_IN_SCHEME,
    SKOS_NARROWER,
    SKOS_NOTATION,
    SKOS_PREF_LABEL,
    SKOS_TOP_CONCEPT_OF,
)


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_is_literal: bool
    obj_lang: str | None


_HEADER_RE = re.compile(r"^(#+)\s+(.+)$")
# glyph prefixes stripped from titles (reference _clean_title, :1385-1389)
_GLYPH_RE = re.compile(r"^[▸▹◦📂📁📄]\s*")
_URI_STRIP_RE = re.compile(r"<sub>URI:\s*|</sub>|URI:\s*|\*\*URI:\*\*\s*|`")


def _clean_title(title: str) -> str:
    return _GLYPH_RE.sub("", title)


def _should_skip_section(title: str) -> bool:
    # reference :1391-1395
    return (
        title.startswith("[")
        or title.startswith("Other Concepts")
        or title == "Unassigned Concepts"
    )


def _is_valid_uri(uri: str) -> bool:
    # reference :1464-1482 (URIRef construction never fails in practice)
    if not uri or len(uri) < 3:
        return False
    return (
        uri.startswith("http://")
        or uri.startswith("https://")
        or uri.startswith("urn:")
        or uri.startswith("file://")
        or "://" in uri
    )


def _extract_metadata(lines: list[str], start_index: int) -> dict:
    """Scan forward to the next header, collecting metadata lines.

    Last matching line wins for each field (the reference keeps
    reassigning, :1407-1460). Split-on-colon artifacts are intentional.
    """
    meta = {"definition": None, "alt_labels": [], "notation": None, "existing_uri": None}
    j = start_index + 1
    while j < len(lines) and not lines[j].strip().startswith("#"):
        line = lines[j].strip()
        if not line or line.startswith("<!--"):
            j += 1
            continue
        if line.startswith("_Definition:_") or line.startswith("**Definition:**"):
            parts = line.split(":", 1)
            if len(parts) > 1:
                meta["definition"] = parts[1].strip()
        elif line.startswith("_Alternative Labels:_") or line.startswith(
            "**Alternative Labels:**"
        ):
            parts = line.split(":", 1)
            if len(parts) > 1:
                meta["alt_labels"] = [
                    lab.strip()
                    for lab in parts[1].strip().split(",")
                    if lab.strip() and lab.strip() != "None"
                ]
        elif line.startswith("_Notation:_") or line.startswith("**Notation:**"):
            parts = line.split(":", 1)
            if len(parts) > 1:
                notation = parts[1].strip().strip("`")
                if notation and notation != "None":
                    meta["notation"] = notation
        elif line.startswith("<sub>URI:") or line.startswith("**URI:**"):
            uri_text = _URI_STRIP_RE.sub("", line).strip()
            if uri_text and uri_text != "None" and _is_valid_uri(uri_text):
                meta["existing_uri"] = uri_text
        j += 1
    return meta


class _UriMinter:
    """Deterministic stand-in for the reference URIManager (:63-93)."""

    def __init__(self, config: EngineConfig):
        self.config = config
        self.label_to_uri: dict[str, str] = {}

    def get_or_create(self, label: str, existing_uri: str | None) -> str:
        if existing_uri:
            self.label_to_uri[label] = existing_uri
            return existing_uri
        if label in self.label_to_uri:
            return self.label_to_uri[label]
        uri = self.config.mint_uri(label)
        self.label_to_uri[label] = uri
        return uri


def parse_markdown(payload: str, config: EngineConfig) -> list[Triple]:
    """Parse one markdown document into SKOS triples.

    Triple *set* semantics (rdflib Graph.add dedups; SURVEY §2.7 U5) —
    we dedup while preserving first-insertion order so downstream
    "first value wins" picks match a reference run.
    """
    lines = payload.splitlines(keepends=True)
    seen: set[Triple] = set()
    out: list[Triple] = []

    def add(s: str, p: str, o: str, lit: bool, lang: str | None = None) -> None:
        t = Triple(s, p, o, lit, lang)
        if t not in seen:
            seen.add(t)
            out.append(t)

    minter = _UriMinter(config)
    current_scheme: str | None = None
    # (level, uri) stack — the reference also stores the title (:1549) but
    # never reads it back
    parent_stack: list[tuple[int, str]] = []

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("<!--"):
            i += 1
            continue
        if line == "## Table of Contents":
            # Intended semantics: skip to the next header AFTER the TOC
            # block. (The reference's own skip loop, :1350-1353, re-tests
            # the TOC line itself — which starts with '#' — and returns i
            # unchanged: a literal TOC line hangs it forever. We implement
            # the intent; there is no terminating behavior to be
            # bug-compatible with.)
            i += 1
            while i < n and not lines[i].strip().startswith("#"):
                i += 1
            continue
        m = _HEADER_RE.match(line)
        if m:
            level = len(m.group(1))
            title = _clean_title(m.group(2))
            if _should_skip_section(title):
                i += 1
                continue
            meta = _extract_metadata(lines, i)
            if level == 1:
                # _process_concept_scheme (:1484-1502)
                if title.lower().startswith("concept scheme:"):
                    title = title.split(":", 1)[1].strip()
                scheme_uri = minter.get_or_create(title, meta["existing_uri"])
                add(scheme_uri, RDF_TYPE, SKOS_CONCEPT_SCHEME, False)
                add(scheme_uri, SKOS_PREF_LABEL, title, True, None)
                parent_stack.clear()
                parent_stack.append((1, scheme_uri))
                if not config.bug_compat:
                    current_scheme = scheme_uri
                # bug_compat: current_scheme stays None forever (D1)
            elif level >= 2 and current_scheme:
                # _process_concept (:1504-1549) — fixed mode only
                uri = minter.get_or_create(title, meta["existing_uri"])
                add(uri, RDF_TYPE, SKOS_CONCEPT, False)
                add(uri, SKOS_PREF_LABEL, title, True, None)
                add(uri, SKOS_IN_SCHEME, current_scheme, False)
                add(
                    uri,
                    SKOS_DEFINITION,
                    meta["definition"] if meta["definition"] else "Lorem ipsum",
                    True,
                    None,
                )
                for alt in meta["alt_labels"]:
                    if alt:
                        add(uri, SKOS_ALT_LABEL, alt, True, None)
                if meta["notation"]:
                    add(uri, SKOS_NOTATION, meta["notation"], True, None)
                while parent_stack and parent_stack[-1][0] >= level:
                    parent_stack.pop()
                if level == 2:
                    add(current_scheme, SKOS_HAS_TOP_CONCEPT, uri, False)
                    add(uri, SKOS_TOP_CONCEPT_OF, current_scheme, False)
                elif parent_stack:
                    parent_uri = parent_stack[-1][1]
                    add(uri, SKOS_BROADER, parent_uri, False)
                    add(parent_uri, SKOS_NARROWER, uri, False)
                parent_stack.append((level, uri))
            # level >= 2 without a scheme: skipped with a warning (:1378-1381)
        i += 1

    return out
