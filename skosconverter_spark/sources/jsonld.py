"""JSON-LD → triples kernel (per-document, pure Python).

The reference feeds ``.json``/``.jsonld`` files to rdflib's JSON-LD
parser (skos_converter.py:566-582, dispatch :507). This engine parses
the pragmatic subset SKOS exports actually use:

- ``@context``: prefix → IRI map entries (string values only) and term
  definitions ``{"@id": ...}``
- node objects at top level, in a top-level list, or under ``@graph``
- ``@id`` (subject), ``@type`` (string or list)
- property values: string, ``{"@id": iri}``, ``{"@value": v,
  "@language": l}``, or lists thereof
- nested node objects under a property (emitted as an edge to the
  nested ``@id`` plus the nested node's own triples)

No expansion algorithm beyond prefix substitution — SKOS corpora do not
need @reverse/@container/@nest.
"""

from __future__ import annotations

import json

from skosconverter_spark.config import RDF_TYPE, WELL_KNOWN_PREFIXES
from skosconverter_spark.sources.markdown_parse import Triple


def _expand(term: str, ctx: dict[str, str]) -> str:
    if term.startswith("@"):
        return term
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in ctx and not local.startswith("//"):
            return ctx[pfx] + local
        return term
    if term in ctx:
        return ctx[term]
    return term


def _parse_context(raw, ctx: dict[str, str]) -> None:
    if isinstance(raw, list):
        for item in raw:
            _parse_context(item, ctx)
        return
    if not isinstance(raw, dict):
        return
    for k, v in raw.items():
        if isinstance(v, str):
            ctx[k] = v
        elif isinstance(v, dict) and "@id" in v:
            ctx[k] = v["@id"]


def parse_jsonld(payload: str) -> list[Triple]:
    doc = json.loads(payload)
    ctx: dict[str, str] = dict(WELL_KNOWN_PREFIXES)
    triples: list[Triple] = []
    seen: set[Triple] = set()

    def add(t: Triple) -> None:
        if t not in seen:
            seen.add(t)
            triples.append(t)

    def walk_node(node: dict) -> str | None:
        subj = node.get("@id")
        if subj is None:
            return None
        subj = _expand(subj, ctx)
        for key, value in node.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                for tval in value if isinstance(value, list) else [value]:
                    add(Triple(subj, RDF_TYPE, _expand(tval, ctx), False, None))
                continue
            pred = _expand(key, ctx)
            if pred.startswith("@"):
                continue
            for val in value if isinstance(value, list) else [value]:
                if isinstance(val, dict):
                    if "@value" in val:
                        add(
                            Triple(
                                subj,
                                pred,
                                str(val["@value"]),
                                True,
                                val.get("@language"),
                            )
                        )
                    elif "@id" in val and len(val) == 1:
                        add(Triple(subj, pred, _expand(val["@id"], ctx), False, None))
                    else:
                        nested = walk_node(val)
                        if nested is not None:
                            add(Triple(subj, pred, nested, False, None))
                elif isinstance(val, str):
                    add(Triple(subj, pred, val, True, None))
                else:
                    add(Triple(subj, pred, json.dumps(val), True, None))
        return subj

    roots = doc if isinstance(doc, list) else [doc]
    for root in roots:
        if not isinstance(root, dict):
            continue
        if "@context" in root:
            _parse_context(root["@context"], ctx)
        nodes = root.get("@graph", [root]) if isinstance(root, dict) else [root]
        for node in nodes if isinstance(nodes, list) else [nodes]:
            if isinstance(node, dict):
                walk_node(node)
    return triples
