"""JSON-LD → triples kernel (per-document, pure Python).

The reference feeds ``.json``/``.jsonld`` files to rdflib's JSON-LD
parser (skos_converter.py:566-582, dispatch :507), which implements the
W3C JSON-LD expansion algorithm. This kernel re-implements the portion
of that public algorithm that RDF vocabularies exercise:

- ``@context``: prefix/term → IRI maps, term definitions with ``@id``,
  ``@type`` coercion (``@id`` or a datatype), ``@container``
  (``@language`` / ``@list`` / ``@set``), ``@reverse`` terms; plus
  ``@base``, ``@vocab`` and a default ``@language``
- node objects at top level, in a list, or under ``@graph``
- ``@id`` / ``@type`` (string or list); anonymous nodes get
  deterministic blank-node ids (``_:b0``, ``_:b1``, … in document
  order), matching rdflib's structure if not its labels
- property values: string, ``{"@id": ...}``, value objects
  ``{"@value": v, "@language": l, "@type": dt}``, language maps,
  ``{"@list": [...]}`` (expanded to rdf:first/rest/nil chains),
  nested node objects (edge + the nested node's own triples)
- ``@reverse`` (keyword and context-term form): emits the inverted
  triple, per the expansion algorithm
- ``@nest``: transparent property grouping

Documented narrowing vs rdflib: literal DATATYPES are parsed but not
stored — the engine's triple model carries (value, lang) only, and no
reference code path reads ``Literal.datatype`` (labels/definitions/
notations are consumed as strings; skos_converter.py:376-464).
"""

from __future__ import annotations

import json

from skosconverter_spark.config import RDF_TYPE, WELL_KNOWN_PREFIXES
from skosconverter_spark.sources.markdown_parse import Triple

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

_KEYWORDS = {
    "@id", "@type", "@context", "@graph", "@value", "@language", "@list",
    "@set", "@reverse", "@nest", "@base", "@vocab", "@container", "@index",
}


class _Ctx:
    def __init__(self) -> None:
        self.terms: dict[str, dict] = {
            k: {"id": v} for k, v in WELL_KNOWN_PREFIXES.items()
        }
        self.base: str | None = None
        self.vocab: str | None = None
        self.language: str | None = None


def _parse_context(raw, ctx: _Ctx) -> None:
    if isinstance(raw, list):
        for item in raw:
            _parse_context(item, ctx)
        return
    if not isinstance(raw, dict):
        return
    for k, v in raw.items():
        if k == "@base" and isinstance(v, str):
            ctx.base = v
        elif k == "@vocab" and isinstance(v, str):
            ctx.vocab = v
        elif k == "@language":
            ctx.language = v if isinstance(v, str) else None
        elif isinstance(v, str):
            ctx.terms[k] = {"id": v}
        elif isinstance(v, dict):
            term: dict = {}
            if "@reverse" in v:
                term["id"] = v["@reverse"]
                term["reverse"] = True
            elif "@id" in v:
                term["id"] = v["@id"]
            if "@type" in v:
                term["type"] = v["@type"]
            if "@container" in v:
                c = v["@container"]
                term["container"] = c if isinstance(c, str) else (c[0] if c else None)
            if "@language" in v:
                term["language"] = v["@language"]
            if "id" in term:
                ctx.terms[k] = term


def _is_absolute(iri: str) -> bool:
    return "://" in iri or iri.startswith(("urn:", "mailto:", "_:"))


def _expand_iri(term: str, ctx: _Ctx, vocab: bool = False) -> str:
    """Expand a term/compact IRI per the (public) JSON-LD algorithm:
    keyword → itself; term definition; prefix:suffix; @vocab for
    property position; @base for node-identifier position."""
    if term.startswith("@"):
        return term
    if term in ctx.terms:
        expanded = ctx.terms[term]["id"]
        # a term mapped to another term/compact IRI expands transitively
        return expanded if _is_absolute(expanded) else _expand_iri(expanded, ctx, vocab)
    if ":" in term:
        pfx, local = term.split(":", 1)
        if pfx in ctx.terms and not local.startswith("//"):
            return ctx.terms[pfx]["id"] + local
        return term
    if vocab and ctx.vocab:
        return ctx.vocab + term
    if not vocab and ctx.base and not _is_absolute(term):
        return ctx.base + term
    return term


def parse_jsonld(payload: str) -> list[Triple]:
    doc = json.loads(payload)
    ctx = _Ctx()
    triples: list[Triple] = []
    seen: set[Triple] = set()
    bnode_counter = [0]

    def add(t: Triple) -> None:
        if t not in seen:
            seen.add(t)
            triples.append(t)

    def mint_bnode() -> str:
        bnode_counter[0] += 1
        return f"_:b{bnode_counter[0] - 1}"

    def object_for(val, term_def: dict) -> tuple[str, str, str | None] | None:
        """One property value → ('iri'|'literal', value, lang)."""
        coerce_id = term_def.get("type") == "@id"
        if isinstance(val, dict):
            if "@value" in val:
                lang = val.get("@language", term_def.get("language", ctx.language))
                return ("literal", str(val["@value"]), lang)
            if "@list" in val:
                return ("iri", emit_list(val["@list"], term_def), None)
            if "@id" in val and len([k for k in val if k != "@index"]) == 1:
                return ("iri", _expand_iri(val["@id"], ctx), None)
            nested = walk_node(val)
            return ("iri", nested, None) if nested is not None else None
        if isinstance(val, str):
            if coerce_id:
                return ("iri", _expand_iri(val, ctx), None)
            return ("literal", val, term_def.get("language", ctx.language))
        if isinstance(val, bool):
            return ("literal", "true" if val else "false", None)
        if val is None:
            return None
        return ("literal", str(val), None)

    def emit_list(items: list, term_def: dict) -> str:
        """@list → rdf:first/rest/nil chain with deterministic bnodes
        (the standard RDF list encoding rdflib produces)."""
        if not items:
            return RDF_NIL
        head = mint_bnode()
        node = head
        for i, item in enumerate(items):
            obj = object_for(item, {k: v for k, v in term_def.items() if k != "container"})
            if obj is not None:
                kind, value, lang = obj
                add(Triple(node, RDF_FIRST, value, kind == "literal", lang))
            nxt = mint_bnode() if i + 1 < len(items) else RDF_NIL
            add(Triple(node, RDF_REST, nxt, False, None))
            node = nxt
        return head

    def emit_property(subj: str, key: str, value, reverse_outer: bool = False) -> None:
        term_def = ctx.terms.get(key, {})
        pred = _expand_iri(key, ctx, vocab=True)
        if pred.startswith("@") or (":" not in pred):
            return  # unexpandable term (no @vocab): dropped, like rdflib
        reverse = bool(term_def.get("reverse")) ^ reverse_outer
        container = term_def.get("container")
        if container == "@language" and isinstance(value, dict):
            for lang, vals in value.items():
                for v in vals if isinstance(vals, list) else [vals]:
                    add(Triple(subj, pred, str(v), True, lang))
            return
        if container == "@list" and isinstance(value, list):
            add(Triple(subj, pred, emit_list(value, term_def), False, None))
            return
        for val in value if isinstance(value, list) else [value]:
            obj = object_for(val, term_def)
            if obj is None:
                continue
            kind, v, lang = obj
            if reverse:
                if kind == "iri":  # reverse of a literal is illegal → dropped
                    add(Triple(v, pred, subj, False, None))
            else:
                add(Triple(subj, pred, v, kind == "literal", lang))

    def walk_node(node: dict) -> str | None:
        has_props = any(k not in ("@context", "@index") for k in node)
        subj = node.get("@id")
        if subj is not None:
            subj = _expand_iri(subj, ctx)
        elif has_props and ("@value" not in node):
            subj = mint_bnode()
        else:
            return None
        for key, value in node.items():
            if key in ("@id", "@context", "@index"):
                continue
            if key == "@type":
                for tval in value if isinstance(value, list) else [value]:
                    add(Triple(subj, RDF_TYPE, _expand_iri(tval, ctx, True), False, None))
                continue
            if key == "@reverse" and isinstance(value, dict):
                for rkey, rval in value.items():
                    emit_property(subj, rkey, rval, reverse_outer=True)
                continue
            if key == "@nest" or ctx.terms.get(key, {}).get("id") == "@nest":
                for nested in value if isinstance(value, list) else [value]:
                    if isinstance(nested, dict):
                        for nk, nv in nested.items():
                            emit_property(subj, nk, nv)
                continue
            if key.startswith("@"):
                continue
            emit_property(subj, key, value)
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
