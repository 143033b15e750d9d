"""Minimal indexed in-memory rdflib stand-in (FIXTURES.md §5).

Implements exactly the rdflib surface the reference touches so the
reference can be *executed* in this offline sandbox to produce golden
outputs: Graph.add/bind/serialize/__len__, Graph.subjects(p, o),
Graph.objects(s, p), URIRef, Literal (str subclass carrying
``.language``), Namespace attribute/item access, and the namespace
singletons SKOS/RDF/RDFS/DC/DCTERMS/OWL.

Determinism: triples kept in insertion order with set-dedup; all
pattern lookups iterate in insertion order — this is what rdflib's
default in-memory store does in practice, and what SURVEY.md §2.10 D6
relies on.

Install before importing the reference::

    import rdflib_stub; rdflib_stub.install()
    sys.path.insert(0, "/root/reference"); import skos_converter
"""

from __future__ import annotations

import sys
import types


class URIRef(str):
    __slots__ = ()


class Literal(str):
    language: str | None

    def __new__(cls, value, lang=None):
        obj = super().__new__(cls, value)
        obj.language = lang
        return obj


class Namespace(str):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return URIRef(self + name)

    def __getitem__(self, name):
        return URIRef(self + name)


SKOS = Namespace("http://www.w3.org/2004/02/skos/core#")
RDF = Namespace("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
RDFS = Namespace("http://www.w3.org/2000/01/rdf-schema#")
OWL = Namespace("http://www.w3.org/2002/07/owl#")
DC = Namespace("http://purl.org/dc/elements/1.1/")
DCTERMS = Namespace("http://purl.org/dc/terms/")


class Graph:
    def __init__(self):
        self._triples: list[tuple] = []
        self._seen: set[tuple] = set()
        # (p, o) -> [s]; (s, p) -> [o]  (insertion-ordered)
        self._po: dict[tuple, list] = {}
        self._sp: dict[tuple, list] = {}
        self._prefixes: dict[str, str] = {}

    def add(self, triple):
        s, p, o = triple
        key = (s, p, o, getattr(o, "language", None))
        if key in self._seen:
            return
        self._seen.add(key)
        self._triples.append((s, p, o))
        self._po.setdefault((p, o), []).append(s)
        self._sp.setdefault((s, p), []).append(o)

    def bind(self, prefix, namespace):
        self._prefixes[prefix] = str(namespace)

    def __len__(self):
        return len(self._triples)

    def __iter__(self):
        return iter(self._triples)

    def subjects(self, predicate=None, object=None):  # noqa: A002
        if predicate is not None and object is not None:
            yield from self._po.get((predicate, object), [])
            return
        for s, p, o in self._triples:
            if (predicate is None or p == predicate) and (
                object is None or o == object
            ):
                yield s

    def objects(self, subject=None, predicate=None):
        if subject is not None and predicate is not None:
            yield from self._sp.get((subject, predicate), [])
            return
        for s, p, o in self._triples:
            if (subject is None or s == subject) and (
                predicate is None or p == predicate
            ):
                yield o

    def parse(self, file_path, format=None):  # noqa: A002
        raise NotImplementedError(
            "stub Graph cannot parse; build graphs programmatically"
        )

    def serialize(self, format=None):  # noqa: A002
        """Deterministic canonical Turtle (sorted subjects/preds/objects)."""
        pfx = {
            "skos": str(SKOS),
            "rdf": str(RDF),
            "rdfs": str(RDFS),
            "owl": str(OWL),
        }
        pfx.update(self._prefixes)
        ns_sorted = sorted(pfx.items(), key=lambda kv: -len(kv[1]))

        def compact(iri):
            for name, ns in ns_sorted:
                if iri.startswith(ns) and "/" not in iri[len(ns):] and "#" not in iri[len(ns):]:
                    return f"{name}:{iri[len(ns):]}"
            return f"<{iri}>"

        def term(o):
            if isinstance(o, Literal):
                esc = (
                    str(o)
                    .replace("\\", "\\\\")
                    .replace('"', '\\"')
                    .replace("\n", "\\n")
                )
                body = f'"{esc}"'
                return body + (f"@{o.language}" if o.language else "")
            return compact(o)

        by_subj: dict[str, dict[str, list]] = {}
        for s, p, o in self._triples:
            by_subj.setdefault(s, {}).setdefault(p, []).append(o)
        lines = [f"@prefix {n}: <{ns}> ." for n, ns in sorted(pfx.items())]
        lines.append("")
        for s in sorted(by_subj):
            plines = []
            for p in sorted(by_subj[s]):
                objs = ", ".join(sorted({term(o) for o in by_subj[s][p]}))
                plines.append(f"    {compact(p)} {objs}")
            lines.append(compact(s) + "\n" + " ;\n".join(plines) + " .")
            lines.append("")
        return "\n".join(lines)


def install():
    """Register stub modules so ``import rdflib`` resolves to this."""
    rdflib = types.ModuleType("rdflib")
    rdflib.Graph = Graph
    rdflib.Namespace = Namespace
    rdflib.URIRef = URIRef
    rdflib.Literal = Literal
    namespace = types.ModuleType("rdflib.namespace")
    for name, value in (
        ("SKOS", SKOS),
        ("RDF", RDF),
        ("RDFS", RDFS),
        ("DC", DC),
        ("DCTERMS", DCTERMS),
        ("OWL", OWL),
    ):
        setattr(namespace, name, value)
    rdflib.namespace = namespace
    sys.modules["rdflib"] = rdflib
    sys.modules["rdflib.namespace"] = namespace
