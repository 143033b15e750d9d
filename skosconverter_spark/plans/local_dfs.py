"""Driver-local hierarchy/DFS kernel — the small-vocabulary fast path.

A SKOS vocabulary is driver-sized by construction (controlled thesauri
top out at millions of triples; the 100 TB axis of this engine is the
*pages* corpus, not the concept graph). For that regime, running ~12
Spark jobs of fixpoint machinery per vocabulary is pure scheduling
overhead, exactly like shuffling a broadcast-sized join side. This
kernel computes the same DFS row table as plans.hierarchy.dfs_rows in
one pass of plain Python over the collected triple list — semantically
the reference's build_hierarchy + add_concept_row recursion
(skos_converter.py:664-802) with seq-ordered determinism.

Strategy selection lives in operators.render.document_rows:
'distributed' = hierarchy.dfs_rows (arbitrarily large graphs),
'local' = this kernel. A differential pytest asserts both produce
identical rows on the fixture corpus, so the fast path can never drift
from the scale path.
"""

from __future__ import annotations

from collections import defaultdict

from skosconverter_spark.config import (
    EngineConfig,
    RDF_TYPE,
    RDFS_LABEL,
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
    SKOS_SCOPE_NOTE,
    SKOS_TOP_CONCEPT_OF,
)

_KIND_RANK = {SKOS_PREF_LABEL: 0, SKOS_ALT_LABEL: 1, RDFS_LABEL: 2}


def _local_part(uri: str) -> str:
    return str(uri).split("/")[-1].split("#")[-1]


def dfs_rows_local(triple_rows, config: EngineConfig) -> list[dict]:
    """triple_rows: iterable of (subj, pred, obj, obj_is_literal,
    obj_lang, seq). Returns DFS row dicts matching dfs_rows' schema plus
    metadata columns (ready for the render kernels)."""
    triple_rows = sorted(triple_rows, key=lambda t: t[5])

    by_sp: dict[tuple, list] = defaultdict(list)  # (subj, pred) -> [(obj, lang)]
    by_po: dict[tuple, list] = defaultdict(list)  # (pred, obj) -> [subj]
    by_p: dict[str, list] = defaultdict(list)     # pred -> [(subj, obj, seq)]
    for subj, pred, obj, _lit, lang, seq in triple_rows:
        by_sp[(subj, pred)].append((obj, lang))
        by_po[(pred, obj)].append(subj)
        by_p[pred].append((subj, obj, seq))

    concepts = list(dict.fromkeys(by_po[(RDF_TYPE, SKOS_CONCEPT)]))
    schemes = list(dict.fromkeys(by_po[(RDF_TYPE, SKOS_CONCEPT_SCHEME)]))
    concept_set = set(concepts)

    lang_ranks: dict[str | None, int] = {}
    r = 0
    if config.preferred_language:
        lang_ranks[config.preferred_language] = r
        r += 1
    for fb in config.fallback_languages:
        lang_ranks.setdefault(fb, r)
        r += 1

    # memoized: the DFS calls best_label inside every child-sort
    # comparator and for every parent-label emit — O(n log n) calls for
    # n concepts (66k calls at 22k concepts, measured) — while the value
    # per uri never changes within one run.
    _bl_cache: dict[str, str] = {}

    def best_label(uri: str) -> str:
        got = _bl_cache.get(uri)
        if got is not None:
            return got
        out = None
        for pred in (SKOS_PREF_LABEL, SKOS_ALT_LABEL, RDFS_LABEL):
            labels = by_sp.get((uri, pred))
            if labels:
                out = min(
                    enumerate(labels),
                    key=lambda e: (lang_ranks.get(e[1][1], 99), e[0]),
                )[1][0]
                break
        if out is None:
            out = _local_part(uri)
        _bl_cache[uri] = out
        return out

    def meta(uri: str) -> dict:
        defs = by_sp.get((uri, SKOS_DEFINITION)) or by_sp.get((uri, SKOS_SCOPE_NOTE))
        notations = by_sp.get((uri, SKOS_NOTATION))
        return {
            "definition": defs[0][0] if defs else "",
            "alt_labels": [o for o, _ in by_sp.get((uri, SKOS_ALT_LABEL), [])],
            "notation": notations[0][0] if notations else "",
            "same_as": [o for o, _ in by_sp.get((uri, "http://www.w3.org/2002/07/owl#sameAs"), [])],
            "related": [o for o, _ in by_sp.get((uri, "http://www.w3.org/2004/02/skos/core#related"), [])],
        }

    # scheme assignment + top slots (skos_converter.py:685-714 semantics)
    top_slots: dict[str, list] = defaultdict(list)  # scheme -> [concept] (seq order)
    concept_to_scheme: dict[str, str] = {}
    top_set: set[str] = set()
    for scheme in schemes:
        seen = set()
        for c, *_ in [(o, None) for o, _ in by_sp.get((scheme, SKOS_HAS_TOP_CONCEPT), [])] + [
            (s, None) for s in by_po.get((SKOS_TOP_CONCEPT_OF, scheme), [])
        ]:
            if c not in seen:
                seen.add(c)
                top_slots[scheme].append(c)
            top_set.add(c)
            concept_to_scheme[c] = scheme  # unconditional (last scheme wins)
        for c in by_po.get((SKOS_IN_SCHEME, scheme), []):
            concept_to_scheme.setdefault(c, scheme)

    # one-parent-per-child dedup by min seq (J4, D6 policy)
    cand: dict[str, tuple] = {}
    for subj, obj, seq in by_p[SKOS_NARROWER]:
        if subj in concept_set and subj != obj and (obj not in cand or seq < cand[obj][0]):
            cand[obj] = (seq, subj)
    for subj, obj, seq in by_p[SKOS_BROADER]:
        if obj in concept_set and subj != obj and (subj not in cand or seq < cand[subj][0]):
            cand[subj] = (seq, obj)
    children_of: dict[str, list] = defaultdict(list)
    for child, (_, parent) in cand.items():
        children_of[parent].append(child)

    has_broader = {s for s, _, _ in by_p[SKOS_BROADER]}
    orphans = [
        c for c in concepts
        if c not in has_broader and c not in top_set and c not in cand
    ]
    orphans_by_scheme: dict[str, list] = defaultdict(list)
    orphans_no_scheme = []
    for o in orphans:
        if o in concept_to_scheme:
            orphans_by_scheme[concept_to_scheme[o]].append(o)
        else:
            orphans_no_scheme.append(o)

    rows: list[dict] = []
    processed: set[str] = set()
    counter = [0]

    def path() -> list[str]:
        counter[0] += 1
        return [f"{counter[0]:012d}"]

    def emit(uri, section, origin, level, parent_label, scheme_label, top_idx):
        m = meta(uri)
        rows.append(
            {
                "sort_path": path(), "section": section, "origin": origin,
                "uri": uri, "label": best_label(uri), "level": level,
                "parent_label": parent_label, "scheme_label": scheme_label,
                "top_idx": top_idx,
                # `concept in hierarchy` (skos_converter.py:911): drives
                # the markdown pre-children separator even when every
                # child was already processed elsewhere
                "has_children": bool(children_of.get(uri)),
                **m,
            }
        )

    def emit_ghost(uri, s_label, top_idx):
        # a processed top slot at i>0: the reference appends '' and skips
        # the block (:1017-1019) — represent the slot as a ghost row
        rows.append(
            {
                "sort_path": path(), "section": "top", "origin": "ghost",
                "uri": uri, "label": best_label(uri), "level": 1,
                "parent_label": f"[SCHEME] {s_label}", "scheme_label": s_label,
                "top_idx": top_idx, "has_children": False,
                "definition": "", "alt_labels": [], "notation": "",
                "same_as": [], "related": [],
            }
        )

    def add_subtree(concept, parent_label, level, scheme_label, section):
        # child rows only — anchors are emitted inline by the caller
        if concept in processed:
            return
        processed.add(concept)
        emit(concept, section, "child", level, parent_label, scheme_label, -1)
        for child in sorted(children_of.get(concept, []), key=lambda c: (best_label(c), c)):
            add_subtree(child, best_label(concept), level + 1, scheme_label, section)

    def hdr(label, section, level, parent_label, scheme_label):
        rows.append(
            {
                "sort_path": path(), "section": section, "origin": "anchor",
                "uri": None, "label": label, "level": level,
                "parent_label": parent_label, "scheme_label": scheme_label,
                "top_idx": -1, "has_children": False, "definition": "",
                "alt_labels": [], "notation": "", "same_as": [], "related": [],
            }
        )

    scheme_order = {s: i for i, s in enumerate(schemes)}
    for scheme in sorted(schemes, key=lambda s: (best_label(s), scheme_order[s])):
        s_label = best_label(scheme)
        hdr(s_label, "scheme", 0, "", s_label)
        rows[-1]["uri"] = scheme
        sorted_tops = sorted(top_slots.get(scheme, []), key=lambda c: (best_label(c), c))
        for i, top in enumerate(sorted_tops):
            if top in processed:
                if i > 0:
                    emit_ghost(top, s_label, i)
                continue
            processed.add(top)
            emit(top, "top", "anchor", 1, f"[SCHEME] {s_label}", s_label, i)
            for child in sorted(children_of.get(top, []), key=lambda c: (best_label(c), c)):
                add_subtree(child, best_label(top), 2, s_label, "top")
        if orphans_by_scheme.get(scheme):
            hdr(f"[Other Concepts in {s_label}]", "orph_hdr", 1, f"[SCHEME] {s_label}", s_label)
            for o in sorted(orphans_by_scheme[scheme], key=lambda c: (best_label(c), c)):
                if o in processed:
                    continue
                processed.add(o)
                emit(o, "orphan", "anchor", 2, f"[Other Concepts in {s_label}]", s_label, -1)
                for child in sorted(children_of.get(o, []), key=lambda c: (best_label(c), c)):
                    add_subtree(child, best_label(o), 3, s_label, "orphan")
    if orphans_no_scheme:
        hdr("[UNASSIGNED CONCEPTS]", "unass_hdr", 0, "", "")
        for o in sorted(orphans_no_scheme, key=lambda c: (best_label(c), c)):
            if o in processed:
                continue
            processed.add(o)
            emit(o, "unassigned", "anchor", 1, "[UNASSIGNED CONCEPTS]", "", -1)
            for child in sorted(children_of.get(o, []), key=lambda c: (best_label(c), c)):
                add_subtree(child, best_label(o), 2, "", "unassigned")
    return rows
