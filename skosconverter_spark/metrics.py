"""Triple-set precision/recall and minted-URI canonicalization.

The scoring contract (BASELINE.json: "P/R >= 0.95 vs reference on the
round-trip fixture corpus") compares our emitted (subj, pred, obj)
triples against triples produced by executing the reference. The
reference mints uuid4 URIs for concepts whose markdown carries no
recognized URI line (skos_converter.py:90); we mint deterministic sha1
URIs (config.EngineConfig.mint_uri). Both sides are therefore
canonicalized label-first before comparison: any minted URI is renamed
to ``minted:<prefLabel>`` so the comparison tests graph shape, not the
arbitrary identifier.

Pure Python over small triple lists (the fixture corpus) — the at-scale
variant of the same comparison is a DataFrame anti-join, see
tests/test_parity_spark.py.
"""

from __future__ import annotations

import re
from typing import Iterable, NamedTuple

SKOS_PREF_LABEL = "http://www.w3.org/2004/02/skos/core#prefLabel"

# uuid4 (reference, counter-patched in goldens) or 40-hex sha1 (ours),
# in the fragment of any namespace
_MINTED_RE = re.compile(
    r"^(?P<ns>.*#)(?P<frag>[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}|[0-9a-f]{40})$"
)


class TripleKey(NamedTuple):
    subj: str
    pred: str
    obj: str
    obj_is_literal: bool
    obj_lang: str | None


def _as_key(t) -> TripleKey:
    if isinstance(t, dict):
        return TripleKey(
            t["subj"], t["pred"], t["obj"], bool(t["obj_is_literal"]), t.get("obj_lang")
        )
    return TripleKey(t[0], t[1], t[2], bool(t[3]), t[4])


def canonicalize(triples: Iterable) -> set[TripleKey]:
    """Rename minted URIs to ``minted:<label>`` (label-keyed identity)."""
    keys = [_as_key(t) for t in triples]
    rename: dict[str, str] = {}
    for k in keys:
        if k.pred == SKOS_PREF_LABEL and _MINTED_RE.match(k.subj):
            # first prefLabel wins; fixtures keep labels unique per doc
            rename.setdefault(k.subj, f"minted:{k.obj}")
    out = set()
    for k in keys:
        subj = rename.get(k.subj, k.subj)
        obj = k.obj if k.obj_is_literal else rename.get(k.obj, k.obj)
        out.add(TripleKey(subj, k.pred, obj, k.obj_is_literal, k.obj_lang or None))
    return out


def precision_recall(ours: Iterable, golden: Iterable) -> tuple[float, float]:
    a = canonicalize(ours)
    b = canonicalize(golden)
    if not a and not b:
        return 1.0, 1.0
    inter = len(a & b)
    precision = inter / len(a) if a else 1.0
    recall = inter / len(b) if b else 1.0
    return precision, recall
