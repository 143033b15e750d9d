"""Fixture corpus definitions — the single source of truth.

Each vocabulary fixture is an ordered list of triples
``(subj, pred, obj, obj_is_literal, obj_lang)``; insertion order is
meaningful because the reference's "first value wins" picks follow
store insertion order (SURVEY.md §2.10 D6). The golden generator feeds
these to the reference (via the rdflib stub) in this exact order, and
also renders them to ``tests/fixtures/data/*.ttl`` for the engine to
parse.

Markdown fixtures are literal document texts (``tests/fixtures/data/*.md``).

Dependency-free and version-agnostic: imported by both the py3.12
golden generator and the py3.11 pytest suite.

Coverage map (FIXTURES.md §2): every branch of the reference's forward
and reverse paths — multilingual labels, alt labels, notation,
definition/scopeNote fallback, related/sameAs, polyhierarchy, cycles,
self-references, orphans (with/without scheme), deep hierarchies,
skipped sections, TOC, all URI metadata styles, XML-escape chars,
glyph prefixes, missing definitions.
"""

SKOS = "http://www.w3.org/2004/02/skos/core#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
EX = "http://example.org/vocab#"

TYPE = RDF + "type"
CONCEPT = SKOS + "Concept"
SCHEME = SKOS + "ConceptScheme"
PREF = SKOS + "prefLabel"
ALT = SKOS + "altLabel"
RLABEL = RDFS + "label"
DEF = SKOS + "definition"
SCOPE = SKOS + "scopeNote"
NOTATION = SKOS + "notation"
BROADER = SKOS + "broader"
NARROWER = SKOS + "narrower"
IN_SCHEME = SKOS + "inScheme"
HAS_TOP = SKOS + "hasTopConcept"
TOP_OF = SKOS + "topConceptOf"
RELATED = SKOS + "related"
SAME_AS = OWL + "sameAs"


def _c(name):
    return EX + name


def _lit(s, p, o, lang=None):
    return (s, p, o, True, lang)


def _ref(s, p, o):
    return (s, p, o, False, None)


TTL_FIXTURES = {}

# --- vocab_basic: the canonical end-to-end fixture ----------------------
_an, _ma, _do, _ca, _orp = (_c(x) for x in ("animals", "mammal", "dog", "cat", "fungus"))
TTL_FIXTURES["vocab_basic"] = [
    _ref(_an, TYPE, SCHEME),
    _lit(_an, PREF, "Animals", "en"),
    _ref(_an, HAS_TOP, _ma),
    _ref(_ma, TYPE, CONCEPT),
    _lit(_ma, PREF, "Mammal", "en"),
    _lit(_ma, PREF, "Zoogdier", "nl"),
    _lit(_ma, ALT, "Mammalia"),
    _lit(_ma, DEF, "A warm-blooded vertebrate.", "en"),
    _lit(_ma, NOTATION, "M01"),
    _ref(_ma, TOP_OF, _an),
    _ref(_ma, IN_SCHEME, _an),
    _ref(_ma, NARROWER, _do),
    _ref(_do, TYPE, CONCEPT),
    _lit(_do, PREF, "Dog", "en"),
    _lit(_do, ALT, "Canine"),
    _lit(_do, ALT, "Hound"),
    _lit(_do, DEF, "A domesticated descendant of the wolf.", "en"),
    _ref(_do, RELATED, _ca),
    _ref(_do, SAME_AS, "http://dbpedia.org/resource/Dog"),
    _ref(_do, BROADER, _ma),
    _ref(_do, IN_SCHEME, _an),
    _ref(_ca, TYPE, CONCEPT),
    _lit(_ca, PREF, "Cat", "en"),
    _ref(_ca, BROADER, _ma),
    _ref(_ca, IN_SCHEME, _an),
    # orphan inside the scheme -> "[Other Concepts in Animals]" section
    _ref(_orp, TYPE, CONCEPT),
    _lit(_orp, PREF, "Fungus", "en"),
    _ref(_orp, IN_SCHEME, _an),
]

# --- vocab_multilang: preferred/fallback language ranking ----------------
_s2, _w = _c("colors"), _c("red")
TTL_FIXTURES["vocab_multilang"] = [
    _ref(_s2, TYPE, SCHEME),
    _lit(_s2, PREF, "Colors", "en"),
    _ref(_s2, HAS_TOP, _w),
    _ref(_w, TYPE, CONCEPT),
    # insertion order: nl first — get_best_label must still pick en
    _lit(_w, PREF, "Rood", "nl"),
    _lit(_w, PREF, "Red", "en"),
    _lit(_w, PREF, "Rouge", "fr"),
    _ref(_w, TOP_OF, _s2),
    _ref(_w, IN_SCHEME, _s2),
]

# --- vocab_nolang: label with no language tag, fallback "" rank ----------
_s2b, _wb = _c("shapes"), _c("square")
TTL_FIXTURES["vocab_nolang"] = [
    _ref(_s2b, TYPE, SCHEME),
    _lit(_s2b, PREF, "Shapes"),
    _ref(_s2b, HAS_TOP, _wb),
    _ref(_wb, TYPE, CONCEPT),
    _lit(_wb, PREF, "Vierkant", "nl"),
    _lit(_wb, PREF, "Square"),  # untagged -> matched by fallback ""
    _ref(_wb, TOP_OF, _s2b),
]

# --- vocab_poly: child with two broader parents (first-parent-wins) ------
# Parent labels chosen so the engine's deterministic pick (min parent
# label) coincides with the pinned reference run (verified by generator).
_sp, _pa, _pb, _px = _c("poly"), _c("alpha"), _c("beta"), _c("shared")
TTL_FIXTURES["vocab_poly"] = [
    _ref(_sp, TYPE, SCHEME),
    _lit(_sp, PREF, "Poly", "en"),
    _ref(_sp, HAS_TOP, _pa),
    _ref(_sp, HAS_TOP, _pb),
    _ref(_pa, TYPE, CONCEPT),
    _lit(_pa, PREF, "Alpha", "en"),
    _ref(_pa, TOP_OF, _sp),
    _ref(_pa, IN_SCHEME, _sp),
    _ref(_pb, TYPE, CONCEPT),
    _lit(_pb, PREF, "Beta", "en"),
    _ref(_pb, TOP_OF, _sp),
    _ref(_pb, IN_SCHEME, _sp),
    _ref(_px, TYPE, CONCEPT),
    _lit(_px, PREF, "Shared", "en"),
    _ref(_px, BROADER, _pa),
    _ref(_px, BROADER, _pb),
    _ref(_px, IN_SCHEME, _sp),
]

# --- vocab_cycle: 3-cycle plus a 2-cycle (validator R1) ------------------
_sc = _c("cyc")
_c1, _c2, _c3, _d1, _d2 = (_c(x) for x in ("c1", "c2", "c3", "d1", "d2"))
TTL_FIXTURES["vocab_cycle"] = [
    _ref(_sc, TYPE, SCHEME),
    _lit(_sc, PREF, "Cycles", "en"),
    _ref(_c1, TYPE, CONCEPT),
    _lit(_c1, PREF, "CycA", "en"),
    _ref(_c1, BROADER, _c2),
    _ref(_c2, TYPE, CONCEPT),
    _lit(_c2, PREF, "CycB", "en"),
    _ref(_c2, BROADER, _c3),
    _ref(_c3, TYPE, CONCEPT),
    _lit(_c3, PREF, "CycC", "en"),
    _ref(_c3, BROADER, _c1),
    _ref(_d1, TYPE, CONCEPT),
    _lit(_d1, PREF, "TwoA", "en"),
    _ref(_d1, BROADER, _d2),
    _ref(_d2, TYPE, CONCEPT),
    _lit(_d2, PREF, "TwoB", "en"),
    _ref(_d2, BROADER, _d1),
]

# --- vocab_selfref: self-referencing broader/narrower (F8) ---------------
_ss, _sx = _c("selfs"), _c("selfref")
TTL_FIXTURES["vocab_selfref"] = [
    _ref(_ss, TYPE, SCHEME),
    _lit(_ss, PREF, "Selfs", "en"),
    _ref(_ss, HAS_TOP, _sx),
    _ref(_sx, TYPE, CONCEPT),
    _lit(_sx, PREF, "Ouroboros", "en"),
    _ref(_sx, BROADER, _sx),
    _ref(_sx, NARROWER, _sx),
    _ref(_sx, TOP_OF, _ss),
]

# --- vocab_deep: 9-level chain (warn > 7 levels, R2) ---------------------
_sd = _c("deep")
_levels = [_c(f"lvl{i}") for i in range(1, 10)]
TTL_FIXTURES["vocab_deep"] = (
    [
        _ref(_sd, TYPE, SCHEME),
        _lit(_sd, PREF, "Deep", "en"),
        _ref(_sd, HAS_TOP, _levels[0]),
    ]
    + [
        t
        for i, lv in enumerate(_levels)
        for t in (
            [_ref(lv, TYPE, CONCEPT), _lit(lv, PREF, f"Level {i + 1}", "en")]
            + ([_ref(lv, TOP_OF, _sd)] if i == 0 else [_ref(lv, BROADER, _levels[i - 1])])
            + ([_ref(lv, NARROWER, _levels[i + 1])] if i + 1 < len(_levels) else [])
            + [_ref(lv, IN_SCHEME, _sd)]
        )
    ]
)

# --- vocab_dup: duplicate prefLabels (A2) + duplicate labels across (A3) -
_sdu, _u1, _u2, _u3 = _c("dups"), _c("dup1"), _c("dup2"), _c("dup3")
TTL_FIXTURES["vocab_dup"] = [
    _ref(_sdu, TYPE, SCHEME),
    _lit(_sdu, PREF, "Dups", "en"),
    _ref(_sdu, HAS_TOP, _u1),
    _ref(_sdu, HAS_TOP, _u2),
    _ref(_sdu, HAS_TOP, _u3),
    _ref(_u1, TYPE, CONCEPT),
    # two prefLabels in the same language; first-inserted is also the
    # lexicographic min so engine pick == reference pick (D6)
    _lit(_u1, PREF, "Aardvark", "en"),
    _lit(_u1, PREF, "Anteater", "en"),
    _ref(_u1, TOP_OF, _sdu),
    _ref(_u2, TYPE, CONCEPT),
    _lit(_u2, PREF, "Badger", "en"),
    _ref(_u2, TOP_OF, _sdu),
    _ref(_u3, TYPE, CONCEPT),
    _lit(_u3, PREF, "Badger", "en"),  # duplicate label across concepts
    _ref(_u3, TOP_OF, _sdu),
]

# --- vocab_noscheme: concepts with no scheme -> [UNASSIGNED CONCEPTS] ----
_n1, _n2 = _c("lost1"), _c("lost2")
TTL_FIXTURES["vocab_noscheme"] = [
    _ref(_n1, TYPE, CONCEPT),
    _lit(_n1, PREF, "Driftwood", "en"),
    _ref(_n2, TYPE, CONCEPT),
    _lit(_n2, PREF, "Flotsam", "en"),
]

# --- vocab_nolabel: no labels at all -> URI local-part fallback (C2) -----
_sn, _nl = _c("nolabels"), _c("mystery_concept")
TTL_FIXTURES["vocab_nolabel"] = [
    _ref(_sn, TYPE, SCHEME),
    _lit(_sn, PREF, "NoLabels", "en"),
    _ref(_sn, HAS_TOP, _nl),
    _ref(_nl, TYPE, CONCEPT),
    _ref(_nl, TOP_OF, _sn),
]

# --- vocab_altfallback: altLabel / rdfs:label fallback chain (W1) --------
_sa, _a1, _a2 = _c("alts"), _c("altonly"), _c("rdfsonly")
TTL_FIXTURES["vocab_altfallback"] = [
    _ref(_sa, TYPE, SCHEME),
    _lit(_sa, PREF, "Alts", "en"),
    _ref(_sa, HAS_TOP, _a1),
    _ref(_sa, HAS_TOP, _a2),
    _ref(_a1, TYPE, CONCEPT),
    _lit(_a1, ALT, "Alias Only", "en"),
    _ref(_a1, TOP_OF, _sa),
    _ref(_a2, TYPE, CONCEPT),
    _lit(_a2, RLABEL, "Rdfs Label Only", "en"),
    _ref(_a2, TOP_OF, _sa),
]

# --- vocab_xmlchars: XML-escape characters and unicode in labels (C3) ----
_sx2, _x1 = _c("xml"), _c("specials")
TTL_FIXTURES["vocab_xmlchars"] = [
    _ref(_sx2, TYPE, SCHEME),
    _lit(_sx2, PREF, "Specials & \"Friends\"", "en"),
    _ref(_sx2, HAS_TOP, _x1),
    _ref(_x1, TYPE, CONCEPT),
    _lit(_x1, PREF, "Tom & Jerry's <Show> 🎉", "en"),
    _lit(_x1, DEF, 'Quotes "double" & \'single\' <tags>', "en"),
    _ref(_x1, TOP_OF, _sx2),
]

# --- vocab_scopenote: definition absent, scopeNote fallback (F4) ---------
_ssn, _sc1 = _c("notes"), _c("noted")
TTL_FIXTURES["vocab_scopenote"] = [
    _ref(_ssn, TYPE, SCHEME),
    _lit(_ssn, PREF, "Notes", "en"),
    _ref(_ssn, HAS_TOP, _sc1),
    _ref(_sc1, TYPE, CONCEPT),
    _lit(_sc1, PREF, "Noted", "en"),
    _lit(_sc1, SCOPE, "Used only as a fallback definition.", "en"),
    _ref(_sc1, TOP_OF, _ssn),
]

# --- vocab_twoschemes: two schemes, alphabetical scheme ordering (O2) ----
_sA, _sB, _tA, _tB = _c("schemeA"), _c("schemeB"), _c("topA"), _c("topB")
TTL_FIXTURES["vocab_twoschemes"] = [
    # inserted Zoo before Aquarium: output must sort Aquarium first
    _ref(_sA, TYPE, SCHEME),
    _lit(_sA, PREF, "Zoo", "en"),
    _ref(_sA, HAS_TOP, _tA),
    _ref(_sB, TYPE, SCHEME),
    _lit(_sB, PREF, "Aquarium", "en"),
    _ref(_sB, HAS_TOP, _tB),
    _ref(_tA, TYPE, CONCEPT),
    _lit(_tA, PREF, "Lion", "en"),
    _ref(_tA, TOP_OF, _sA),
    _ref(_tA, IN_SCHEME, _sA),
    _ref(_tB, TYPE, CONCEPT),
    _lit(_tB, PREF, "Shark", "en"),
    _ref(_tB, TOP_OF, _sB),
    _ref(_tB, IN_SCHEME, _sB),
]


# --- vocab_sharedtop: markdown separator edge cases ---------------------
# (a) a top concept shared by two schemes: at its second slot (index>0)
#     the reference appends '' and skips the block (ghost separator);
# (b) a concept whose only child was already processed as an earlier
#     scheme's top: hierarchy[concept] is non-empty so the reference
#     appends the pre-children '' even though no child block follows.
_shA, _shB = _c("alphaScheme"), _c("betaScheme")
_apl, _shr, _mid = _c("appleTop"), _c("sharedTop"), _c("middleMid")
TTL_FIXTURES["vocab_sharedtop"] = [
    _ref(_shA, TYPE, SCHEME),
    _lit(_shA, PREF, "Alpha", "en"),
    _ref(_shA, HAS_TOP, _apl),
    _ref(_shA, HAS_TOP, _shr),
    _ref(_shB, TYPE, SCHEME),
    _lit(_shB, PREF, "Beta", "en"),
    _ref(_shB, HAS_TOP, _mid),
    _ref(_shB, HAS_TOP, _shr),
    _ref(_apl, TYPE, CONCEPT),
    _lit(_apl, PREF, "Apple", "en"),
    _ref(_apl, TOP_OF, _shA),
    _ref(_shr, TYPE, CONCEPT),
    _lit(_shr, PREF, "Shared", "en"),
    _ref(_shr, TOP_OF, _shA),
    _ref(_shr, TOP_OF, _shB),
    _ref(_mid, TYPE, CONCEPT),
    _lit(_mid, PREF, "Middle", "en"),
    _ref(_mid, TOP_OF, _shB),
    # Apple is ALSO Middle's tree child: emitted under Alpha first, so
    # Middle renders with no child block but still owes the '' separator
    _ref(_mid, NARROWER, _apl),
]


MD_FIXTURES = {
    "md_basic": (
        "# Concept Scheme: Animals\n"
        "## Mammal\n"
        "_Definition:_ A warm-blooded vertebrate.  \n"
        "_Alternative Labels:_ Mammalia  \n"
        "_Notation:_ `M01`  \n"
        "**URI:** http://example.org/vocab#mammal\n"
        "### Dog\n"
        "_Definition:_ Best friend.  \n"
        "### Cat\n"
    ),
    "md_bold_meta": (
        "# Concept Scheme: Tools\n"
        "## Hammer\n"
        "**Definition:** Hits nails.\n"
        "**Alternative Labels:** Mallet, Sledge\n"
        "**Notation:** `T01`\n"
        "**URI:** http://example.org/vocab#hammer\n"
    ),
    "md_sub_uri": (
        "# Concept Scheme: Plants\n"
        "## Fern\n"
        "<sub>URI: http://example.org/vocab#fern</sub>\n"
    ),
    # writer-style `_URI:_ <...>` line is NOT recognized by the parser
    # (SURVEY D2) -> URI regenerated deterministically
    "md_writer_uri": (
        "# Concept Scheme: Rocks\n"
        "## Basalt\n"
        "_URI:_ <http://example.org/vocab#basalt>\n"
    ),
    "md_toc": (
        "# Concept Scheme: Indexed\n"
        "## Table of Contents\n"
        "- [Entry](#entry)\n"
        "\n"
        "## Entry\n"
        "_Definition:_ After the TOC.  \n"
    ),
    "md_skip_sections": (
        "# Concept Scheme: Mixed\n"
        "## [Other Concepts in Mixed]\n"
        "## Other Concepts\n"
        "## Unassigned Concepts\n"
        "## Kept\n"
    ),
    "md_glyphs": (
        "# Concept Scheme: Glyphs\n"
        "## 📂 Folder\n"
        "### 📄 File\n"
        "#### ▸ Deep\n"
        "##### ▹ Deeper\n"
        "###### ◦ Deepest\n"
    ),
    "md_no_scheme": (
        "## Orphan Before Scheme\n"
        "# Concept Scheme: Late\n"
        "## On Time\n"
    ),
    "md_deep": (
        "# Concept Scheme: Depths\n"
        "## L2\n"
        "### L3\n"
        "#### L4\n"
        "##### L5\n"
        "###### L6\n"
        "## Back To Two\n"
        "### Under Two\n"
    ),
    "md_missing_def": (
        "# Concept Scheme: Sparse\n"
        "## Bare\n"
        "## AlsoBare\n"
        "_Notation:_ `None`\n"
    ),
    "md_artifacts": (
        "# Concept Scheme: Artifacts\n"
        "## Wolf\n"
        "_Definition:_ First def.  \n"
        "_Definition:_ Last def wins.  \n"
        "_Alternative Labels:_ Canis, , None, Lobo  \n"
        "_Notation:_ `W-9`  \n"
        "**URI:** not_a_valid_uri\n"
    ),
}


def render_ttl(triples) -> str:
    """Render a fixture to Turtle preserving statement order (one triple
    per statement — order is the contract, compactness is not)."""

    def term(o, lit, lang):
        if not lit:
            return f"<{o}>"
        esc = (
            o.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\t", "\\t")
        )
        return f'"{esc}"@{lang}' if lang else f'"{esc}"'

    lines = [f"<{s}> <{p}> {term(o, lit, lang)} ." for s, p, o, lit, lang in triples]
    return "\n".join(lines) + "\n"
