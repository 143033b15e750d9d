"""Relational views over the ``triples`` table (SURVEY.md §1.2).

Every helper here replaces a per-node ``graph.objects(...)`` lookup in
the reference (skos_converter.py:623-657, :376-464) with one
set-oriented DataFrame op: a filter+project, a broadcast join, or a
min(seq) window. Nothing in this module calls Python per row.

Determinism contract: ``seq`` is the per-document insertion ordinal
(sources.parse_udf). The reference's rdflib store iterates in insertion
order, so every ``labels[0]`` / "first value" pick maps to the row with
the smallest seq.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from skosconverter_spark.config import (
    EngineConfig,
    OWL_SAME_AS,
    RDF_TYPE,
    RDFS_LABEL,
    SKOS_ALT_LABEL,
    SKOS_CONCEPT,
    SKOS_CONCEPT_SCHEME,
    SKOS_DEFINITION,
    SKOS_NOTATION,
    SKOS_PREF_LABEL,
    SKOS_RELATED,
    SKOS_SCOPE_NOTE,
)


def uri_local_part(col):
    """str(uri).split('/')[-1].split('#')[-1] (skos_converter.py:393-394)."""
    return F.element_at(F.split(F.element_at(F.split(col, "/"), -1), "#"), -1)


def concepts(triples: DataFrame) -> DataFrame:
    """subjects(rdf:type, skos:Concept) → (uri, type_seq) (F1)."""
    return (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("obj") == SKOS_CONCEPT))
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.min("seq").alias("type_seq"))
    )


def schemes(triples: DataFrame) -> DataFrame:
    """subjects(rdf:type, skos:ConceptScheme) → (uri, type_seq) (F2).

    type_seq is the store-insertion rank of the scheme's type triple —
    the reference's scheme iteration order (skos_converter.py:690).
    """
    return (
        triples.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == SKOS_CONCEPT_SCHEME)
        )
        .groupBy(F.col("subj").alias("uri"))
        .agg(F.min("seq").alias("type_seq"))
    )


def labels(triples: DataFrame) -> DataFrame:
    """All label triples → (uri, kind, label, lang, seq) (F3).

    kind_rank encodes the reference's property fallback order
    prefLabel → altLabel → rdfs:label (skos_converter.py:426-428).
    """
    kind = (
        F.when(F.col("pred") == SKOS_PREF_LABEL, F.lit("pref"))
        .when(F.col("pred") == SKOS_ALT_LABEL, F.lit("alt"))
        .otherwise(F.lit("rdfs"))
    )
    kind_rank = (
        F.when(F.col("pred") == SKOS_PREF_LABEL, F.lit(0))
        .when(F.col("pred") == SKOS_ALT_LABEL, F.lit(1))
        .otherwise(F.lit(2))
    )
    # lang stays NULL for untagged literals: rdflib Literal.language is
    # None, never '' — so the reference's '' fallback entry can never
    # match a parsed label, and neither must ours (verified by the
    # vocab_nolang golden: labels[0] wins over the untagged label).
    return triples.filter(
        F.col("pred").isin(SKOS_PREF_LABEL, SKOS_ALT_LABEL, RDFS_LABEL)
    ).select(
        F.col("subj").alias("uri"),
        kind.alias("kind"),
        kind_rank.alias("kind_rank"),
        F.col("obj").alias("label"),
        F.col("obj_lang").alias("lang"),
        "seq",
    )


def _lang_rank(config: EngineConfig):
    """CASE chain encoding LanguageHelper.get_best_label's language
    preference (skos_converter.py:437-448): preferred language first,
    then fallback list order, else everything ties at 99 and seq picks
    labels[0]."""
    expr = None
    rank = 0
    if config.preferred_language:
        expr = F.when(F.col("lang") == config.preferred_language, F.lit(0))
        rank = 1
    for i, fb in enumerate(config.fallback_languages):
        cond = F.col("lang") == fb
        expr = F.when(cond, F.lit(rank + i)) if expr is None else expr.when(cond, F.lit(rank + i))
    return (expr.otherwise(F.lit(99))) if expr is not None else F.lit(99)


def best_label(triples: DataFrame, config: EngineConfig, uris: DataFrame | None = None) -> DataFrame:
    """get_best_label for every node at once (W1) → (uri, label).

    One hash-aggregated min(struct) pick — partial-aggregated map-side,
    no sort, no window — instead of a per-node lru_cached lookup
    (skos_converter.py:376, :420-451). If ``uris`` is given (a DataFrame
    with column ``uri``), URIs with no label rows fall back to the URI
    local part (:433-434).
    """
    lab = labels(triples).withColumn("lang_rank", _lang_rank(config))
    picked = lab.groupBy("uri").agg(
        F.min(F.struct("kind_rank", "lang_rank", "seq", "label"))["label"].alias("label")
    )
    if uris is None:
        return picked
    return uris.select("uri").join(picked, "uri", "left").select(
        "uri", F.coalesce(F.col("label"), uri_local_part(F.col("uri"))).alias("label")
    )


def simple_label(triples: DataFrame, uris: DataFrame | None = None) -> DataFrame:
    """_get_simple_label (skos_converter.py:376-394): pref[0] → alt[0] →
    rdfs[0] → URI fragment. NO language ranking — store order only."""
    lab = labels(triples)
    picked = lab.groupBy("uri").agg(
        F.min(F.struct("kind_rank", "seq", "label"))["label"].alias("label")
    )
    if uris is None:
        return picked
    return uris.select("uri").join(picked, "uri", "left").select(
        "uri", F.coalesce(F.col("label"), uri_local_part(F.col("uri"))).alias("label")
    )


def _first_by_seq(triples: DataFrame, pred: str, out_name: str) -> DataFrame:
    return (
        triples.filter(F.col("pred") == pred)
        .select(F.col("subj").alias("uri"), F.col("obj").alias(out_name), "seq")
        .groupBy("uri")
        .agg(F.min(F.struct("seq", out_name))[out_name].alias(out_name))
    )


def definitions(triples: DataFrame) -> DataFrame:
    """get_definition (F4): first definition, scopeNote fallback, '' default
    applied at join time via coalesce (skos_converter.py:628-637)."""
    d = _first_by_seq(triples, SKOS_DEFINITION, "definition")
    s = _first_by_seq(triples, SKOS_SCOPE_NOTE, "scope_note")
    return (
        d.join(s, "uri", "full")
        .select(
            "uri",
            F.coalesce(F.col("definition"), F.col("scope_note")).alias("definition"),
        )
    )


def notations(triples: DataFrame) -> DataFrame:
    """get_notation (F5): notations[0] (skos_converter.py:654-657)."""
    return _first_by_seq(triples, SKOS_NOTATION, "notation")


def collected(triples: DataFrame, pred: str, out_name: str) -> DataFrame:
    """Multi-valued objects in store order → (uri, array) — the
    get_alt_labels / get_same_as / get_related list shape
    (skos_converter.py:639-652). sort_array on (seq, value) structs then
    project: insertion order preserved exactly."""
    return (
        triples.filter(F.col("pred") == pred)
        .groupBy(F.col("subj").alias("uri"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", F.col("obj").alias("v")))),
                lambda s: s["v"],
            ).alias(out_name)
        )
    )


def labels_by_language(triples: DataFrame, pred: str = SKOS_PREF_LABEL) -> DataFrame:
    """get_all_labels_by_language (skos_converter.py:453-464, A6):
    (uri, labels MAP<lang, ARRAY<label>>), 'no-lang' for untagged,
    per-language lists in store order."""
    src = triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("uri"),
        F.coalesce(F.col("obj_lang"), F.lit("no-lang")).alias("lang"),
        F.col("obj").alias("label"),
        "seq",
    )
    per_lang = src.groupBy("uri", "lang").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", F.col("label").alias("v")))),
            lambda s: s["v"],
        ).alias("labels"),
    )
    return per_lang.groupBy("uri").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "labels"))).alias("labels")
    )


def uri_fragment_from_label(col):
    """create_uri_fragment (skos_converter.py:72-77, C1): strip
    non-word/space/hyphen, whitespace → '_', lowercase. (Dead code in
    the reference — minting always takes the uuid4 branch — kept for
    API parity as a pure column expression.)"""
    return F.lower(
        F.regexp_replace(F.regexp_replace(col, r"[^\w\s-]", ""), r"\s+", "_")
    )


def concept_meta(triples: DataFrame, config: EngineConfig, uris: DataFrame) -> DataFrame:
    """The full per-concept metadata record (_get_concept_metadata,
    skos_converter.py:934-944) for every uri in ``uris``.

    ONE hash aggregation over the relevant triples computes every field
    (conditional min-struct picks and seq-sorted collect_lists), then one
    join onto ``uris`` — instead of five separate join+window subtrees.
    The reference does ~7 indexed lookups per concept; this is the same
    information in a single shuffle.
    """
    rel = triples.filter(
        F.col("pred").isin(
            SKOS_PREF_LABEL, SKOS_ALT_LABEL, RDFS_LABEL, SKOS_DEFINITION,
            SKOS_SCOPE_NOTE, SKOS_NOTATION, OWL_SAME_AS, SKOS_RELATED,
        )
    )
    kind_rank = (
        F.when(F.col("pred") == SKOS_PREF_LABEL, F.lit(0))
        .when(F.col("pred") == SKOS_ALT_LABEL, F.lit(1))
        .when(F.col("pred") == RDFS_LABEL, F.lit(2))
    )
    lang_rank = _lang_rank(config)
    src = rel.select(
        F.col("subj").alias("uri"),
        "pred",
        F.col("obj"),
        F.coalesce(F.col("obj_lang")).alias("lang"),
        "seq",
        kind_rank.alias("kind_rank"),
    ).withColumn("lang_rank", lang_rank)

    def first_of(pred):
        return F.min(
            F.when(F.col("pred") == pred, F.struct("seq", "obj"))
        )["obj"]

    def list_of(pred):
        return F.transform(
            F.array_sort(
                F.collect_list(F.when(F.col("pred") == pred, F.struct("seq", "obj")))
            ),
            lambda s: s["obj"],
        )

    agg = src.groupBy("uri").agg(
        F.min(
            F.when(
                F.col("kind_rank").isNotNull(),
                F.struct("kind_rank", "lang_rank", "seq", F.col("obj").alias("label")),
            )
        )["label"].alias("label"),
        first_of(SKOS_DEFINITION).alias("definition_"),
        first_of(SKOS_SCOPE_NOTE).alias("scope_note_"),
        first_of(SKOS_NOTATION).alias("notation"),
        list_of(SKOS_ALT_LABEL).alias("alt_labels"),
        list_of(OWL_SAME_AS).alias("same_as"),
        list_of(SKOS_RELATED).alias("related"),
    )
    empty = F.array().cast("array<string>")
    return uris.select("uri").join(agg, "uri", "left").select(
        "uri",
        F.coalesce(F.col("label"), uri_local_part(F.col("uri"))).alias("label"),
        F.coalesce(F.col("definition_"), F.col("scope_note_"), F.lit("")).alias("definition"),
        F.coalesce(F.col("alt_labels"), empty).alias("alt_labels"),
        F.coalesce(F.col("notation"), F.lit("")).alias("notation"),
        F.coalesce(F.col("same_as"), empty).alias("same_as"),
        F.coalesce(F.col("related"), empty).alias("related"),
    )
