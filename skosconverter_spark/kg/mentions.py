"""Concept-mention detection over extracted page text (SURVEY.md J11).

Map-side broadcast dictionary scan: the vocabulary's prefLabel/altLabel
surface forms (normalized) are broadcast to every executor as a
token-trie; an Arrow-batched ``mapInPandas`` slides word windows over
each page's text and emits mention rows. One Python call per batch; the
only shuffle in this stage is the caller's salted repartition.

Candidate generation stays relational: mentions equi-join the label
table on the normalized surface (broadcast hash join — the vocabulary
side is small by construction), and similarity scoring/thresholding
happens in kg.linking as pure DataFrame ops.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skosconverter_spark.config import SKOS_ALT_LABEL, SKOS_PREF_LABEL

_WORD_RE = re.compile(r"\w+(?:'\w+)?", re.UNICODE)

MENTION_SCHEMA = (
    "url string, surface string, norm_surface string, begin int, end int"
)


def normalize_surface(s: str) -> str:
    return " ".join(_WORD_RE.findall(s.lower()))


def label_table(triples: DataFrame) -> DataFrame:
    """(uri, label, norm_surface, kind): the vocabulary's surface forms."""
    kind = F.when(F.col("pred") == SKOS_PREF_LABEL, "pref").otherwise("alt")
    lab = triples.filter(F.col("pred").isin(SKOS_PREF_LABEL, SKOS_ALT_LABEL)).select(
        F.col("subj").alias("uri"), F.col("obj").alias("label"), kind.alias("kind")
    )
    # normalization mirrors normalize_surface EXACTLY: extract the same
    # \w+(?:'\w+)? tokens the scanner uses (a split on [^\w']+ keeps edge
    # apostrophes the scanner strips, producing trie entries no window
    # can ever match). (?U) = Java's UNICODE_CHARACTER_CLASS, matching
    # Python's unicode-aware \w.
    norm = F.array_join(
        F.regexp_extract_all(F.lower(F.col("label")), F.lit(r"(?U)\w+(?:'\w+)?"), 0),
        " ",
    )
    return lab.withColumn("norm_surface", norm).distinct()


class _Trie:
    """Token-level dictionary: norm token tuple → True; tracks max length.

    ``first_tokens`` is the hot-path filter: the scanner touches the
    window machinery only for tokens that can START some surface, so the
    per-token cost on non-vocabulary text is one string-set lookup."""

    def __init__(self, surfaces: list[str]):
        self.surfaces = set()
        self.max_len = 1
        for s in surfaces:
            toks = tuple(s.split(" "))
            if toks:
                self.surfaces.add(toks)
                self.max_len = max(self.max_len, len(toks))
        # prefix set for early window cut-off
        self.prefixes = set()
        self.first_tokens = set()
        for toks in self.surfaces:
            self.first_tokens.add(toks[0])
            for i in range(1, len(toks) + 1):
                self.prefixes.add(toks[:i])


def scan_mentions(pages_text: DataFrame, triples: DataFrame) -> DataFrame:
    """pages(url, text) × broadcast vocabulary → mention rows.

    begin/end are character offsets of the surface in the original text.
    """
    spark = pages_text.sparkSession
    surfaces = [
        r.norm_surface
        for r in label_table(triples).select("norm_surface").distinct().collect()
        if r.norm_surface
    ]
    trie_bc = spark.sparkContext.broadcast(_Trie(surfaces))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = trie_bc.value
        first_tokens = trie.first_tokens
        prefixes = trie.prefixes
        surfaces = trie.surfaces
        max_len = trie.max_len
        for pdf in batches:
            out = {k: [] for k in ("url", "surface", "norm_surface", "begin", "end")}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                words = [(m.group(0), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
                lowered = [w[0].lower() for w in words]
                n = len(words)
                for i in range(n):
                    # hot-path gate: one string hash per non-starting token
                    # (identical semantics to the l=1 prefix check below —
                    # a window can only extend if its first token starts
                    # some surface)
                    if lowered[i] not in first_tokens:
                        continue
                    for l in range(1, max_len + 1):
                        if i + l > n:
                            break
                        window = tuple(lowered[i : i + l])
                        if window not in prefixes:
                            break
                        if window in surfaces:
                            begin = words[i][1]
                            end = words[i + l - 1][2]
                            out["url"].append(url)
                            out["surface"].append(text[begin:end])
                            out["norm_surface"].append(" ".join(window))
                            out["begin"].append(begin)
                            out["end"].append(end)
            yield pd.DataFrame(out, columns=list(out))

    return (
        pages_text.select("url", "text")
        .mapInPandas(scan, MENTION_SCHEMA)
    )


def mention_candidates(mentions: DataFrame, triples: DataFrame) -> DataFrame:
    """Equi-join mentions to candidate concepts on the normalized surface
    (broadcast hash join — vocab side is small)."""
    lt = label_table(triples).select("norm_surface", "uri", "kind").distinct()
    return mentions.join(F.broadcast(lt), "norm_surface").select(
        "url", "surface", "norm_surface", "begin", "end",
        F.col("uri").alias("concept_uri"), "kind",
    )
