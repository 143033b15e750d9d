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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skosconverter_spark.config import SKOS_ALT_LABEL, SKOS_PREF_LABEL

_WORD_RE = re.compile(r"\w+(?:'\w+)?", re.UNICODE)
# split-with-capture variant: re.split keeps the captured tokens at odd
# indices, yielding the exact finditer token sequence plus the gaps —
# one C-level pass per batch instead of a Python loop per token
_WORD_SPLIT_RE = re.compile(r"(\w+(?:'\w+)?)", re.UNICODE)

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
        # vectorized kernel: ONE regex split over the whole Arrow batch
        # (texts joined on \x00, which no token can span), offsets by
        # numpy cumsum, token lowering + the first-token gate as C-level
        # pandas ops. The Python window walk runs only on gate HITS —
        # typically a small fraction of the token stream — instead of
        # paying a Python-level loop iteration per token.
        trie = trie_bc.value
        first_tokens = list(trie.first_tokens)
        prefixes = trie.prefixes
        surfaces = trie.surfaces
        max_len = trie.max_len
        for pdf in batches:
            out = {k: [] for k in ("url", "surface", "norm_surface", "begin", "end")}
            texts = pdf["text"].fillna("").tolist()
            urls = pdf["url"].tolist()
            joined = "\x00".join(texts)
            parts = _WORD_SPLIT_RE.split(joined)
            lens = pd.Series(parts, dtype="object").str.len().to_numpy()
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            tok = parts[1::2]  # captured tokens live at odd indices
            if not tok:
                yield pd.DataFrame(out, columns=list(out))
                continue
            tok_begin = starts[1::2]  # global offsets into `joined`
            tok_end = tok_begin + lens[1::2]
            lowered_s = pd.Series(tok, dtype="object").str.lower()
            lowered = lowered_s.to_numpy()
            # map each token to its source row: texts start at boundaries
            # of the joined string (previous text length + 1 separator)
            text_off = np.zeros(len(texts) + 1, dtype=np.int64)
            np.cumsum([len(t) + 1 for t in texts], out=text_off[1:])
            row_of = np.searchsorted(text_off, tok_begin, side="right") - 1
            # row token ranges (row_of is non-decreasing)
            row_tok_end = np.searchsorted(row_of, np.arange(len(texts)), side="right")
            hits = np.flatnonzero(lowered_s.isin(first_tokens).to_numpy())
            for i in hits:
                r = row_of[i]
                n = row_tok_end[r]
                for l in range(1, max_len + 1):
                    if i + l > n:
                        break
                    window = tuple(lowered[i : i + l])
                    if window not in prefixes:
                        break
                    if window in surfaces:
                        gb, ge = tok_begin[i], tok_end[i + l - 1]
                        off = text_off[r]
                        out["url"].append(urls[r])
                        out["surface"].append(joined[gb:ge])
                        out["norm_surface"].append(" ".join(window))
                        out["begin"].append(int(gb - off))
                        out["end"].append(int(ge - off))
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
