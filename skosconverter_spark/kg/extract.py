"""HTML → text extraction stage (SURVEY.md §2.9 C17, §2.11).

Arrow-batched ``mapInPandas``; deterministic and versioned. The
extractor is a pure function of the html bytes, so the per-url
byte-identical invariant (BASELINE.json input_hint) holds across runs,
partitionings and cluster sizes — enforced by a sha256-manifest pytest.

The extractor intentionally handles exactly the corpus contract
(sources.pages): a single <body> whose content is HTML-escaped text.
Real-world HTML needs a real parser; that dependency is not in this
container, so the decode path beyond the contract raises
NotImplementedError behind the EXTRACTOR_VERSION gate rather than
guessing (multimodal stance: plumbing real, exotic decode stubbed).
"""

from __future__ import annotations

import html as html_mod
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACTOR_VERSION = "1"

_BODY_RE = re.compile(rb"<body>(.*)</body>", re.DOTALL)


def extract_text_bytes(html: bytes | None) -> str | None:
    """Pure kernel: html bytes → extracted text (None-safe)."""
    if html is None:
        return None
    m = _BODY_RE.search(html)
    if m is None:
        raise NotImplementedError(
            "extractor v%s only supports the synthesized corpus contract "
            "(single <body> of escaped text); real-HTML decoding requires "
            "an HTML parser not present in this environment" % EXTRACTOR_VERSION
        )
    return html_mod.unescape(m.group(1).decode("utf-8"))


def extract_text(pages: DataFrame) -> DataFrame:
    """pages → pages with ``text`` filled where null.

    Rows that already carry text keep it byte-identically (the
    invariant is per url); only null-text rows run the extractor.
    One Python call per Arrow batch.
    """
    cols = pages.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            need = pdf["text"].isna()
            if need.any():
                pdf = pdf.copy()
                pdf.loc[need, "text"] = [
                    extract_text_bytes(h) for h in pdf.loc[need, "html"]
                ]
            yield pdf

    schema = ", ".join(
        {
            "url": "url string",
            "warc_ts": "warc_ts timestamp",
            "html": "html binary",
            "text": "text string",
            "lang": "lang string",
        }[c]
        for c in cols
    )
    return pages.mapInPandas(run, schema)


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """url-hash salted repartitioning (north_rule): domains are Zipf-skewed,
    so never partition by domain — hash the full url, which is uniform
    regardless of domain skew. Downstream per-domain aggregations should
    pre-aggregate on (domain, salt) first (two-phase agg)."""
    return df.repartition(num_partitions, F.xxhash64(F.col("url")))
