"""Deterministic synthesizer for the ``pages`` input table.

Shape mandated by BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Properties (FIXTURES.md §1):
- urls: ``https://{domain}/doc{i:06d}`` with domains drawn from a
  Zipf-like distribution over 50 domains — intentionally skewed so the
  url-hash salting stage has something to defuse.
- warc_ts: 2025-01-01T00:00:00Z + i*37s.
- html: ``<html><head><title>…</title></head><body>…</body></html>``
  wrapping an HTML-escaped payload; BINARY utf-8.
- payload: a deterministic Notion-style markdown document referencing
  concepts from the embedded vocabulary (so mention detection and
  triple extraction over pages have known answers).
- lang: cycles en/nl/fr/de/'' .

Generation is executor-side: we parallelize the id range and compute
rows inside an Arrow-batched mapInPandas, so synthesizing a bench-scale
corpus never bottlenecks on the driver. Everything is a pure function
of the row id (seed is structural, not random-state), hence identical
across partitionings and cluster sizes.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as html_mod
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_DOMAINS = 50
LANGS = ["en", "nl", "fr", "de", ""]
_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

# a compact vocabulary of concept labels embedded into page text so the
# KG stages (mention scan, linking) have a known answer set
VOCAB_CONCEPTS = [
    ("mammal", "Mammal", ["Mammalia"]),
    ("dog", "Dog", ["Canine", "Hound"]),
    ("cat", "Cat", ["Feline"]),
    ("bird", "Bird", ["Aves"]),
    ("fish", "Fish", []),
    ("reptile", "Reptile", []),
    ("insect", "Insect", ["Bug"]),
    ("tree", "Tree", []),
    ("flower", "Flower", ["Bloom"]),
    ("river", "River", []),
]

_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def _domain_for(i: int) -> str:
    """Zipf-ish skew: domain rank r chosen so rank 0 gets ~ 1/H share."""
    h = int(hashlib.sha1(f"dom{i}".encode()).hexdigest()[:8], 16)
    # inverse-CDF over weights 1/(r+1): cheap deterministic approximation
    x = (h % 10_000) / 10_000.0
    acc = 0.0
    total = sum(1.0 / (r + 1) for r in range(N_DOMAINS))
    for r in range(N_DOMAINS):
        acc += (1.0 / (r + 1)) / total
        if x < acc:
            return f"d{r:02d}.example.org"
    return f"d{N_DOMAINS - 1:02d}.example.org"


def page_record(i: int) -> dict:
    """Pure function row-id → page row (the determinism contract).

    Body size ~1.5 KB (a few hundred tokens): realistic for extracted
    web text, so per-page CPU (extraction, mention scan, tokenization)
    dominates scheduling overhead — the regime the 10^12-document
    north-star actually lives in."""
    url = f"https://{_domain_for(i)}/doc{i:06d}"
    ts = _EPOCH + dt.timedelta(seconds=37 * i)
    c_key, c_label, c_alts = VOCAB_CONCEPTS[i % len(VOCAB_CONCEPTS)]
    c2_key, c2_label, _ = VOCAB_CONCEPTS[(i // 3) % len(VOCAB_CONCEPTS)]
    n_words = 180 + (i % 90)
    words = [_FILLER[(i + k) % len(_FILLER)] for k in range(n_words)]
    # sprinkle paragraph breaks deterministically
    for k in range(40, n_words, 47):
        words[k] = words[k] + ".\n\n" if k + 1 < n_words else words[k]
    body = (
        f"# Page {i:06d}\n\n"
        f"The {c_label} lives near the {c2_label}. "
        + " ".join(words)
        + (f" Also known as {c_alts[0]}." if c_alts else "")
        + f"\n\nSee {c_label} and {c2_label} for details.\n"
    )
    text = body
    page_html = (
        f"<html><head><title>Page {i:06d}</title></head><body>"
        f"{html_mod.escape(body)}</body></html>"
    )
    return {
        "url": url,
        "warc_ts": ts,
        "html": page_html.encode("utf-8"),
        "text": text if i % 4 != 0 else None,  # every 4th row exercises extract
        "lang": LANGS[i % len(LANGS)],
        "_expected_text": text,
        "_concepts": sorted({c_key, c2_key}),
    }


def synthesize_pages(
    spark: SparkSession, n_rows: int, partitions: int | None = None
) -> DataFrame:
    """The pages table, generated executor-side."""
    parts = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_rows, 1, parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [page_record(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in recs],
                    "warc_ts": [r["warc_ts"] for r in recs],
                    "html": [r["html"] for r in recs],
                    "text": [r["text"] for r in recs],
                    "lang": [r["lang"] for r in recs],
                }
            )

    return ids.mapInPandas(
        gen, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
