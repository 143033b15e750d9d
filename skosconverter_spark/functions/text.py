"""Text-analysis functions for training-data pipelines.

All hot-path functions are pure DataFrame expressions (JVM-side,
whole-stage-codegen) — no UDFs — so they hold up at corpus scale:
token counting, quality scoring, document fingerprinting. Language
identification is the one model-ish function; it is an Arrow-batched
pandas UDF over character n-gram profiles (a classic public heuristic),
kept deterministic and dependency-free.

Every ANSI-expressible function here has a matching DuckDB oracle in
__spark_entry__ (same md5, same integer arithmetic, same exact-rational
ratios) so the harness can verify it value-for-value.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_WS_NORM = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, no empties)."""
    return F.filter(F.split(col, _WS_NORM), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish count: word tokens plus punctuation marks split out,
    the standard pre-tokenizer family (public BPE practice). Punctuation
    is detached by inserting a space before it (no lookahead — RE2
    engines like DuckDB's must reproduce this for the oracle)."""
    detached = F.regexp_replace(col, r"([^\w\s])", " $1")
    return F.size(F.filter(F.split(detached, r"\s+"), lambda t: t != F.lit("")))


def stopword_count(col: Column) -> Column:
    return F.size(
        F.filter(tokens(F.lower(col)), lambda t: t.isin(*STOPWORDS))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: all exact integer/rational math so
    any SQL engine reproduces them bit-for-bit."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        stopword_count(t).alias("n_stopwords"),
        (
            F.length(F.regexp_replace(t, r"[\w\s]", "")).cast("double")
            / F.length(t).cast("double")
        ).alias("punct_ratio"),
        (stopword_count(t).cast("double") / n_tok.cast("double")).alias(
            "stopword_ratio"
        ),
    )


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (md5 is identical across engines; xxhash64 is Spark-private.)"""
    norm = F.trim(F.regexp_replace(F.lower(col), _WS_NORM, " "))
    return F.md5(F.encode(norm, "utf-8"))


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """(doc_id, fp): winnowing document sketch — the rolling-hash
    fingerprint family (Schleimer/Wilkerson/Aiken 2003, the public MOSS
    scheme): hash every char k-gram of the normalized text, slide a
    window of w hashes, keep each window's minimum, distinct.

    Guarantees (from the public algorithm): any match of length
    ≥ w + k - 1 between two documents shares at least one selected
    fingerprint — the basis of plagiarism/near-dup detection at scale.

    Plan shape: k-grams built as a zip_with over k shifted char slices
    (O(1) evaluations of the normalization per row — see the HOF-lambda
    note on operators.dedup.shingles), then ONE posexplode + ONE
    doc_id-keyed window (sliding min) — a single uniform shuffle, no
    per-element re-hashing. Documents shorter than k + w - 1 normalized
    chars produce no rows (no full window exists)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS_NORM, " "))
    chars = F.split(norm, "")
    m = F.size(chars) - (k - 1)
    parts = [F.slice(chars, i + 1, F.greatest(m, F.lit(0))) for i in range(k)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, b))
    g = df.select("doc_id", F.posexplode(grams).alias("pos", "g"))
    h = g.select("doc_id", "pos", F.md5(F.encode(F.col("g"), "utf-8")).alias("h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    per_doc = Window.partitionBy("doc_id")
    return (
        h.withColumn("wmin", F.min("h").over(win))
        .withColumn("npos", F.count("*").over(per_doc))
        .filter(F.col("pos") <= F.col("npos") - w)
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf, rank): each document's top-k terms
    by tf·idf — the classic keyword-extraction / feature-selection pass
    a corpus pipeline runs before topic bucketing or quality triage.

    Deterministic and oracle-matched: tokenization is the same
    lower/whitespace-normalize/split the dedup shingles use, idf is
    ln(n_docs/df) rounded to 6 places BEFORE ranking (so the ordering
    compares identical values in any IEEE engine), ties break by term.

    Plan shape at scale: one explode + two hash aggregations (doc-term,
    then term), a broadcast of the one-row corpus count, and a doc-keyed
    window for top-k — no joins wider than the term dictionary."""
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS_NORM, " ")), " "),
        lambda t: t != F.lit(""),
    )
    tf = (
        df.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    ndocs = df.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def lm_bigram_scores(
    df: DataFrame, text_col: str = "text", k_smooth: float = 0.5
) -> DataFrame:
    """(doc_id, n_bigrams, nll): corpus-trained bigram language-model
    quality scores — the CCNet-style LM filter (Wenzek et al. 2020): fit
    add-k-smoothed bigram probabilities on the corpus itself, then score
    each document by its negative mean log-likelihood. High nll = the
    document's word transitions are unlike the corpus (gibberish, boiler-
    plate soup, wrong language) — the standard triage axis next to the
    Gopher rules.

    Determinism/parity discipline: p(cur|prev) = (c(prev,cur)+k) /
    (c(prev)+k·V) with every operand forced to double (DuckDB would
    otherwise run the arithmetic in DECIMAL); ln rounded to 6 places
    and carried as DECIMAL(18,6) so the per-document sum is exact and
    order-free (the house rule for distributed float aggregation); one
    final double division, rounded.

    Plan shape at scale: one token explode, two hash-agg count tables,
    two 1:1 equi-joins back onto the bigram rows (build sides unique
    per key — same shape as the tf-idf join), a broadcast one-row
    vocabulary scalar, and a doc-keyed aggregation. No windows, no
    python."""
    toks = F.filter(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), _WS_NORM, " ")),
            " ",
        ),
        lambda t: t != F.lit(""),
    )
    base = df.select("doc_id", toks.alias("toks"))
    m = F.greatest(F.size("toks") - 1, F.lit(0))
    bg = F.zip_with(
        F.slice("toks", 1, m),
        F.slice("toks", 2, m),
        lambda p, q: F.struct(p.alias("prev"), q.alias("cur")),
    )
    rows = base.select("doc_id", F.explode(bg).alias("b")).select(
        "doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur")
    )
    cb = rows.groupBy("prev", "cur").agg(F.count("*").alias("c_bg"))
    cp = rows.groupBy("prev").agg(F.count("*").alias("c_prev"))
    vocab = base.select(F.explode("toks").alias("term")).agg(
        F.countDistinct("term").alias("v")
    )
    k = F.lit(float(k_smooth))
    logp = F.round(
        F.log(
            (F.col("c_bg") + k) / (F.col("c_prev") + k * F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    return (
        rows.join(cb, ["prev", "cur"])
        .join(cp, "prev")
        .crossJoin(F.broadcast(vocab))
        .withColumn("lp", logp)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("s"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("s").cast("double") / F.col("n_bigrams"), 6
            ).alias("nll"),
        )
    )


def ngram_topk(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """(ngram, n_occurrences, rank): the corpus's k most frequent word
    n-grams — the vocabulary/phrase census run before tokenizer training
    and contamination audits.

    Counts every OCCURRENCE (not per-doc presence): one explode of the
    shingle array, one hash aggregation, then a TakeOrdered top-k
    (orderBy+limit — never a single-partition global sort; the ordering
    key (count desc, ngram asc) is total so the result is deterministic).
    rank is attached after the k-row truncation — a window over k rows,
    not over the corpus."""
    from skosconverter_spark.operators.dedup import shingles

    counts = (
        df.select(F.explode(shingles(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
        .limit(k)
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("ngram"))
    return counts.withColumn("rank", F.row_number().over(w))


def corpus_length_deciles(df: DataFrame, len_col: str = "n_chars") -> DataFrame:
    """(decile, n_docs, min_len, max_len, mean_len): the exact corpus
    length distribution — the first diagnostic anyone pulls on a new
    crawl snapshot. Semantics are EXACTLY ntile(10) OVER (ORDER BY len,
    doc_id), but computed without the scale-killer that implies: a naive
    ntile funnels every document row through ONE unpartitioned window
    task. Instead, the length histogram (groupBy(len).count() — a
    distributed hash agg whose output is bounded by the number of
    DISTINCT lengths, not documents) is cumulative-summed in a window
    over that tiny table only, and each length's global-rank interval
    [lo, hi] is intersected with the 10 closed-form ntile rank intervals
    (first n%10 deciles get ⌈n/10⌉ rows, the rest ⌊n/10⌋). The per-decile
    aggregates are tie-insensitive — rows of one length split across a
    boundary contribute the same len either side — so doc_id
    tie-breaking never has to be materialized. Exact integer sums keep
    mean_len bit-reproducible across engines."""
    hist = (
        df.select(F.col(len_col).alias("len"))
        .groupBy("len")
        .agg(F.count("*").alias("cnt"))
    )
    # window over the distinct-length table only (cardinality ≤ max doc
    # length, not corpus size) — a single partition of a tiny table
    w = Window.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hist = hist.withColumn("hi", F.sum("cnt").over(w)).withColumn(
        "lo", F.col("hi") - F.col("cnt") + 1
    )
    total = hist.groupBy().agg(F.sum("cnt").alias("n_total"))
    d = F.col("decile").cast("long")
    q = F.floor(F.col("n_total") / 10)
    r = F.col("n_total") % 10
    start = (d - 1) * q + F.least(d - 1, r) + 1
    end = d * q + F.least(d, r)
    overlap = (
        F.least(F.col("hi"), end) - F.greatest(F.col("lo"), start) + 1
    )
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "len", "lo", "hi", "n_total",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
        .withColumn("overlap", overlap)
        .filter(F.col("overlap") > 0)
        .groupBy("decile")
        .agg(
            F.sum("overlap").alias("n_docs"),
            F.min("len").alias("min_len"),
            F.max("len").alias("max_len"),
            F.round(
                F.sum(F.col("len") * F.col("overlap")).cast("double")
                / F.sum("overlap").cast("double"),
                6,
            ).alias("mean_len"),
        )
    )


# PII patterns: RE2 ∩ java.util.regex compatible (no lookaround, no
# backrefs) so the Spark plan and the DuckDB oracle match byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d()\- ]{6,}\d"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ips, n_phones): the standard
    pre-release scrub — emails, IPv4 addresses and phone-shaped digit
    runs replaced by typed placeholder tokens, with per-document match
    counts (counted on the ORIGINAL text; replacement order email→ip→
    phone so a longer match is never half-eaten by a shorter class).

    Pure regexp expressions — JVM-side, no Python. The synthetic corpus
    contains no PII, so the oracle checks the zero-hit passthrough;
    the planted-PII pytest (tests/test_round3_fixes.py) checks the
    actual redaction semantics."""
    t = F.col(text_col)
    clean = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    clean = F.regexp_replace(clean, PII_IPV4, "<IP>")
    clean = F.regexp_replace(clean, PII_PHONE, "<PHONE>")
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
    )


# --------------------------------------------------------------------------
# language identification (character n-gram heuristic, Arrow-batched)
# --------------------------------------------------------------------------

# top character trigrams per language (public frequency tables, trimmed)
_LANG_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "],
    "de": ["en ", "er ", " de", "der", "ie ", "ein", "ich", "sch", "ch ", " ge"],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", "que", " qu", "la "],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "ión", "ado", "que"],
    "nl": ["en ", " de", "de ", "an ", "van", " va", "een", " ee", "er ", "ij "],
}


def lang_id_kernel(text: str | None) -> str | None:
    """Score = count of profile-trigram hits; ties broken by language
    code; below 2 hits → 'und'."""
    if not text:
        return None
    t = f" {text.lower()} "
    best_lang, best_score = "und", 1
    for lang in sorted(_LANG_PROFILES):
        score = sum(t.count(g) for g in _LANG_PROFILES[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) via mapInPandas (one Python call per batch)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pred_lang": [lang_id_kernel(t) for t in pdf[text_col]],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, pred_lang string"
    )
