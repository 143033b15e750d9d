"""Notion-format document renderers: CSV / Markdown / JSON / Confluence-XML.

Byte-identical re-expressions of the reference's four forward sinks
(skos_converter.py: to_notion_csv :764-888, to_notion_markdown
:890-1041, to_xml :1043-1170, to_notion_json :1172-1281).

Split in two layers:

1. ``document_rows`` — Spark: the distributed DFS row table
   (plans.hierarchy.dfs_rows) joined with per-concept metadata
   (plans.views.concept_meta). All heavy relational work happens here.
2. ``render_{csv,markdown,json,xml}_rows`` — pure-Python kernels over
   the ordered row list of ONE vocabulary document. Golden-path string
   assembly stays in Python (never Spark SQL string functions — §4.3)
   so bytes can't drift. They run inside ``applyInPandas`` — one
   vocabulary = one group = one Python call; a corpus of many
   vocabularies renders in parallel across executors.
"""

from __future__ import annotations

import io
import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skosconverter_spark.config import EngineConfig
from skosconverter_spark.plans import views
from skosconverter_spark.plans.hierarchy import dfs_rows

CSV_FIELDS = [
    "Title", "Parent", "Concept Scheme", "Definition",
    "Alternative Labels", "Notation", "URI", "Level",
]


_DOC_ROWS_SCHEMA = (
    "sort_path array<string>, section string, origin string, uri string, "
    "label string, level int, parent_label string, scheme_label string, "
    "top_idx int, has_children boolean, definition string, "
    "alt_labels array<string>, notation string, same_as array<string>, "
    "related array<string>"
)


# Driver-sized paths collect a whole table to one machine. A vocabulary
# is driver-sized by construction; a pages/triples CORPUS is not. The
# guard turns that contract into a loud failure instead of a driver OOM.
MAX_DRIVER_ROWS = 5_000_000


def guard_driver_sized(df: DataFrame, what: str, max_rows: int = MAX_DRIVER_ROWS) -> None:
    """Fail fast when a driver-sized path is misused on a corpus-sized
    table. limit(max_rows+1).count() early-exits the scan — it never
    moves max_rows rows anywhere, it just proves whether row max_rows+1
    exists. Set max_rows=0 to disable (caller takes responsibility)."""
    if max_rows and df.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"{what} materializes rows on the driver and is gated at "
            f"{max_rows} rows; this input exceeds it. Use the distributed "
            "sink (render_documents / write_graph_table) for corpus-sized "
            "tables, or raise max_rows explicitly."
        )


def collect_triples(triples: DataFrame, max_rows: int = MAX_DRIVER_ROWS) -> list[tuple]:
    guard_driver_sized(triples, "collect_triples", max_rows)
    # Arrow transfer instead of .collect(): the row path deserializes one
    # pickled Row per triple and pays a __getattr__ field lookup per
    # column (measured ~2 s of the 3 s skos_forward collect at 177k
    # triples); the Arrow path moves six columnar batches and converts
    # each column once.
    tbl = triples.select(
        "subj", "pred", "obj", "obj_is_literal", "obj_lang", "seq"
    ).toArrow()
    return list(
        zip(*(tbl.column(i).to_pylist() for i in range(tbl.num_columns)))
    )


def render_text_local(triples: DataFrame, fmt: str, config: EngineConfig) -> str:
    """Whole-document render via the driver-local DFS kernel
    (plans.local_dfs): one collect, zero fixpoint jobs. The right path
    for driver-sized vocabularies — which SKOS vocabularies are by
    construction; the distributed dfs_rows path covers graphs that
    aren't. A differential test pins both to identical output."""
    from skosconverter_spark.plans.local_dfs import dfs_rows_local

    rows = dfs_rows_local(collect_triples(triples), config)
    return _KERNELS[fmt](rows)


def document_rows(
    triples: DataFrame, config: EngineConfig, strategy: str = "distributed"
) -> DataFrame:
    """DFS-ordered row table with full concept metadata, ready to render.

    strategy='local' collects the (vocabulary-sized) triples and runs
    the driver-local kernel; 'distributed' runs the min-path fixpoint.
    """
    if strategy == "local":
        from skosconverter_spark.plans.local_dfs import dfs_rows_local

        local = dfs_rows_local(collect_triples(triples), config)
        return triples.sparkSession.createDataFrame(local, _DOC_ROWS_SCHEMA)
    rows = dfs_rows(triples, config)
    meta = views.concept_meta(
        triples, config, rows.filter(F.col("uri").isNotNull()).select("uri").distinct()
    ).drop("label")
    empty = F.array().cast("array<string>")
    return rows.join(meta, "uri", "left").select(
        rows["*"],
        F.coalesce(F.col("definition"), F.lit("")).alias("definition"),
        F.coalesce(F.col("alt_labels"), empty).alias("alt_labels"),
        F.coalesce(F.col("notation"), F.lit("")).alias("notation"),
        F.coalesce(F.col("same_as"), empty).alias("same_as"),
        F.coalesce(F.col("related"), empty).alias("related"),
    )


# --------------------------------------------------------------------------
# pure-Python kernels (input: list of dict rows ordered by sort_path)
# --------------------------------------------------------------------------


def _md_level(row) -> int:
    # markdown/xml/json levels: tops and unassigned anchor at 1 (csv level
    # already 1); scheme-orphan subtrees shift up by one (csv anchors at 2,
    # the reference calls add_concept_md(orphan, 1) — :1026)
    return row["level"] - 1 if row["section"] == "orphan" else row["level"]


def _is_concept(row) -> bool:
    return (
        row["section"] in ("top", "orphan", "unassigned")
        and row["origin"] != "ghost"
    )


def render_csv_rows(rows: list[dict]) -> str:
    """to_notion_csv byte layout (:764-888): csv.DictWriter defaults —
    QUOTE_MINIMAL, CRLF line terminator."""
    import csv

    buf = io.StringIO(newline="")
    writer = csv.DictWriter(buf, fieldnames=CSV_FIELDS)
    writer.writeheader()
    for r in rows:
        if r["origin"] == "ghost":  # markdown-only separator slots
            continue
        sec = r["section"]
        if sec == "scheme":
            rec = {
                "Title": f"[SCHEME] {r['label']}", "Parent": "",
                "Concept Scheme": r["scheme_label"], "Definition": "",
                "Alternative Labels": "", "Notation": "", "URI": r["uri"],
                "Level": 0,
            }
        elif sec == "orph_hdr":
            rec = {
                "Title": f"  [Other Concepts in {r['scheme_label']}]",
                "Parent": f"[SCHEME] {r['scheme_label']}",
                "Concept Scheme": r["scheme_label"],
                "Definition": "Concepts in this scheme without broader relations",
                "Alternative Labels": "", "Notation": "", "URI": "", "Level": 1,
            }
        elif sec == "unass_hdr":
            rec = {
                "Title": "[UNASSIGNED CONCEPTS]", "Parent": "",
                "Concept Scheme": "",
                "Definition": "Concepts not associated with any concept scheme",
                "Alternative Labels": "", "Notation": "", "URI": "", "Level": 0,
            }
        else:
            rec = {
                "Title": "  " * r["level"] + r["label"],
                "Parent": r["parent_label"],
                "Concept Scheme": r["scheme_label"],
                "Definition": r["definition"],
                "Alternative Labels": ", ".join(r["alt_labels"]),
                "Notation": r["notation"],
                "URI": r["uri"],
                "Level": r["level"],
            }
        writer.writerow(rec)
    return buf.getvalue()


def _md_concept_block(out: list[str], r: dict, level: int) -> None:
    """_format_concept_markdown + _add_concept_metadata_to_markdown
    (:946-1004), use_bullets=False (all call sites hardcode it)."""
    label = r["label"]
    if level <= 6:
        prefix = ""
        if level == 4:
            prefix = "▸ "
        elif level == 5:
            prefix = "▹ "
        elif level >= 6:
            prefix = "◦ "
        out.append(f"{'#' * min(level, 6)} {prefix}{label}\n")
    else:
        indent = "  " * (level - 6)
        out.append(f"{indent}**◦ {label}**\n")
    if r["notation"]:
        out.append(f"_Notation:_ `{r['notation']}`  ")
    if r["definition"]:
        out.append(f"_Definition:_ {r['definition']}  ")
    if r["alt_labels"]:
        out.append(f"_Alternative Labels:_ {', '.join(r['alt_labels'])}  ")
    out.append(f"_URI:_ <{r['uri']}>")
    if r["same_as"]:
        out.append("_Same as:_ " + ", ".join(f"<{x}>" for x in r["same_as"]) + "  ")
    if r["related"]:
        out.append("_Related:_ " + ", ".join(f"<{x}>" for x in r["related"]) + "  ")
    out.append("\n")


def render_markdown_rows(rows: list[dict]) -> str:
    """to_notion_markdown (:890-1041): '\\n'.join of items; '' separator
    before every top slot at index > 0 — INCLUDING slots whose concept
    was already processed (ghost rows, :1017-1019) — and before every
    orphan; '' after a concept's block whenever it has tree children
    (:911-915), even when every child was emitted elsewhere."""
    out: list[str] = []
    for r in rows:
        if r["origin"] == "ghost":
            # processed top slot at i>0: separator only, no block
            out.append("")
            continue
        if not _is_concept(r):
            continue
        level = _md_level(r)
        if r["origin"] == "anchor":
            if r["section"] == "top":
                if r["top_idx"] > 0:
                    out.append("")
            else:  # orphan / unassigned: '' always precedes (:1025, :1034)
                out.append("")
        _md_concept_block(out, r, level)
        if r["has_children"]:
            out.append("")
    return "\n".join(out)


def _xml_escape(text: str) -> str:
    if not text:
        return ""
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&#39;")
    )


def render_xml_rows(rows: list[dict]) -> str:
    """to_xml (:1043-1170): Confluence storage-format wrapper, h{level}
    headings, metadata paragraphs, URI info macro, '' spacing."""
    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        "<ac:confluence-content>",
        '<ac:structured-macro ac:name="expand" ac:schema-version="1">',
        '<ac:parameter ac:name="title">SKOS Vocabulary</ac:parameter>',
        "<ac:rich-text-body>",
    ]
    for r in rows:
        if not _is_concept(r):
            continue
        level = _md_level(r)
        label = _xml_escape(r["label"])
        if level <= 6:
            out.append(f"<h{level}>{label}</h{level}>")
        else:
            indent = "&nbsp;" * ((level - 6) * 4)
            out.append(f"<p>{indent}<strong>{label}</strong></p>")
        if r["definition"]:
            out.append(f"<p><em>Definition:</em> {_xml_escape(r['definition'])}</p>")
        if r["notation"]:
            out.append(
                f"<p><em>Notation:</em> <code>{_xml_escape(r['notation'])}</code></p>"
            )
        if r["alt_labels"]:
            alt = ", ".join(_xml_escape(x) for x in r["alt_labels"])
            out.append(f"<p><em>Alternative Labels:</em> {alt}</p>")
        out.append('<ac:structured-macro ac:name="info" ac:schema-version="1">')
        out.append('<ac:parameter ac:name="title">URI</ac:parameter>')
        out.append("<ac:rich-text-body>")
        out.append(f"<p><code>{_xml_escape(str(r['uri']))}</code></p>")
        out.append("</ac:rich-text-body>")
        out.append("</ac:structured-macro>")
        out.append("")
    out.append("</ac:rich-text-body>")
    out.append("</ac:structured-macro>")
    out.append("</ac:confluence-content>")
    return "\n".join(out)


def _json_id(uri: str) -> str:
    return str(uri).replace("/", "_").replace("#", "_")


def render_json_rows(rows: list[dict]) -> str:
    """to_notion_json (:1172-1281): nested vocabulary dict; the flat
    ``concepts`` list is post-order (each node appended after its whole
    subtree — build_concept_dict appends children first, callers append
    the root after it returns)."""
    data = {"vocabulary": {"schemes": [], "concepts": []}}
    schemes_by_label: dict[str, dict] = {}
    current_scheme: dict | None = None
    unassigned: list[dict] = []
    # stack of (md_level, concept_dict) for nesting reconstruction
    stack: list[tuple[int, dict]] = []
    concepts_flat = data["vocabulary"]["concepts"]

    def pop_to(level: int) -> None:
        while stack and stack[-1][0] >= level:
            _, d = stack.pop()
            concepts_flat.append(d)

    for r in rows:
        if r["origin"] == "ghost":  # markdown-only separator slots
            continue
        sec = r["section"]
        if sec == "scheme":
            pop_to(1)
            scheme_dict = {
                "id": _json_id(r["uri"]),
                "title": r["scheme_label"],
                "uri": str(r["uri"]),
                "top_concepts": [],
                "other_concepts": [],
            }
            data["vocabulary"]["schemes"].append(scheme_dict)
            schemes_by_label[r["scheme_label"]] = scheme_dict
            current_scheme = scheme_dict
            continue
        if sec in ("orph_hdr", "unass_hdr"):
            pop_to(1)
            if sec == "orph_hdr":
                current_scheme = schemes_by_label[r["scheme_label"]]
            continue
        level = _md_level(r)
        pop_to(level)
        if sec == "unassigned" and level == 1:
            parent_id = None
        elif r["origin"] == "anchor":
            parent_id = current_scheme["id"] if current_scheme else None
        else:
            parent_id = stack[-1][1]["id"] if stack else None
        d = {
            "id": _json_id(r["uri"]),
            "title": r["label"],
            "parent_id": parent_id,
            "definition": r["definition"],
            "alternative_labels": list(r["alt_labels"]),
            "notation": r["notation"],
            "uri": str(r["uri"]),
            "children": [],
        }
        if r["origin"] == "anchor":
            if sec == "top":
                current_scheme["top_concepts"].append(d)
            elif sec == "orphan":
                current_scheme["other_concepts"].append(d)
            else:
                unassigned.append(d)
        elif stack:
            stack[-1][1]["children"].append(d)
        stack.append((level, d))
    pop_to(1)
    if unassigned:
        data["vocabulary"]["unassigned_concepts"] = unassigned
    return json.dumps(data, indent=2, ensure_ascii=False)


_KERNELS = {
    "csv": render_csv_rows,
    "md": render_markdown_rows,
    "json": render_json_rows,
    "xml": render_xml_rows,
}

_ROW_COLS = [
    "section", "origin", "uri", "label", "level", "parent_label",
    "scheme_label", "top_idx", "has_children", "definition", "alt_labels",
    "notation", "same_as", "related",
]


def render_documents(
    doc_rows: DataFrame, fmt: str, vocab_col: str | None = None
) -> DataFrame:
    """Render one output document per vocabulary group → (vocab_id, payload).

    ``doc_rows`` is document_rows() output, optionally carrying a
    ``vocab_col`` grouping column for multi-vocabulary corpora (the
    reference's batch mode, one output file per input file — :488-499).
    Grouped-map UDF: each group's rows are sorted by sort_path inside the
    kernel, so no global sort is needed."""
    kernel = _KERNELS[fmt]
    src = doc_rows.withColumn(
        "vocab_id", F.col(vocab_col) if vocab_col else F.lit("_all")
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sort_path", key=lambda s: s.map(tuple))
        for c in ("alt_labels", "same_as", "related"):
            pdf[c] = pdf[c].map(lambda v: [] if v is None else list(v))
        rows = pdf[_ROW_COLS].to_dict("records")
        return pd.DataFrame(
            {"vocab_id": [pdf["vocab_id"].iloc[0]], "payload": [kernel(rows)]}
        )

    return src.groupBy("vocab_id").applyInPandas(
        render, "vocab_id string, payload string"
    )


def render_document_text(
    doc_rows: DataFrame, fmt: str, max_rows: int = MAX_DRIVER_ROWS
) -> str:
    """Single-vocabulary convenience: the whole corpus as one document.

    A single output document is driver-sized by definition (the
    reference writes ONE file), so this collects the row table via Arrow
    and runs the kernel driver-side — skipping the one-group shuffle the
    grouped-map path would force. Guarded: misuse on a corpus-sized row
    table fails loudly instead of OOMing the driver."""
    guard_driver_sized(doc_rows, "render_document_text", max_rows)
    pdf = doc_rows.toPandas()
    pdf = pdf.sort_values("sort_path", key=lambda s: s.map(tuple))
    for c in ("alt_labels", "same_as", "related"):
        pdf[c] = pdf[c].map(lambda v: [] if v is None else list(v))
    return _KERNELS[fmt](pdf[_ROW_COLS].to_dict("records"))
