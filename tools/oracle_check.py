"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() in DuckDB over the same sf dir,
compare row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return v


def df_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def coarse_type(t: str) -> str:
    """Collapse a Spark dtype / DuckDB type string into a comparable family.

    The driver gate hashes *typed* values (Arrow), so e.g. DuckDB HUGEINT
    (what windowed sum(BIGINT) returns) hash-differs from Spark BIGINT even
    when every value is equal — corpus_pack went red in round 3 exactly this
    way. HUGEINT deliberately maps to its own family so it never matches:
    the oracle must CAST it down explicitly.
    """
    t = t.lower().strip()
    if t.startswith(("array<", "list<")) or t.endswith("[]"):
        return "list"
    if t.startswith(("struct", "map")) or t.startswith("row("):
        return "struct"
    if t == "hugeint" or t == "int128":
        return "hugeint"
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long",
             "utinyint", "usmallint", "uinteger", "ubigint",
             "int8", "int16", "int32", "int64"):
        return "int"
    if t in ("double", "float", "real", "float32", "float64"):
        return "float"
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal"
    if t in ("string", "varchar", "text", "large_string"):
        return "string"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date" or t.startswith("date32"):
        return "date"
    if t in ("binary", "blob", "varbinary", "bytea"):
        return "binary"
    return t


def type_drift(scols, sdtypes, ocols, otypes):
    """Return [(col, spark_family, duck_family), ...] for families that differ."""
    smap = {c: coarse_type(t) for c, t in zip(scols, sdtypes)}
    omap = {c: coarse_type(str(t)) for c, t in zip(ocols, otypes)}
    return [
        (c, smap[c], omap[c])
        for c in sorted(set(smap) & set(omap))
        if smap[c] != omap[c]
    ]


def run_checks(spark, sf_dir: str, only=None, verbose: bool = True) -> list[str]:
    """Run the gate replica over queries()/oracle_sql(); return the list
    of failing query names. Reused by the CLI below and by the
    full-surface parity pytest (tests/test_surface_parity.py), so
    "local replica green for the whole registered surface" is asserted
    by the suite each round rather than run by hand."""
    import __spark_entry__ as e

    def say(msg):
        if verbose:
            print(msg)

    only = set(only) if only else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows_raw = sdf.collect()
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows, scols_sorted = df_to_rows(scols, [tuple(r) for r in srows_raw])
        except Exception as exc:
            say(f"FAIL {name}: spark error {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            say(f"ok   {name}: rows={len(srows)} (rows-only, no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            otypes = res.types
            orows, ocols_sorted = df_to_rows(ocols, res.fetchall())
        except Exception as exc:
            say(f"FAIL {name}: oracle error {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if scols_sorted != ocols_sorted:
            say(f"FAIL {name}: columns {scols_sorted} vs {ocols_sorted}")
            failures.append(name)
            continue
        drift = type_drift(scols, sdtypes, ocols, otypes)
        if drift:
            say(f"FAIL {name}: type drift (spark vs duckdb): {drift}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            say(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            failures.append(name)
            continue
        if srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            say(f"FAIL {name}: values differ; first diffs: {diff}")
            failures.append(name)
            continue
        say(f"ok   {name}: rows={len(srows)} values match")
    return failures


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    from skosconverter_spark.session import get_spark

    # overridable so determinism can be probed at adversarial
    # parallelism (e.g. SPARK_ORACLE_MASTER=local[4]
    # SPARK_ORACLE_PARTS=17): every oracle-checked result must be
    # identical under any partitioning
    spark = get_spark(
        master=os.environ.get("SPARK_ORACLE_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("SPARK_ORACLE_PARTS", "8")),
    )
    failures = run_checks(spark, sf_dir, only=only, verbose=True)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
