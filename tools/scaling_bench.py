"""Scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the driver instruction
the two-cluster-size criterion is evidenced by running the SAME job at
two parallelism levels on the SAME input: local[N] vs local[4N] (one
JVM each, fresh subprocess per run so executors/shuffle pools are
sized honestly).

Job under test: the full KG construction pipeline (extract → salted
repartition → mention scan → linking → canonicalization → triples) on a
deterministically synthesized pages corpus.

Efficiency = (throughput@4N / throughput@N) / 4. Prints a JSON report
and (with --update-baseline) rewrites the BENCH section of BASELINE.md.

Usage: python tools/scaling_bench.py [--n 8] [--rows 40000] [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from skosconverter_spark.session import get_spark
from skosconverter_spark.config import EngineConfig
from skosconverter_spark.kg.pipeline import run_pipeline
from skosconverter_spark.schemas import DOCS
from skosconverter_spark.sources.pages import synthesize_pages
from skosconverter_spark.sources.parse_udf import extract_triples, ok_triples
import bench

cpus = {cpus}
rows = {rows}
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
cfg = EngineConfig()
pages = synthesize_pages(spark, rows, partitions=cpus)
vdocs = spark.createDataFrame([("v", "v", "ttl", bench._bench_vocab_ttl())], schema=DOCS)
vocab = ok_triples(extract_triples(vdocs, cfg)).cache(); vocab.count()
# warm the JVM/python workers so the measurement is steady-state
pages.limit(200).count()
with tempfile.TemporaryDirectory() as d:
    t0 = time.time()
    out = run_pipeline(spark, pages, vocab, d, partitions=cpus)
    n_triples = out["triples"].count()
    dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "rows": rows, "wall_sec": round(dt, 2),
                   "triples": n_triples,
                   "pages_per_sec": round(rows / dt, 1),
                   "triples_per_sec": round(n_triples / dt, 1)}}))
"""


def run_at(cpus: int, rows: int) -> dict:
    code = _CHILD.format(repo=str(REPO), cpus=cpus, rows=rows)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=str(REPO),
        timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{cpus}]:\n{proc.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rows", type=int, default=40_000)
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    small = run_at(args.n, args.rows)
    large = run_at(args.n * 4, args.rows)
    eff = (large["pages_per_sec"] / small["pages_per_sec"]) / 4.0
    report = {
        "job": "kg_pipeline",
        "rows": args.rows,
        f"local[{args.n}]": small,
        f"local[{args.n * 4}]": large,
        "speedup": round(large["pages_per_sec"] / small["pages_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report, indent=2))

    if args.update_baseline:
        md = REPO / "BASELINE.md"
        marker = "\n## Measured scaling (this engine)\n"
        text = md.read_text()
        if marker in text:
            text = text[: text.index(marker)]
        text += (
            f"{marker}\n"
            f"Full KG pipeline on {args.rows} synthesized pages, same input, "
            f"one JVM per run (sandbox stand-in for N vs 4N executors per the "
            f"driver instruction):\n\n"
            f"| parallelism | wall (s) | pages/s | triples/s |\n"
            f"|---|---|---|---|\n"
            f"| local[{args.n}] | {small['wall_sec']} | {small['pages_per_sec']} | {small['triples_per_sec']} |\n"
            f"| local[{args.n * 4}] | {large['wall_sec']} | {large['pages_per_sec']} | {large['triples_per_sec']} |\n\n"
            f"Speedup {report['speedup']}x → scaling efficiency "
            f"**{report['scaling_efficiency']}** (target ≥ 0.8 would equal "
            f"3.2x; see analysis in BENCH notes).\n"
        )
        md.write_text(text)
        print(f"updated {md}")


if __name__ == "__main__":
    main()
