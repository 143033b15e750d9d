"""Full-surface oracle parity, machine-asserted in the suite.

The driver correctness gate samples a prefix of queries(); this test
runs the SAME gate replica (tools/oracle_check.run_checks — row count,
column names, coarse types, order-insensitive values vs DuckDB) over
EVERY registered query at sf0.01, so "local replica green for the whole
surface" holds round over round without a manual run. Slowest test in
the suite by design — one Spark query + one DuckDB query per registry
entry (len(queries()) of each; no hardcoded count that can drift).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def test_full_surface_oracle_parity(spark):
    from tools.oracle_check import run_checks

    failures = run_checks(spark, SF_DIR, verbose=False)
    assert not failures, f"oracle parity failures: {failures}"
