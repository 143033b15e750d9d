"""Build the spark-submit artifact: a --py-files zip of the package.

The north rule's deployment shape is ``spark-submit --py-files`` on a
multi-executor cluster; this produces the zip and prints the submit
command. Only source files ship (no tests, no caches), so the artifact
is what executors actually import.

Usage:  python tools/make_submit.py [out.zip]
Submit: spark-submit --py-files skosconverter_spark.zip \
            --master <cluster> examples/run_kg_job.py \
            --pages <parquet> --vocab <ttl> --out <dir>
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "skosconverter_spark"


def build(out: Path) -> list[str]:
    names = []
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(PKG.rglob("*.py")):
            if "__pycache__" in f.parts:
                continue
            arc = str(f.relative_to(REPO))
            z.write(f, arc)
            names.append(arc)
    return names


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "skosconverter_spark.zip"
    names = build(out)
    print(f"wrote {out} ({len(names)} files)")
    print(f"spark-submit --py-files {out.name} --master <cluster> "
          "examples/run_kg_job.py --pages <parquet> --vocab <ttl> --out <dir>")


if __name__ == "__main__":
    main()
