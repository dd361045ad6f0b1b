"""Dump .explain('formatted') for named registry queries to files.

Usage:
    python scripts_plans.py <outdir> <suffix> <name> [<name> ...]

Writes <outdir>/<name>_<suffix>.txt for each query.  Runs against
$SPARK_GRAFT_SF_DIR (default sf0.1) in the canonical bench session so
the captured plans are the ones the bench executes.  Queries whose
construction RUNS work (streaming gates stage and drain their stream at
construct time) still produce a plan — for those the file records the
post-hoc sink-read plan plus a note.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pandasy_spark.session import get_spark  # noqa: E402
from pandasy_spark.workload import QUERIES  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pandasy-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
