"""Steadier per-query timing for optimization A/B work (dev utility).

Usage: python scripts_time.py name1 name2 ...

Per query: construct+noop run REPS times (default 4) in one warm
session, report min/median and the Spark job count of the last run.
Min-of-4 warm is far less host-noise-sensitive than the bench's
best-of-3 (which charges the first, coldest run); use bench.py for
the official numbers, this for change-local deltas.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pandasy_spark.session import get_spark  # noqa: E402
from pandasy_spark.workload import QUERIES  # noqa: E402


def main(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("TIME_REPS", "4"))
    spark = get_spark("pandasy-spark-time")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    out = {}
    for name in names:
        ts = []
        jobs = None

        def _job_id():
            # private Spark internals: degrade to None on any change
            # across Spark versions rather than breaking the tool
            try:
                return sc._jsc.sc().dagScheduler().nextJobId()
            except Exception:  # noqa: BLE001 — diagnostics only
                return None

        for _ in range(reps):
            for tv in spark.catalog.listTables():
                if tv.isTemporary:
                    spark.catalog.dropTempView(tv.name)
            spark.catalog.clearCache()
            n0 = _job_id()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            n1 = _job_id()
            jobs = (n1 - n0) if n0 is not None and n1 is not None else None
        out[name] = {
            "min": round(min(ts), 3),
            "med": round(statistics.median(ts), 3),
            "jobs": jobs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
