"""Per-query profiling harness (dev utility, not shipped API).

Usage: python scripts_profile.py name1 name2 ...

For each named workload query, reports (best of N runs):
- construct: Python time to build the DataFrame (includes any eager
  actions a query runs while composing, e.g. localCheckpoint)
- plan:      time for Catalyst analysis+optimization (explain cost)
- exec:      time for the noop-sink write of the pre-built frame
- total:     fresh end-to-end construct+noop (the bench's number)
- jobs:      Spark job count the fresh end-to-end run triggered
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pandasy_spark.session import get_spark  # noqa: E402
from pandasy_spark.workload import QUERIES  # noqa: E402


def main(names):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    spark = get_spark("pandasy-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warm
    QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    print(f"{'query':35s} {'constr':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s} {'jobs':>5s}")
    for name in names:
        best = {"construct": 1e9, "plan": 1e9, "exec": 1e9, "total": 1e9}
        jobs = 0
        for _ in range(runs):
            for tv in spark.catalog.listTables():
                if tv.isTemporary:
                    spark.catalog.dropTempView(tv.name)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().optimizedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            best["construct"] = min(best["construct"], t1 - t0)
            best["plan"] = min(best["plan"], t2 - t1)
            best["exec"] = min(best["exec"], t3 - t2)
            # fresh end-to-end with job counting
            n0 = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
            t4 = time.perf_counter()
            df2 = QUERIES[name](spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            t5 = time.perf_counter()
            n1 = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
            best["total"] = min(best["total"], t5 - t4)
            jobs = n1 - n0
        print(f"{name:35s} {best['construct']:7.2f} {best['plan']:7.2f} "
              f"{best['exec']:7.2f} {best['total']:7.2f} {jobs:5d}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
