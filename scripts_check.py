"""Ad-hoc single-query oracle checker (dev utility, not shipped API).

Usage: python scripts_check.py name1 name2 ...  — runs each named
workload query and its DuckDB oracle at sf0.01 and reports match.
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession


def normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].where(pd.notna(pdf[c]), None)
    return pdf.sort_values(
        by=list(pdf.columns), na_position="last", ignore_index=True
    )


def main(names):
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    import os

    SF = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ok = True
    for name in names:
        a = normalize(qs[name](spark, SF).toPandas())
        x = normalize(con.execute(osql[name]).df())
        good = a.shape == x.shape and a.equals(x)
        ok &= good
        print(name, "MATCH" if good else "MISMATCH", a.shape, x.shape, flush=True)
        if not good:
            print("spark:\n", a.head(8), "\noracle:\n", x.head(8))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1:])
