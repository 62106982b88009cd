#!/usr/bin/env python3
"""One-slot oracle check during development: driver_sim's exact
compare, restricted to the slot names given on the command line.

Usage: python3 tools/slot_check.py NAME [NAME ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.driver_sim import canon  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("slot-check")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fail = 0
    for name in args:
        fn, oracle = REGISTRY[name]
        t0 = time.perf_counter()
        sp = fn(spark, sf_dir).toPandas()
        du = con.execute(oracle).df()
        cols_ok = sorted(sp.columns) == sorted(du.columns)
        rows_ok = len(sp) == len(du)
        hash_ok = cols_ok and canon(sp) == canon(du)
        ok = cols_ok and rows_ok and hash_ok
        fail += not ok
        print(
            f"{name:28s} {time.perf_counter() - t0:7.2f}s  "
            f"{'pass' if ok else 'FAIL'} (cols={cols_ok} rows={len(sp)}/"
            f"{len(du)} hash={hash_ok})"
        )
        if not ok and cols_ok:
            csp, cdu = canon(sp), canon(du)
            only_sp = [r for r in csp if r not in cdu][:5]
            only_du = [r for r in cdu if r not in csp][:5]
            print("  spark-only:", only_sp)
            print("  duck-only :", only_du)
        elif not cols_ok:
            print("  spark cols:", sorted(sp.columns))
            print("  duck cols :", sorted(du.columns))
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
