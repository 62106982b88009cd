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

from tools.driver_sim import canon, register_battery_views  # noqa: E402


def parse_args(argv: list[str]) -> tuple[list[str], str]:
    """→ (slot names, sf_dir); exits with usage on a malformed call
    (missing --sf value, no names) BEFORE paying Spark startup."""
    names = list(argv)
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in names:
        i = names.index("--sf")
        if i + 1 >= len(names):
            sys.exit("usage: --sf needs a directory argument")
        sf_dir = names[i + 1]
        names = names[:i] + names[i + 2:]
    if not names:
        sys.exit("usage: slot_check.py NAME [NAME ...] [--sf DIR]")
    return names, sf_dir


def main() -> None:
    args, sf_dir = parse_args(sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("slot-check")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    unknown = [n for n in args if n not in REGISTRY]
    if unknown:
        spark.stop()
        sys.exit(f"unknown slot names: {unknown}")

    con = duckdb.connect()
    register_battery_views(con, sf_dir)

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
