#!/usr/bin/env python3
"""Simulate the round driver's correctness pass: a PLAIN SparkSession
(no engine tuning — queries must self-tune, exactly the driver
condition), all registry queries in REGISTRATION ORDER in one session,
each compared to its DuckDB oracle through the driver's pandas
canonicalization.  Prints one line per query and a summary.

Usage: python3 tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: the driver's pre-registered battery tables — shared with
#: tools/slot_check.py so the two can never desync on a new table
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_battery_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def main() -> None:
    from pyspark.sql import SparkSession

    # deliberately untuned: the driver builds its own session
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    # battery-shape contract: exactly 50 registry entries, every one
    # with a DuckDB oracle (r3 upgraded the last 3 rows-only slots).
    # A registry merge/add that silently changes the driver's battery
    # must fail HERE, in the same session and order the driver uses.
    n_oracles = sum(1 for _fn, oracle in REGISTRY.values() if oracle is not None)
    assert len(REGISTRY) == 50, f"registry has {len(REGISTRY)} entries, expected 50"
    assert n_oracles == 50, f"{n_oracles} oracles, expected 50"

    con = duckdb.connect()
    register_battery_views(con, SF_DIR)

    n_pass = n_rows_only = n_fail = 0
    t_total = time.perf_counter()
    for name, (fn, oracle) in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            sp = fn(spark, SF_DIR).toPandas()
            if oracle is None:
                ok = len(sp) > 0
                canon(sp)  # must survive the canonicalizer
                status = "rows-only" if ok else "FAIL(0 rows)"
                n_rows_only += ok
                n_fail += not ok
            else:
                du = con.execute(oracle).df()
                ok = (
                    sorted(sp.columns) == sorted(du.columns)
                    and len(sp) == len(du)
                    and canon(sp) == canon(du)
                )
                status = "pass" if ok else "FAIL"
                n_pass += ok
                n_fail += not ok
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"ERR {type(exc).__name__}: {exc}"[:120]
            n_fail += 1
        print(f"{name:28s} {time.perf_counter() - t0:7.2f}s  {status}")

    print(
        f"\n{n_pass} pass + {n_rows_only} rows-only, {n_fail} fail"
        f" of {len(REGISTRY)} in {time.perf_counter() - t_total:.1f}s"
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
