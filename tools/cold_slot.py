#!/usr/bin/env python3
"""Cold-slot protocol: run the named slots EXACTLY the way bench.py
does — fresh session, the same four engine warmups, then each slot
timed ONCE cold (fn + noop), with the fn()/noop split reported.  This
is the number the driver's single-shot bench actually records per
slot (slot_pin's warm medians hide first-evaluation costs: Janino
compile, regex compile, per-slot artifact binds).

Usage: python3 tools/cold_slot.py NAME [NAME ...] [--sf DIR]
Each NAME runs in THIS session in the given order (order matters for
shared lazy init — list slots in bench order when chasing bench
numbers).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tools.slot_check import parse_args

    args, sf_dir = parse_args(sys.argv[1:])

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from wikiextractor_spark.session import get_spark

    spark = get_spark("cold-slot", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    unknown = [n for n in args if n not in REGISTRY]
    if unknown:
        spark.stop()
        sys.exit(f"unknown slot names: {unknown}")

    # bench.py's four warmups, verbatim in spirit: JVM/scan, parquet
    # committer, Arrow kernel path, streaming machinery
    import shutil
    import tempfile

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    wdir = tempfile.mkdtemp(prefix="cold_slot_warm_")
    try:
        spark.read.parquet(f"{sf_dir}/region.parquet").limit(5).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{wdir}/warm")
        from pyspark.sql.functions import pandas_udf

        _arrow_warm = pandas_udf(lambda s: s, "string")
        (
            spark.range(5).selectExpr("CAST(id AS STRING) AS s")
            .select(_arrow_warm("s"))
            .write.mode("overwrite").format("noop").save()
        )
        region_schema = spark.read.parquet(f"{sf_dir}/region.parquet").schema
        wq = (
            spark.readStream.schema(region_schema)
            .option("pathGlobFilter", "region.parquet")
            .parquet(sf_dir)
            .groupBy("r_regionkey")
            .count()
            .writeStream.format("noop")
            .outputMode("complete")
            .option("checkpointLocation", f"{wdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not wq.awaitTermination(60):
            wq.stop()  # never rmtree a live stream's checkpoint
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    for name in args:
        fn, _oracle = REGISTRY[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        print(
            f"{name:28s} cold {t2 - t0:6.3f}s  "
            f"(fn {t1 - t0:6.3f}s + noop {t2 - t1:6.3f}s)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
