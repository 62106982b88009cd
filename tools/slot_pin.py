#!/usr/bin/env python3
"""Warm-pin protocol for slot growths: per slot, 1 warmup + 3 timed
reps (bench.py's noop-write evaluation), printed per-rep with the
median — run idle and record the result in PERF.md.

Usage: python3 tools/slot_pin.py NAME [NAME ...] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tools.slot_check import parse_args

    args, sf_dir = parse_args(sys.argv[1:])

    from wikiextractor_spark.session import get_spark

    spark = get_spark("slot-pin")
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    unknown = [n for n in args if n not in REGISTRY]
    if unknown:
        spark.stop()
        sys.exit(f"unknown slot names: {unknown}")

    # pay the one-time parquet-committer init before any timing
    spark.range(5).write.mode("overwrite").parquet("/tmp/slot_pin_warm")

    for name in args:
        fn, _oracle = REGISTRY[name]
        reps = []
        for r in range(4):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if r > 0:  # rep 0 is the warmup
                reps.append(dt)
        print(
            f"{name:28s} median {statistics.median(reps):6.3f}s "
            f"({'/'.join(f'{x:.3f}' for x in reps)})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
