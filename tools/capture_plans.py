#!/usr/bin/env python3
"""Capture .explain('formatted') for the named slots into
plans/<tag>/<slot>_<suffix>.txt (the judge-facing plan evidence).

Usage: python3 tools/capture_plans.py TAG SUFFIX NAME [NAME ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from tools.slot_check import parse_args

    tag, suffix = sys.argv[1], sys.argv[2]
    args, sf_dir = parse_args(sys.argv[3:])

    from wikiextractor_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from wikiextractor_spark.queries import REGISTRY

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in args:
        fn, _oracle = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{outdir}/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
