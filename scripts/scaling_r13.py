#!/usr/bin/env python
"""r13 verdict ask #8: one scaling sample at ~sf1 for the heavy trained
family, so the verdict can separate "serial algorithm" from "small data".
Builds the decorrelated 10x copy of sf0.1 (the bench heavy-lane generator)
into --dest unless it exists, then times each query there (median of 3
warmed noop-sink runs). Run it once with SPARK_GRAFT_CPUS=8 and once with
32; the ratio answers whether the family parallelizes at scale now.

    SPARK_GRAFT_CPUS=8 python scripts/scaling_r13.py q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_scaled_dir  # noqa: E402
from pyspark_cdc_engine.operators import REGISTRY  # noqa: E402
from pyspark_cdc_engine.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/tmp/r13_scaled_10x")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="scaling_r13")
    print(f"cores={spark.sparkContext.defaultParallelism}", flush=True)
    if not os.path.exists(os.path.join(args.dest, "embeddings.parquet")):
        build_scaled_dir(spark, args.sf_dir, 10, args.dest)
        print("scaled dir built", flush=True)
    spark.sparkContext.setJobDescription("warmup")
    REGISTRY["global_count"].spark(spark, args.dest).write.mode(
        "overwrite"
    ).format("noop").save()
    for name in args.names:
        q = REGISTRY[name]
        samples = []
        for i in range(args.runs + 1):  # run 0 warms
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            q.spark(spark, args.dest).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: med3={statistics.median(samples[1:])} all={samples}",
            flush=True,
        )


if __name__ == "__main__":
    main()
