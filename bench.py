#!/usr/bin/env python
"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec}, "sf"}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Set BENCH_RUNS>1 for median-of-N timing.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark_cdc_engine.operators import REGISTRY  # noqa: E402
from pyspark_cdc_engine.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "1"))
    only = os.environ.get("BENCH_ONLY")  # comma-separated subset
    names = sorted(REGISTRY) if not only else [n for n in only.split(",") if n in REGISTRY]

    spark = get_spark(app_name="bench")
    # Warm the JVM + parquet footers once with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
