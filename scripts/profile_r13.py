#!/usr/bin/env python
"""Round-12 optimization profiler: for each named registry query, capture
`.explain("formatted")` into plans/r13/<name>_<tag>.txt and time N warmed
noop-sink runs (guide §1.1/§1.4). Usage:

    python scripts/profile_r13.py [--tag before|after] [--runs 3] name [name...]

Prints one line per query: name, cold, then the warmed samples.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_cdc_engine.operators import REGISTRY  # noqa: E402
from pyspark_cdc_engine.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
PLANS = Path(__file__).resolve().parent.parent / "plans" / "r13"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    PLANS.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="profile_r13")

    # Warm the session on a cheap query so the first profiled query doesn't
    # absorb session/codegen bring-up (verify-skill gotcha).
    spark.sparkContext.setJobDescription("warmup")
    REGISTRY["global_count"].spark(spark, args.sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in args.names:
        q = REGISTRY[name]
        if not args.no_plan:
            df = q.spark(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (PLANS / f"{name}_{args.tag}.txt").write_text(plan)
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            q.spark(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: {samples}", flush=True)


if __name__ == "__main__":
    main()
