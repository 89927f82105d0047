#!/usr/bin/env python
"""Round-13 job-structure profiler (guide §1.1/§1.5): for each named registry
query, run it once through the noop sink under a dedicated job group, then
pull the Spark UI REST API for that group's jobs — count, per-job wall, and
job names — so serial-latency-bound chains (the r12 verdict's #1 finding:
the trained/incremental family runs long chains of small jobs whose wall is
driver round-trip latency, not compute) can be measured rather than guessed.

Usage: python scripts/jobprof_r13.py [--runs 1] name [name...]
Prints per query: total wall, n_jobs, sum of job durations, and the job list.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark_cdc_engine.operators import REGISTRY  # noqa: E402
from pyspark_cdc_engine.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="jobprof_r13")
    sc = spark.sparkContext
    sc.setJobDescription("warmup")
    REGISTRY["global_count"].spark(spark, args.sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    for name in args.names:
        q = REGISTRY[name]
        for i in range(args.runs):
            group = f"{name}#{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            q.spark(spark, args.sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jobs = [
                j
                for j in rest(spark, "jobs?status=succeeded")
                if j.get("jobGroup") == group
            ]
            jobs.sort(key=lambda j: j["jobId"])
            durs = []
            for j in jobs:
                # submissionTime/completionTime are ISO strings 'GMT'
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                st = datetime.strptime(j["submissionTime"], fmt)
                ct = datetime.strptime(j["completionTime"], fmt)
                durs.append((ct - st).total_seconds())
            gaps = round(wall - sum(durs), 3)
            print(
                f"{name} run{i}: wall={wall:.3f}s n_jobs={len(jobs)} "
                f"sum_job={sum(durs):.3f}s driver_gap={gaps}s",
                flush=True,
            )
            for j, d in zip(jobs, durs):
                stages = len(j.get("stageIds", []))
                print(
                    f"    job {j['jobId']:>4} {d:6.3f}s stages={stages} "
                    f"tasks={j.get('numTasks')} {j.get('name', '')[:90]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
