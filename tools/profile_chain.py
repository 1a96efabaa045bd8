"""Profile the fused scaling chain: where does the parallelism-independent
driver overhead O go?

Runs the same fused collapse+encode+block+candidates+match chain as
bench.run_scaling_probe at one parallelism level, with the Spark UI REST API
enabled and driver GC logging on, then decomposes wall time into:

- per-job [submission..completion] spans and the GAPS between jobs (pure
  driver time: Catalyst planning, broadcast hash builds, py4j round-trips);
- per-stage executorRunTime / jvmGcTime / shuffle read+write (task time that
  parallelizes) and a W/p lower bound;
- driver GC seconds from the JVM unified log.

Usage:
    SPARK_DRIVER_MEMORY=48g python tools/profile_chain.py [cpus] [entities]
(defaults: 8, 1600000; input parquet must exist at
 /dev/shm/pprl-bench-input-<entities> — bench.py's scaling probe creates it)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_AQE", "0")
os.environ.setdefault("BENCH_BROADCAST_THRESHOLD", "8m")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

import bench  # noqa: E402


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}") as r:
        return json.loads(r.read())


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    input_path = f"/dev/shm/pprl-bench-input-{n}"
    assert os.path.exists(os.path.join(input_path, "_SUCCESS")), (
        f"{input_path} missing — run BENCH_SCALING=1 first or generate it")
    gclog = f"/tmp/pprl_gc_{cpus}_{n}.log"
    if os.path.exists(gclog):
        os.remove(gclog)

    import bench as b
    spark = None
    # patch build_spark conf through extra env is awkward; build directly
    from pprl_scaling_framework_spark.sources.session import build_session
    extra = {
        "spark.ui.enabled": "true",
        "spark.driver.extraJavaOptions": f"-Xlog:gc:{gclog}",
        "spark.sql.adaptive.enabled": "false" if os.environ["BENCH_AQE"] == "0" else "true",
        "spark.sql.autoBroadcastJoinThreshold": os.environ["BENCH_BROADCAST_THRESHOLD"],
    }
    spark = build_session(
        f"pprl-profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=int(os.environ.get("SCALING_PARTITIONS", "64")),
        prefer_shuffled_hash=True, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (JIT + arrow), unmeasured
    b.run_pipeline(spark, max(n // 40, 10_000), cluster=False, fused=True)

    app_id = rest("/applications")[0]["id"]
    warm_jobs = {j["jobId"] for j in rest(f"/applications/{app_id}/jobs")}

    t0 = time.time()
    r = b.run_pipeline(spark, n, cluster=False, input_path=input_path, fused=True)
    wall = time.time() - t0

    jobs = [j for j in rest(f"/applications/{app_id}/jobs")
            if j["jobId"] not in warm_jobs]
    jobs.sort(key=lambda j: j["jobId"])

    def ts(s: str) -> float:
        # '2026-08-17T07:00:00.123GMT'
        from datetime import datetime
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = [(j["jobId"], ts(j["submissionTime"]), ts(j["completionTime"]),
              j.get("numTasks", 0)) for j in jobs]
    job_time = sum(e - s for _, s, e, _ in spans)
    gaps = []
    for (id1, _, e1, _), (id2, s2, _, _) in zip(spans, spans[1:]):
        gaps.append((f"{id1}->{id2}", round(s2 - e1, 2)))
    gap_total = sum(g for _, g in gaps)

    stages = rest(f"/applications/{app_id}/stages?status=COMPLETE")
    # keep only stages belonging to the measured jobs (by stageId >= first)
    min_stage = min((s for j in jobs for s in j["stageIds"]), default=0)
    stages = [s for s in stages if s["stageId"] >= min_stage]
    task_sec = sum(s["executorRunTime"] for s in stages) / 1e3
    gc_sec = sum(s["jvmGcTime"] for s in stages) / 1e3
    deser_sec = sum(s["executorDeserializeTime"] for s in stages) / 1e3
    top = sorted(stages, key=lambda s: -s["executorRunTime"])[:8]

    drv_gc = 0.0
    if os.path.exists(gclog):
        with open(gclog) as f:
            for line in f:
                m = re.search(r"Pause.*?([0-9.]+)ms", line)
                if m:
                    drv_gc += float(m.group(1)) / 1e3

    out = {
        "cpus": cpus, "entities": n, "wall_sec": round(wall, 1),
        "sum_job_span_sec": round(job_time, 1),
        "inter_job_gap_sec": round(gap_total, 1),
        "pre_first_job_sec": round(spans[0][1] - t0, 2) if spans else None,
        "post_last_job_sec": round(t0 + wall - spans[-1][2], 2) if spans else None,
        "executor_task_sec_total": round(task_sec, 1),
        "task_sec_over_p": round(task_sec / cpus, 1),
        "executor_gc_sec_in_tasks": round(gc_sec, 1),
        "executor_deserialize_sec": round(deser_sec, 1),
        "jvm_total_gc_pause_sec": round(drv_gc, 1),
        "n_jobs": len(spans), "n_stages": len(stages),
        "gaps_over_1s": [g for g in gaps if g[1] > 1.0],
        "top_stages": [
            {"stage": s["stageId"], "name": s["name"].split("\n")[0][:70],
             "tasks": s["numTasks"],
             "run_sec": round(s["executorRunTime"] / 1e3, 1),
             "gc_sec": round(s["jvmGcTime"] / 1e3, 1),
             "input_gb": round(s.get("inputBytes", 0) / 1e9, 2),
             "shuffle_read_gb": round(s.get("shuffleReadBytes", 0) / 1e9, 2),
             "shuffle_write_gb": round(s.get("shuffleWriteBytes", 0) / 1e9, 2),
             "shuffle_read_rows": s.get("shuffleReadRecords", 0),
             "shuffle_write_rows": s.get("shuffleWriteRecords", 0),
             "wall_sec": round(ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"]), 1)
             if s.get("completionTime") and s.get("firstTaskLaunchedTime") else None}
            for s in top
        ],
        "counts": r["counts"],
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
