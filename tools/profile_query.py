"""Per-query job/stage profiler (guide §1: measure first, label jobs).

Runs one registry query (or a named pipeline stage chain) with the Spark UI
REST API enabled, times the action, then decomposes it into per-job
[submission..completion] spans, the GAPS between jobs (driver-side time:
planning, broadcast builds, py4j), and per-stage executorRunTime /
shuffle read+write bytes.

Usage:
    python tools/profile_query.py <query_name> [sf_dir] [repeat]
    python tools/profile_query.py pipeline [sf_dir] [repeat]   # staged chain
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}") as r:
        return json.loads(r.read())


def profile_action(label: str, fn):
    app = rest("/applications")[0]["id"]
    jobs_before = {j["jobId"] for j in rest(f"/applications/{app}/jobs")}
    s = time.time()
    out = fn()
    wall = time.time() - s
    jobs = [j for j in rest(f"/applications/{app}/jobs")
            if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])

    def ts(x):
        from datetime import datetime
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = []
    prev_end = None
    total_gap = total_span = 0.0
    for j in jobs:
        t0, t1 = ts(j["submissionTime"]), ts(j["completionTime"])
        gap = (t0 - prev_end) if prev_end is not None else 0.0
        total_gap += max(gap, 0)
        total_span += t1 - t0
        stage_rows = []
        for sid in j["stageIds"]:
            try:
                st = rest(f"/applications/{app}/stages/{sid}")[0]
            except Exception:
                continue
            stage_rows.append({
                "stage": sid,
                "name": st["name"].split("\n")[0][:60],
                "tasks": st["numCompleteTasks"],
                "run_s": round(st["executorRunTime"] / 1000, 2),
                "sh_r_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                "in_mb": round(st.get("inputBytes", 0) / 1e6, 1),
                "out_rows": st.get("outputRecords", 0),
            })
        spans.append({
            "job": j["jobId"], "desc": (j.get("description") or j["name"])[:70],
            "span_s": round(t1 - t0, 3), "gap_before_s": round(gap, 3),
            "stages": stage_rows,
        })
        prev_end = t1
    print(f"\n=== {label}: wall {wall:.3f}s | {len(jobs)} jobs, "
          f"sum spans {total_span:.3f}s, sum gaps {total_gap:.3f}s ===")
    for sp in spans:
        print(f"  job {sp['job']:<4} span {sp['span_s']:<7} gap {sp['gap_before_s']:<7} {sp['desc']}")
        for st in sp["stages"]:
            print(f"      s{st['stage']:<4} tasks {st['tasks']:<4} run {st['run_s']:<7}"
                  f" shR {st['sh_r_mb']:<8} shW {st['sh_w_mb']:<8} in {st['in_mb']:<8} {st['name']}")
    return wall, out


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else bench.SF_DIR
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    from pprl_scaling_framework_spark.sources.session import build_session
    from pprl_scaling_framework_spark.ops.bucket_join import release_persists

    spark = build_session(
        f"profile-{name}", master=f"local[{bench.CPUS}]",
        shuffle_partitions=max(bench.CPUS * 2, 16), prefer_shuffled_hash=True,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench._ceiling_probe(spark, 300_000_000)  # JIT warm-up
    probe = bench._ceiling_probe(spark, 3_000_000_000)
    print(f"noise probe: {probe:.2f}s")

    if name == "pipeline":
        for i in range(repeat):
            release_persists()
            spark.catalog.clearCache()
            wall, r = profile_action(
                f"pipeline rep{i}",
                lambda: bench.run_pipeline(spark, bench.N_ENTITIES))
            print(json.dumps(r["timings"]))
    else:
        from pprl_scaling_framework_spark.entry_queries import QUERIES
        fn = QUERIES[name]
        for i in range(repeat):
            release_persists()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            profile_action(f"{name} rep{i}",
                           lambda: fn(spark, sf_dir).count())
            spark.sparkContext.setJobDescription(None)
    probe = bench._ceiling_probe(spark, 3_000_000_000)
    print(f"noise probe end: {probe:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
