"""Interleaved A/B of ``salted_sides(materialize_hot=...)`` on the full
fused chain — the host-drift-cancelling protocol used for the round-5
evidence in BENCH_EVIDENCE.json (key ``materialize_hot_ab_800k_local8_r5``).

Each rep runs the identical chain once per mode back-to-back, bracketed by
a pure-codegen ceiling probe, so slow host drift hits both modes equally;
read the per-rep CONTRAST plus best-of-reps, never a single wall.

Run (fresh process; heap pins at first JVM launch):

    SPARK_DRIVER_MEMORY=48g python tools/ab_materialize_hot.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BENCH_AQE", "0")
os.environ.setdefault("BENCH_BROADCAST_THRESHOLD", "8m")

import bench  # noqa: E402

N = int(os.environ.get("AB_ENTITIES", "800000"))
INPUT = f"/dev/shm/pprl-bench-input-{N}"
REPS = int(os.environ.get("AB_REPEAT", "3"))

sp = bench.build_spark(8, shuffle_partitions=64)
if not os.path.exists(os.path.join(INPUT, "_SUCCESS")):
    from pprl_scaling_framework_spark.sources import repos as repos_src
    repos_src.with_uid_and_sha(
        repos_src.synth_repos(sp, n_entities=N, seed=42, skew_every=50)
    ).write.mode("overwrite").parquet(INPUT)
# warm-up (JIT/arrow), unmeasured
bench.run_pipeline(sp, max(N // 40, 10_000), cluster=False, fused=True)

walls = {"on": [], "off": []}
probes = {"on": [], "off": []}
for rep in range(REPS):
    for mode in ("on", "off"):
        os.environ["PPRL_MATERIALIZE_HOT"] = "1" if mode == "on" else "0"
        sp.catalog.clearCache()
        r = bench.run_pipeline(sp, N, cluster=False, input_path=INPUT, fused=True)
        p = bench._ceiling_probe(sp, 15_000_000_000)
        walls[mode].append(round(r["timings"]["total_ex_generate"], 2))
        probes[mode].append(round(p, 2))
        print(json.dumps({"rep": rep, "mode": mode,
                          "wall": walls[mode][-1], "probe": probes[mode][-1]}),
              flush=True)
sp.stop()
print(json.dumps({"walls": walls, "probes": probes,
                  "best_on": min(walls["on"]), "best_off": min(walls["off"])}))
