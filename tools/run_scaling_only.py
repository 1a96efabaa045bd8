"""Run ONLY bench.run_scaling_probe() in a fresh process and append the
result to BENCH_EVIDENCE.json under the key given by $SCALING_EVIDENCE_KEY.

Usage (env fully exported BEFORE python starts, so the JVM heap is right):

    SPARK_DRIVER_MEMORY=48g SCALING_ENTITIES=1600000 SCALING_PAIRS=2:8 \
    SCALING_EVIDENCE_KEY=scaling_1600k_r5 python tools/run_scaling_only.py

The flagship bench is NOT run (its JVM launch would pin a smaller heap and
its timings would contaminate the probe's windows).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    key = os.environ.get("SCALING_EVIDENCE_KEY")
    scaling = bench.run_scaling_probe()
    print(json.dumps(scaling))
    if key:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_EVIDENCE.json")
        with open(path) as f:
            evidence = json.load(f)
        evidence[key] = scaling
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(evidence, f, indent=1)
        os.replace(tmp, path)
        print(f"recorded as {key}", file=sys.stderr)


if __name__ == "__main__":
    main()
