"""Autonomous health-gated scaling-measurement campaign (round-6 verdict #1/#2).

Runs the full round-6 measurement suite — 800k 2->8 criterion on current
code, the 1.6M 2->8 confirmation, and the AQE-on 800k companion datum — by
retrying each stage until its pre-flight ceiling gate passes (a degraded-host
attempt costs ~3.5 min; see bench.run_scaling_probe). Every attempt, aborted
or not, is recorded in BENCH_EVIDENCE.json under the stage key with its
abort history, so the evidence log shows every try.

Coordination with an interactive builder session:
- while an attempt is in flight the campaign holds /tmp/pprl_scaling_probe.lock
  (builder: do not run Spark/pytest while the lock exists — it contaminates
  the measured windows);
- if /tmp/pprl_builder_busy exists the campaign waits before starting an
  attempt (builder: touch it around heavy test runs, remove after).

Usage:  nohup python tools/scaling_campaign.py > /tmp/scaling_campaign.log 2>&1 &
Env:    CAMPAIGN_MAX_HOURS (default 5), CAMPAIGN_RETRY_SLEEP_SEC (default 1500),
        CAMPAIGN_STAGES (comma list, default all three).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/pprl_scaling_probe.lock"
BUSY = "/tmp/pprl_builder_busy"
EVIDENCE = os.path.join(REPO, "BENCH_EVIDENCE.json")

STAGES = {
    # criterion datum for the shipped code (round-5 verdict item 1)
    "scaling_800k_r6": {
        "SCALING_ENTITIES": "800000", "SCALING_PAIRS": "2:8",
        "SCALING_REPEAT": "3",
    },
    # 2x-data confirmation (round-4 item 1, still open)
    "scaling_1600k_r6": {
        "SCALING_ENTITIES": "1600000", "SCALING_PAIRS": "2:8",
        "SCALING_REPEAT": "2",
    },
    # AQE-on companion (round-4 item 8): same chain, runtime re-planning ON
    "scaling_800k_r6_aqe_on": {
        "SCALING_ENTITIES": "800000", "SCALING_PAIRS": "2:8",
        "SCALING_REPEAT": "2", "BENCH_AQE": "1",
    },
}


def record(key: str, entry: dict) -> None:
    with open(EVIDENCE) as f:
        evidence = json.load(f)
    evidence[key] = entry
    tmp = EVIDENCE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(evidence, f, indent=1)
    os.replace(tmp, EVIDENCE)


def attempt(env_over: dict) -> dict | None:
    env = dict(os.environ)
    env.update(env_over)
    env["SPARK_DRIVER_MEMORY"] = "48g"
    env.pop("SCALING_EVIDENCE_KEY", None)  # campaign does its own recording
    try:
        open(LOCK, "w").write(str(os.getpid()))
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "run_scaling_only.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=3 * 3600)
    finally:
        try:
            os.remove(LOCK)
        except OSError:
            pass
    for line in reversed(p.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print(f"  no JSON in probe output (rc={p.returncode}); "
          f"stderr tail: {p.stderr[-300:]}", flush=True)
    return None


def main() -> None:
    max_hours = float(os.environ.get("CAMPAIGN_MAX_HOURS", "5"))
    retry_sleep = int(os.environ.get("CAMPAIGN_RETRY_SLEEP_SEC", "1500"))
    stage_names = os.environ.get("CAMPAIGN_STAGES", ",".join(STAGES)).split(",")
    deadline = time.time() + max_hours * 3600

    for key in stage_names:
        over = STAGES[key]
        aborts: list[dict] = []
        while time.time() < deadline:
            while os.path.exists(BUSY):
                print(f"[{key}] builder busy — waiting 120s", flush=True)
                time.sleep(120)
            print(f"[{key}] attempt {len(aborts) + 1}", flush=True)
            result = attempt(over)
            if result is None:
                aborts.append({"error": "no_output"})
                time.sleep(retry_sleep)
                continue
            if "aborted" in result:
                aborts.append({
                    "preflight_ceiling_sec": result.get("preflight_ceiling_sec"),
                    "reason": result["aborted"],
                })
                # keep the abort history visible even before success
                record(key, {**result, "aborted_attempts": aborts[:-1]})
                print(f"[{key}] gate abort "
                      f"({result.get('preflight_ceiling_sec')}s) — sleep "
                      f"{retry_sleep}s", flush=True)
                time.sleep(retry_sleep)
                continue
            result["aborted_attempts"] = aborts
            record(key, result)
            print(f"[{key}] SUCCESS eff={result.get('efficiency_N_to_4N')} "
                  f"after {len(aborts)} aborted attempts", flush=True)
            break
        else:
            print(f"[{key}] deadline reached with no healthy window", flush=True)
            break
    print("campaign done", flush=True)


if __name__ == "__main__":
    main()
