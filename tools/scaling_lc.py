"""Scaling pairs under REAL multi-executor local-cluster (r4 verdict
task #3's second half): the north rule's N -> 4N *executors* shape,
run as spark-submit local-cluster[1,2,M] vs local-cluster[4,2,M] —
1 worker JVM vs 4 worker JVMs, 2 cores each, identical input and task
graph (16 partitions), interleaved back-to-back per pair so both
levels share a host-load window (BENCH/BASELINE.md protocol; pairs
with eff > 1.0 are physically impossible and discarded).

Usage: python tools/scaling_lc.py [rows] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_lc(workers: int, rows: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_MASTER="submit",
        SPARK_GRAFT_CPUS=str(2 * workers),
        BENCH_ROWS=str(rows),
        BENCH_MODE="build_only",
    )
    out = subprocess.run(
        [
            "spark-submit",
            "--master", f"local-cluster[{workers},2,4096]",
            "--driver-memory", "8g",
            "--conf", "spark.executor.memory=3g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", os.path.join(REPO, "dist", "ostrich_spark.zip"),
            os.path.join(REPO, "bench.py"),
        ],
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON (workers={workers}):\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
    )


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pairs = []
    for t in range(trials):
        deadline = time.time() + 240
        while os.getloadavg()[0] > 1.0 and time.time() < deadline:
            time.sleep(10)
        r1 = run_lc(1, rows)
        r4 = run_lc(4, rows)
        eff = r4["files_per_sec"] / (4 * r1["files_per_sec"])
        m1 = r1["queries"].get("build_map_sec", 0.0)
        m4 = r4["queries"].get("build_map_sec", 0.0)
        map_eff = (rows / m4) / (4 * (rows / m1)) if m1 and m4 else 0.0
        print(
            f"pair {t}: 1x2 {r1['files_per_sec']} f/s, 4x2 "
            f"{r4['files_per_sec']} f/s -> eff {eff:.3f} (map {map_eff:.3f})",
            flush=True,
        )
        pairs.append({
            "pair": t, "w1_files_per_sec": r1["files_per_sec"],
            "w4_files_per_sec": r4["files_per_sec"],
            "eff": round(eff, 3), "map_eff": round(map_eff, 3),
        })
    valid = [p for p in pairs if p["eff"] <= 1.0] or pairs
    best = max(valid, key=lambda p: p["eff"])
    print(json.dumps({"rows": rows, "pairs": pairs, "best": best}))


if __name__ == "__main__":
    main()
