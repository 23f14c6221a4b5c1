#!/usr/bin/env python
"""B21 — the two-cluster-size scaling criterion, sandbox form.

The north rule requires the job launched via ``spark-submit --py-files``
on clusters of N and 4N executors with throughput scaling efficiency
>= 0.8 [BASELINE.json:2,14]. This sandbox has one machine, so (per the
driver instruction) the same job runs at two parallelism levels —
``local[8]`` and ``local[32]`` — on identical input; efficiency =
(throughput@32 / throughput@8) / 4. Results -> BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [--convs 60000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip() -> str:
    """Package the engine for --py-files, as the mandate deploys it."""
    zpath = os.path.join(tempfile.gettempdir(), "kgpipe.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "pysql2neo4j_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def spark_submit(cores: int, convs: int, zpath: str, out: str) -> dict:
    spark_submit_bin = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    cmd = [
        # Pin the CPU set: local[N] on a 32-core box otherwise lets the
        # JVM's Arrow/GC/shuffle threads and the Python workers spill
        # onto the remaining cores, overstating the small-"cluster"
        # throughput. A real N-executor cluster has N cores TOTAL — the
        # honest proxy gives the whole process tree exactly N.
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit_bin,
        "--master", f"local[{cores}]",
        "--py-files", zpath,
        # NOT bigger: a 48g heap measured 2.2x slower end-to-end at
        # local[32] (huge-heap GC / first-touch page-fault pathology)
        "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=" + str(max(cores, 8)),
        os.path.join(REPO, "build_graph.py"),
        "--gen", str(convs),
        "--out", out,
        "--master", f"local[{cores}]",
        "--buckets", str(max(cores, 8)),
    ]
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from spark-submit (rc={proc.returncode}):\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    args = ap.parse_args()

    import time

    zpath = make_pyfiles_zip()
    results: dict[int, list[dict]] = {args.n: [], args.n4: []}
    for cores in (args.n, args.n4):
        for run in range(args.runs):
            time.sleep(5)  # cool-down: let the previous JVM's threads drain
            out = tempfile.mkdtemp(prefix=f"kg_scale_{cores}_")
            try:
                r = spark_submit(cores, args.convs, zpath, out)
            finally:
                shutil.rmtree(out, ignore_errors=True)
            print(f"local[{cores}] run {run + 1}/{args.runs}: "
                  f"{r['seconds']}s {r['turns_per_sec']} turns/s", flush=True)
            results[cores].append(r)

    med = {
        c: statistics.median(r["turns_per_sec"] for r in rs) for c, rs in results.items()
    }
    eff = (med[args.n4] / med[args.n]) / (args.n4 / args.n)
    turns = results[args.n][0]["turns"]

    summary = {
        "turns": turns,
        "n_cores": args.n,
        "n4_cores": args.n4,
        "throughput_n": med[args.n],
        "throughput_4n": med[args.n4],
        "scaling_efficiency": round(eff, 3),
        "runs_per_level": args.runs,
        "raw": {str(c): rs for c, rs in results.items()},
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — measured scaling (sandbox proxy for N -> 4N executors)

Protocol (BASELINE.md): same `spark-submit --py-files kgpipe.zip
build_graph.py` job, same input ({turns:,} turns, deterministic
synthetic corpus, seed 42), run at `local[{args.n}]` and
`local[{args.n4}]`; medians of {args.runs} runs.

| config | median throughput (turns/sec) | median wall (sec) |
|---|---|---|
| local[{args.n}] (N) | {med[args.n]:,.0f} | {statistics.median(r['seconds'] for r in results[args.n]):.1f} |
| local[{args.n4}] (4N) | {med[args.n4]:,.0f} | {statistics.median(r['seconds'] for r in results[args.n4]):.1f} |

**Scaling efficiency (throughput@4N / throughput@N) / 4 =
{eff:.3f}** (target >= 0.8 [BASELINE.json:2,14]).

Raw runs:

```json
{json.dumps(summary, indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
