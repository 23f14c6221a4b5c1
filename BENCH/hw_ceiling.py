#!/usr/bin/env python
"""Same-box scaling-ceiling calibration for BENCH/BASELINE.md.

Runs the EXACT production extraction hot loop (operators/extraction:
``_sentences`` + ``_match_relations`` + ``_match_mention_only`` over
pandas batches) in K independent OS processes pinned to the same core
sets the run_scaling.py proxy uses — no Spark, no shuffle, no shared
state, no driver. This workload is embarrassingly parallel: on K
independent machines (the real N vs 4N executor deployment) its scaling
efficiency is 1.0 by construction. Whatever (thr@4N / thr@N) / 4 this
measures on ONE box is therefore the box's hardware ceiling (shared
DRAM bandwidth + turbo-frequency drop as active cores rise), not a
property of any engine — the denominator for interpreting
run_scaling.py's raw efficiency.

Usage: python BENCH/hw_ceiling.py [--n 4] [--n4 16] [--runs 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BATCH = None  # set in each worker by _init


def _init(core_list: list[int], n_convs: int):
    os.sched_setaffinity(0, set(core_list))
    global _BATCH
    from pysql2neo4j_spark.corpus import generate_corpus

    pdf, _ = generate_corpus(n_convs=n_convs, seed=7)
    _BATCH = pdf[["conv_id", "turn_idx", "role", "tool", "ts", "text"]]


def _work(iters: int) -> int:
    from pysql2neo4j_spark.operators.extraction import (
        _match_mention_only,
        _match_relations,
        _sentences,
    )

    rows = 0
    for _ in range(iters):
        sents = _sentences(_BATCH)
        rel, claimed = _match_relations(sents)
        _match_mention_only(sents, claimed)
        rows += len(_BATCH)
    return rows


def measure(n_procs: int, iters: int, n_convs: int) -> float:
    cores = list(range(n_procs))
    with ProcessPoolExecutor(
        max_workers=n_procs, initargs=(cores, n_convs), initializer=_init
    ) as ex:
        # warm (imports + corpus gen outside the timed section)
        list(ex.map(_work, [1] * n_procs))
        t0 = time.time()
        total = sum(ex.map(_work, [iters] * n_procs))
        dt = time.time() - t0
    return total / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--n4", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--convs", type=int, default=2000, help="rows per kernel batch")
    ap.add_argument("--iters", type=int, default=12, help="kernel passes per task")
    args = ap.parse_args()

    results = {args.n: [], args.n4: []}
    for _ in range(args.runs):
        for n in (args.n, args.n4):
            results[n].append(measure(n, args.iters, args.convs))
            time.sleep(3)
    med = {n: statistics.median(v) for n, v in results.items()}
    eff = (med[args.n4] / med[args.n]) / (args.n4 / args.n)
    print(
        json.dumps(
            {
                "kernel_rows_per_sec_n": round(med[args.n], 1),
                "kernel_rows_per_sec_4n": round(med[args.n4], 1),
                "hw_ceiling_efficiency": round(eff, 3),
                "n": args.n,
                "n4": args.n4,
                "runs": args.runs,
                "raw": {str(n): [round(x, 1) for x in v] for n, v in results.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
