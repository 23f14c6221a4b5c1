#!/usr/bin/env python
"""Round-7 auxiliary benchmark (NOT the driver contract — bench.py is
frozen for measurement; this file exists so the optimization evidence
in OPTIMIZATION_r07.md is reproducible).

Runs each headline query in isolation through the noop sink
(guide §1.4) with ``repeats`` interleaved passes and reports the
MINIMUM per key — the host this round shows multi-second noise bursts
(BENCH_r06.json spreads up to 4.5x between back-to-back samples), and
the minimum estimates the compute floor the optimizations actually
move. Same session config, warmup, and query registry as bench.py.

Usage: python bench_extra.py [repeats]   (default 3; prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if repeats < 1:
        raise SystemExit("repeats must be >= 1 (0 passes would print Infinity, not JSON)")

    from pysql2neo4j_spark.entry_queries import QUERIES
    from pysql2neo4j_spark.session import get_spark, warm_python_workers
    from pysql2neo4j_spark.sources.star import load_table

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    for tbl in ("lineitem", "orders", "customer", "part", "embeddings", "documents",
                "events", "supplier", "nation", "region"):
        load_table(spark, sf_dir, tbl).write.format("noop").mode("overwrite").save()

    keys = [
        "agg_hash", "join_broadcast", "join_smj", "join_theta_range", "window_rank",
        "window_analytic", "agg_rollup", "kg_edges_assoc_lineitem", "kg_multihop_chain",
        "udtf_explode_tokens", "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_spans",
        "ann_topk_pandas", "ann_ivf", "ann_ivf_join", "text_quality", "stream_tumbling",
        "stream_stream_join",
    ]
    best: dict[str, float] = {k: float("inf") for k in keys}
    for _ in range(repeats):  # interleaved: noise bursts hit one pass, not one key
        for name in keys:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[name] = min(best[name], round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "metric": "headline_isolated_min",
        "repeats": repeats,
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "sf": sf_dir,
        "cores": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
