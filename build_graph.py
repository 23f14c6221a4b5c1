#!/usr/bin/env python
"""EP1 — batch KG build, the spark-submit deployment shape
[BASELINE.json:6,14]:

    spark-submit --master local[32] --py-files kgpipe.zip \
        build_graph.py --input /data/transcripts --out /data/graph

On a real cluster, --master becomes yarn/k8s and the same script runs
over N or 4N executors; the sandbox proxy for the two-cluster-size
criterion runs it at local[8] vs local[32] (BENCH/run_scaling.py).

With --gen N the deterministic synthetic corpus (N conversations) is
generated and cached as parquet first, so the timed section always
starts from a table scan — matching the input_hint (transcripts arrive
as an Iceberg/parquet table, not as driver memory).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (or iceberg:<table>)")
    ap.add_argument("--gen", type=int, default=0, help="generate N-conversation corpus first")
    ap.add_argument("--corpus-cache", default="/tmp/kg_bench_corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--buckets", type=int, default=None, help="conv-hash partitions")
    ap.add_argument(
        "--dry-run", action="store_true",
        help="print the physical plan of every stage, run nothing, write nothing "
             "(A16 offline-mode analogue)",
    )
    args = ap.parse_args()

    from pysql2neo4j_spark.corpus import generate_corpus
    from pysql2neo4j_spark.plans.pipeline import PipelineConfig, build_graph
    from pysql2neo4j_spark.schemas import TRANSCRIPT_SCHEMA
    from pysql2neo4j_spark.session import get_spark
    from pysql2neo4j_spark.sources.transcripts import read_transcripts

    spark = get_spark(app_name="kg_build", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    input_path = args.input
    if args.gen:
        input_path = os.path.join(args.corpus_cache, f"n{args.gen}_s{args.seed}")
        if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
            pdf, _ = generate_corpus(n_convs=args.gen, seed=args.seed)
            df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
            df.repartition(max(cores, 8)).write.mode("overwrite").parquet(input_path)
    if not input_path:
        ap.error("--input or --gen required")

    transcripts = read_transcripts(spark, input_path)

    if args.dry_run:
        from pysql2neo4j_spark.plans.dryrun import explain_pipeline

        cfg = PipelineConfig(n_buckets=args.buckets or max(cores, 8))
        for stage, plan in explain_pipeline(spark, transcripts, cfg).items():
            print(f"\n{'=' * 72}\n== DRY RUN plan: {stage}\n{'=' * 72}\n{plan}")
        print(json.dumps({"dry_run": True, "out": args.out, "files_written": 0}))
        spark.stop()
        return 0

    n_turns = transcripts.count()

    from pysql2neo4j_spark.session import warm_python_workers

    warm_python_workers(spark)

    cfg = PipelineConfig(n_buckets=args.buckets or max(cores, 8))
    t0 = time.time()
    res = build_graph(spark, transcripts, args.out, cfg, resume=not args.no_resume)
    t1 = time.time()
    n_nodes = res["nodes"].count()
    n_edges = res["edges"].count()
    dt = time.time() - t0
    res["timings"]["count_readback"] = round(time.time() - t1, 3)

    print(
        json.dumps(
            {
                "turns": n_turns,
                "nodes": n_nodes,
                "edges": n_edges,
                "seconds": round(dt, 2),
                "turns_per_sec": round(n_turns / dt, 1),
                "master": spark.sparkContext.master,
                "cores": cores,
                "stage_seconds": res.get("timings", {}),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
