#!/usr/bin/env python
"""EP1 — batch KG build, the spark-submit deployment shape
[BASELINE.json:6,14]:

    spark-submit --master local[32] --py-files kgpipe.zip \
        build_graph.py --input /data/transcripts --out /data/graph

On a real cluster, --master becomes yarn/k8s and the same script runs
over N or 4N executors; the sandbox proxy for the two-cluster-size
criterion runs it at local[4] vs local[16] (BENCH/run_scaling.py).

With --gen N the deterministic synthetic corpus (N conversations) is
generated and cached as parquet first, so the timed section always
starts from a table scan — matching the input_hint (transcripts arrive
as an Iceberg/parquet table, not as driver memory).

Entry points (the reconstruction's migrate.py EP1/EP2/EP3 split
[recon: pysql2neo4j/configman.py + migrate.py]):
  --stage all          full build (EP1)
  --stage extract      export-only: staged IR + manifest, stop (EP2)
  --stage materialize  import-only: graph from a committed stage store,
                       no transcript input needed (EP3)
  --stage append       ingest-append: extract ONLY the given input as a
                       new committed batch, then DELTA-finalize the
                       graph (plans/incremental.py) — the batch-side
                       twin of the streaming bridge
  --dry-run            offline mode: print every stage's physical plan,
                       run nothing, write nothing (A16)
  --config settings.ini  configman analogue; CLI flags override it
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="settings.ini (configman analogue; CLI overrides)")
    ap.add_argument("--input", help="transcripts parquet path (or iceberg:<table>)")
    ap.add_argument("--gen", type=int, default=0, help="generate N-conversation corpus first")
    ap.add_argument("--corpus-cache", default="/tmp/kg_bench_corpus")
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--buckets", type=int, default=None, help="conv-hash partitions")
    ap.add_argument(
        "--stage", choices=["all", "extract", "materialize", "append"], default=None
    )
    ap.add_argument(
        "--verify-resume", action="store_true",
        help="before resuming, recompute committed partitions' input "
             "fingerprints and refuse on mismatch (one column-pruned pass "
             "over committed input — audit tool, not a per-run default)",
    )
    ap.add_argument(
        "--dry-run", action="store_true",
        help="print the physical plan of every stage, run nothing, write nothing "
             "(A16 offline-mode analogue)",
    )
    args = ap.parse_args()

    from pysql2neo4j_spark.config import RunConfig, load_config
    from pysql2neo4j_spark.corpus import generate_corpus
    from pysql2neo4j_spark.plans.pipeline import (
        build_graph,
        extract_stage,
        materialize_graph,
        read_committed_ir,
    )
    from pysql2neo4j_spark.schemas import TRANSCRIPT_SCHEMA
    from pysql2neo4j_spark.session import get_spark
    from pysql2neo4j_spark.sources.transcripts import read_transcripts

    run = load_config(args.config) if args.config else RunConfig()
    out_dir = args.out or run.output_path
    stage = args.stage or run.stage
    resume = run.resume and not args.no_resume
    dry_run = args.dry_run or run.dry_run
    if not out_dir:
        ap.error("--out (or [output] path in --config) required")

    spark = get_spark(app_name="kg_build", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    cfg = run.pipeline
    if args.buckets:
        cfg.n_buckets = args.buckets
    elif "n_buckets" not in run.pipeline_explicit:
        cfg.n_buckets = max(cores, 8)

    input_path = args.input or run.input_path
    if args.gen:
        input_path = os.path.join(args.corpus_cache, f"n{args.gen}_s{args.seed}")
        if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
            pdf, _ = generate_corpus(n_convs=args.gen, seed=args.seed)
            df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
            df.repartition(max(cores, 8)).write.mode("overwrite").parquet(input_path)
    if not input_path and stage != "materialize":
        ap.error("--input or --gen (or [input] path in --config) required")

    if dry_run:
        from pysql2neo4j_spark.plans.dryrun import explain_pipeline

        transcripts = read_transcripts(spark, input_path)
        for st, plan in explain_pipeline(spark, transcripts, cfg).items():
            print(f"\n{'=' * 72}\n== DRY RUN plan: {st}\n{'=' * 72}\n{plan}")
        print(json.dumps({"dry_run": True, "out": out_dir, "files_written": 0}))
        spark.stop()
        return 0

    from pysql2neo4j_spark.session import warm_python_workers

    if stage == "materialize":
        # EP3: import-only — no transcript scan, no Python workers needed
        # beyond the warmup-free JVM path (linking/CC/materialize).
        t0 = time.time()
        mentions, triples = read_committed_ir(spark, out_dir, cfg)
        res = materialize_graph(spark, mentions, triples, out_dir, cfg)
        out = {
            "stage": "materialize",
            "nodes": res["nodes"].count(),
            "edges": res["edges"].count(),
            "seconds": round(time.time() - t0, 2),
            "stage_seconds": res.get("timings", {}),
        }
        print(json.dumps(out))
        spark.stop()
        return 0

    transcripts = read_transcripts(spark, input_path)
    n_turns = transcripts.count()
    warm_python_workers(spark)

    if args.verify_resume and resume:
        from pysql2neo4j_spark.plans.checkpoint import verify_resume_integrity
        from pysql2neo4j_spark.plans.pipeline import STAGE_EXTRACT

        n_ok = verify_resume_integrity(
            spark, transcripts, out_dir, STAGE_EXTRACT, n_buckets=cfg.n_buckets
        )
        print(json.dumps({"verify_resume": "ok", "partitions_checked": n_ok}))

    if stage == "append":
        # ingest-append: commit this input as a new batch (no partition
        # resume filter — append semantics), then finalize incrementally:
        # full on first call, delta afterwards.
        from pysql2neo4j_spark.plans.incremental import finalize_graph

        t0 = time.time()
        extract_stage(spark, transcripts, out_dir, cfg, resume=False)
        res = finalize_graph(spark, out_dir, cfg, stage="extract")
        out = {
            "stage": "append",
            "turns": n_turns,
            "mode": res["metrics"]["mode"],
            "delta_ir_rows": res["metrics"]["ir_mention_rows_read"],
            "nodes": res["nodes"].count(),
            "edges": res["edges"].count(),
            "seconds": round(time.time() - t0, 2),
        }
        print(json.dumps(out))
        spark.stop()
        return 0

    if stage == "extract":
        # EP2: export-only — staged IR + manifest commit, then stop.
        from pyspark.sql import functions as F

        from pysql2neo4j_spark.plans.checkpoint import CheckpointManager

        t0 = time.time()
        extract_stage(spark, transcripts, out_dir, cfg, resume=resume)
        m = (
            CheckpointManager(out_dir)
            .manifest(spark)
            .agg(F.sum("n_rows").alias("r"), F.sum("n_triples").alias("t"))
            .collect()[0]
        )
        print(
            json.dumps(
                {
                    "stage": "extract",
                    "turns": n_turns,
                    "committed_rows": m.r,
                    "committed_triples": m.t,
                    "seconds": round(time.time() - t0, 2),
                }
            )
        )
        spark.stop()
        return 0

    t0 = time.time()
    res = build_graph(spark, transcripts, out_dir, cfg, resume=resume)
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
