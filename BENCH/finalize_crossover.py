"""Full-vs-delta finalize crossover measurement (VERDICT r4 #4).

At the per-round bench scale (20k convs) a delta finalize LOSES to a
full rebuild — publish fixed costs (state IO, bucketed writes,
~15 Spark jobs of per-job overhead) dominate and the avoided IR
re-scan is tiny.  The delta path's value claim is about IR-scan-bound
scale, so this script MEASURES the crossover: for a given corpus it

  1. extracts the full corpus into a fresh out dir (untimed),
  2. times a FULL finalize v0 (creates the state),
  3. appends a ``1/denom`` delta of re-labeled convs (untimed),
  4. times the DELTA finalize v1 over the same committed IR,
  5. deletes state/_meta.json and times a FULL finalize over the
     identical post-delta IR — the honest alternative cost a user
     avoids by running the delta path,

and prints one JSON line per corpus.  Delta wins when
``delta_sec < full_post_sec``; the corpus size where that flips is
the crossover.

Usage:
    python BENCH/finalize_crossover.py [n_convs ...]   # default 20000 100000 800000
Corpora are the cached /tmp/kg_bench_corpus/n<N>_s42 parquet dirs
(generated on demand, deterministic seed 42 — same as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pysql2neo4j_spark.corpus import generate_corpus
from pysql2neo4j_spark.plans.incremental import finalize_graph, _meta_path
from pysql2neo4j_spark.plans.pipeline import PipelineConfig, extract_stage
from pysql2neo4j_spark.schemas import TRANSCRIPT_SCHEMA
from pysql2neo4j_spark.session import get_spark, warm_python_workers
from pysql2neo4j_spark.sources.transcripts import read_transcripts


def corpus_path(spark, n_convs: int, cpus: int) -> str:
    path = f"/tmp/kg_bench_corpus/n{n_convs}_s42"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pdf, _ = generate_corpus(n_convs=n_convs, seed=42)
        spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).repartition(
            max(cpus, 8)
        ).write.mode("overwrite").parquet(path)
    return path


def run_one(spark, n_convs: int, cpus: int, denom: int = 20) -> dict:
    transcripts = read_transcripts(spark, corpus_path(spark, n_convs, cpus))
    n_turns = transcripts.count()
    out = tempfile.mkdtemp(prefix=f"kg_xover_{n_convs}_")
    cfg = PipelineConfig(n_buckets=max(cpus, 8))
    try:
        extract_stage(spark, transcripts, out, cfg, resume=False)

        t0 = time.time()
        finalize_graph(spark, out, cfg, stage="extract")
        full_v0 = round(time.time() - t0, 3)

        delta = transcripts.filter(
            F.pmod(F.xxhash64("conv_id"), F.lit(denom)) == 0
        ).withColumn("conv_id", F.concat(F.lit("d"), F.col("conv_id")))
        extract_stage(spark, delta, out, cfg, resume=False)

        t0 = time.time()
        res_d = finalize_graph(spark, out, cfg, stage="extract")
        delta_sec = round(time.time() - t0, 3)
        assert res_d["metrics"]["mode"] == "incremental"

        # the avoided alternative: a full rebuild over the SAME
        # post-delta IR (drop the state pointer so finalize goes full)
        os.remove(_meta_path(out))
        t0 = time.time()
        res_f = finalize_graph(spark, out, cfg, stage="extract")
        full_post = round(time.time() - t0, 3)
        assert res_f["metrics"]["mode"] == "full"

        return {
            "n_convs": n_convs,
            "n_turns": n_turns,
            "delta_frac": round(1 / denom, 4),
            "full_v0_sec": full_v0,
            "delta_sec": delta_sec,
            "full_post_sec": full_post,
            "delta_wins": delta_sec < full_post,
            "speedup": round(full_post / delta_sec, 3),
            "delta_ir_rows": res_d["metrics"]["ir_mention_rows_read"],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20000, 100000, 800000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="finalize_crossover", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)
    for n in sizes:
        print(json.dumps(run_one(spark, n, cpus)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
