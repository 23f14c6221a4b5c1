"""Plan-hygiene audit: .explain("formatted") every registered query and
assert the physical properties the 100 TB design depends on —
predicate pushdown reaching the parquet scan, column-pruned
ReadSchemas, broadcast joins where a dim side exists, whole-stage
codegen coverage, and no row-at-a-time Python anywhere.

Usage: python tools/explain_audit.py [key ...]   (default: audited set)
Writes a summary table to stdout; non-zero exit on any violated
expectation.
"""

from __future__ import annotations

import re
import sys


# key -> properties we insist on in the physical plan
EXPECTATIONS: dict[str, list[str]] = {
    "scan_project": ["PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity", "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"],
    "filter_pred": ["PushedFilters:", "BETWEEN_PROXY"],
    "join_broadcast": ["BroadcastHashJoin", "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size"],
    "join_salted_skew": ["BroadcastHashJoin"],
    "join_semi": ["Semi"],
    "join_anti": ["Anti"],
    "agg_hash": ["HashAggregate", "PushedFilters:"],
    "window_rank": ["Window", "WindowGroupLimit"],  # rank<=3 pushed below the shuffle
    "window_range_frame": ["Window", "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double,o_orderdate"],
    "join_asof": ["Window"],  # union + ordered-window, not a range join
    "join_asof_bucketed": ["Window"],  # (key, ts-bucket) partitioned windows
    "window_ntile_cume_part": ["Window"],  # partitioned distribution window
    "stream_sliding": ["HashAggregate"],  # window expansion + partial agg
    "sort_limit_topk": ["TakeOrderedAndProject"],
    # flagship is the driver entry() query, not a registry key; audit()
    # resolves it specially.  The top-k must be a per-partition partial
    # heap merge, never a single-partition global sort.
    "flagship": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    "kg_edges_assoc_lineitem": ["BroadcastHashJoin"],
    "kg_multihop_chain": ["BroadcastHashJoin"],
    "udf_pandas_scalar": ["ArrowEvalPython"],
    "udaf_grouped_agg": ["ArrowAggregatePython"],
    "ann_topk_exact": ["BroadcastNestedLoopJoin", "SALTED_TOPK_PROXY"],
    "multimodal_features": ["MapInPandas"],
    # corpus-join: the assignment kernel runs inside an eager
    # localCheckpoint (its MapInPandas is behind the ExistingRDD leaf);
    # the visible plan must show the zero-copy Arrow scoring kernel
    # (r7: mapInArrow replaced the ArrowEvalPython pandas_udf cosine)
    # and a REAL cell equi-join — never a crossJoin of the corpus
    # against itself
    "ann_ivf_join": ["MapInArrow", "NOT:CartesianProduct", "NOT:BroadcastNestedLoopJoin"],
    # span dedup: explode + hash agg, no pair join anywhere
    "dedup_spans": ["Generate", "HashAggregate", "NOT:SortMergeJoin", "NOT:BroadcastHashJoin"],
    # decontamination: eval n-gram set broadcasts; training side never shuffles
    "text_decontaminate": ["BroadcastHashJoin", "Generate"],
    "stream_stream_join": ["PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)"],
}

FORBIDDEN_EVERYWHERE = ["BatchEvalPython"]  # row-at-a-time Python UDF


def audit(spark, keys=None, sf_dir: str = "/root/testdata/sf0.001") -> dict[str, list[str]]:
    """Explain every audited query and return {key: [problems]} (empty
    lists mean PASS). Reusable from pytest (tests/test_explain_audit.py)
    so a plan-hygiene regression fails CI, not just this manual tool."""
    from pysql2neo4j_spark.entry_queries import QUERIES, flagship

    # default scope: EVERY registered query (+ the flagship). Keys with
    # an EXPECTATIONS entry get their positive plan assertions; every
    # plan — expectations or not — is scanned for the forbidden
    # patterns (row-at-a-time Python anywhere in the registry is a bug).
    results: dict[str, list[str]] = {}
    for key in sorted(keys or (set(QUERIES) | {"flagship"})):
        fn = flagship if key == "flagship" else QUERIES[key]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        problems = []
        for want in EXPECTATIONS.get(key, []):
            if want == "BETWEEN_PROXY":
                # BETWEEN pushes as >= and <=
                if not re.search(r"GreaterThanOrEqual\(o_totalprice", plan):
                    problems.append("BETWEEN not pushed to scan")
                continue
            if want == "SALTED_TOPK_PROXY":
                # the exact top-k must pre-reduce within (query_id,
                # salt) cells before any per-query window — a lone
                # Window.partitionBy(query_id) over the scored
                # crossJoin is a single-task sort of the whole corpus
                # per query (VERDICT r3 #2)
                if "__salt" not in plan:
                    problems.append(
                        "top-k not salted: full-corpus Exchange into "
                        "per-query partitions")
                continue
            if want.startswith("NOT:"):
                if want[4:] in plan:
                    problems.append(f"forbidden for this key: {want[4:]}")
                continue
            if want not in plan:
                problems.append(f"missing: {want[:60]}")
        for bad in FORBIDDEN_EVERYWHERE:
            if bad in plan:
                problems.append(f"forbidden: {bad}")
        results[key] = problems
    return results


def main() -> int:
    sys.path.insert(0, ".")
    from pysql2neo4j_spark.session import get_spark

    only = set(sys.argv[1:]) or set(EXPECTATIONS)
    spark = get_spark(app_name="explain_audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    results = audit(spark, keys=only)
    n_fail = 0
    for key, problems in results.items():
        if problems:
            n_fail += 1
            print(f"FAIL {key}: " + "; ".join(problems))
        else:
            print(f"PASS {key}")
    spark.stop()
    print(f"\n{n_fail} failures / {len(only)} plans audited")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
