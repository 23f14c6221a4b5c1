"""Driver-contract query registry (SURVEY.md §2.C).

Every entry pairs a Spark DataFrame implementation with an ANSI-SQL
oracle that DuckDB runs over the same parquet fixtures; the driver
compares row count + schema + order-insensitive value hash at sf0.01.

Conventions that keep the value-hash stable across engines:
  * every computed column is aliased identically on both sides;
  * double aggregates are round()ed (engine-order float summation
    differs in the last ulp);
  * integer aggregates are cast to BIGINT on both sides (DuckDB SUMs
    integers into HUGEINT, Spark into LONG);
  * deterministic total orderings before any LIMIT.

Each docstring names the operator category and, where applicable, the
pysql2neo4j semantics it re-expresses ([recon: module] — see SURVEY.md
§0 for the provenance protocol; /root/reference was empty at survey
time, so citations are module-level reconstructions).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.star import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship smoke query (driver ``entry``): materialize the
    orders->customer FK edges pysql2neo4j-style, then rank node
    'entities' by connectivity — scan, broadcast join, aggregate,
    window, top-k in one Catalyst plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    edges = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    per_cust = edges.groupBy("c_custkey", "c_name", "n_name").agg(
        F.countDistinct("o_orderkey").alias("n_edges"),
        F.round(F.sum("o_totalprice"), 2).alias("total_value"),
    )
    w = Window.orderBy(F.desc("n_edges"), "c_custkey")
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("rnk", "c_custkey", "c_name", "n_name", "n_edges", "total_value")
    )


# =====================================================================
# Scan / filter / project
# =====================================================================

@register(
    "scan_project",
    """SELECT l_orderkey, l_partkey, l_quantity
       FROM lineitem WHERE l_quantity > 45""",
)
def scan_project(spark, sf_dir):
    """Projection + pushed-down predicate (A2/A3: the reference's paged
    SELECT * becomes a partition-parallel columnar scan; .explain shows
    PushedFilters + a 3-column ReadSchema)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "filter_pred",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
       FROM orders
       WHERE (o_orderstatus = 'F' OR o_orderpriority LIKE '1%')
         AND o_totalprice BETWEEN 1000 AND 90000
         AND o_custkey IS NOT NULL
         AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')""",
)
def filter_pred(spark, sf_dir):
    """Conjunctive/disjunctive predicates, LIKE, BETWEEN, IN, null-safety."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | F.col("o_orderpriority").like("1%"))
        & F.col("o_totalprice").between(1000, 90000)
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


# =====================================================================
# Joins
# =====================================================================

@register(
    "join_broadcast",
    """SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_size > 40""",
)
def join_broadcast(spark, sf_dir):
    """Fact x dim broadcast-hash join (A10: FK -> relationship; the
    dim-side index lookup of Neo4j becomes an explicit broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


@register(
    "join_smj",
    """SELECT o.o_orderstatus,
              CAST(count(*) AS BIGINT) AS n_lines,
              round(sum(l.l_extendedprice), 2) AS revenue
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderstatus""",
)
def join_smj(spark, sf_dir):
    """Fact x fact shuffle join (sort-merge at scale) + aggregate."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)""",
)
def join_semi(spark, sf_dir):
    """Left-semi join == EXISTS."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    """SELECT c_custkey, c_mktsegment FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_anti(spark, sf_dir):
    """Left-anti join == NOT EXISTS (A11: the dangling-FK audit)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "join_outer",
    """SELECT c.c_custkey,
              CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
              round(coalesce(sum(o.o_totalprice), 0.0), 2) AS total_spent
       FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       GROUP BY c.c_custkey""",
)
def join_outer(spark, sf_dir):
    """Left-outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_theta_range",
    """SELECT a.o_custkey,
              CAST(count(*) AS BIGINT) AS n_followups
       FROM orders a JOIN orders b
         ON a.o_custkey = b.o_custkey
        AND b.o_orderdate > a.o_orderdate
        AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
       GROUP BY a.o_custkey""",
)
def join_theta_range(spark, sf_dir):
    """Equi + range (theta) join: follow-up orders by the same customer
    within 30 days. The equi key keeps it a hash join with a range
    residual — the scale-safe shape for range joins (a pure range theta
    join would be a BNLJ; always anchor on an equi key at scale)."""
    o = _t(spark, sf_dir, "orders")
    a = o.alias("a")
    b = o.alias("b")
    cond = (
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.o_orderdate") > F.col("a.o_orderdate"))
        & (F.col("b.o_orderdate") <= F.col("a.o_orderdate") + F.expr("INTERVAL 30 DAY"))
    )
    return a.join(b, cond).groupBy(F.col("a.o_custkey").alias("o_custkey")).agg(
        F.count("*").alias("n_followups")
    )


@register(
    "join_salted_skew",
    """SELECT n.n_name,
              CAST(count(*) AS BIGINT) AS n_customers,
              round(sum(c.c_acctbal), 2) AS total_bal
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
)
def join_salted_skew(spark, sf_dir):
    """Salted broadcast join (B11) — must be result-identical to the
    plain join the oracle runs; the salt only reshapes the physical
    distribution."""
    from .operators.skew import salted_broadcast_join

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    joined = salted_broadcast_join(c, n, key="c_nationkey", salt_on="c_custkey", n_salts=8)
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


# =====================================================================
# Aggregation
# =====================================================================

@register(
    "agg_hash",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_discount), 4) AS avg_disc,
              CAST(count(*) AS BIGINT) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_hash(spark, sf_dir):
    """TPC-H Q1-shaped hash aggregate (multiple partial-aggregatable
    functions; map-side combine makes this shuffle-light)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    """SELECT o_orderpriority,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
              CAST(count(*) AS BIGINT) AS n_orders
       FROM orders GROUP BY o_orderpriority""",
)
def agg_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx")  # no oracle: approximate result -> rows-only check
def agg_approx(spark, sf_dir):
    """approx_count_distinct (HLL++) — sketch-based, so no exact oracle;
    the driver records a rows-only check."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count("*").alias("n"),
    )


@register(
    "agg_rollup",
    """SELECT o_orderstatus, o_orderpriority,
              CAST(count(*) AS BIGINT) AS n,
              CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def agg_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    )


@register(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().cast("long").alias("gid"),
    )


# =====================================================================
# Window functions
# =====================================================================

@register(
    "window_rank",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(rank() OVER w AS BIGINT) AS rnk,
                CAST(row_number() OVER w AS BIGINT) AS rn
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
       ) WHERE rn <= 3""",
)
def window_rank(spark, sf_dir):
    """Top-3 orders per customer via ranking window (deterministic
    tiebreak on o_orderkey)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_analytic",
    """SELECT event_id, user_id,
              round(value - lag(value, 1, 0.0) OVER w, 2) AS delta_prev,
              round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_total
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def window_analytic(spark, sf_dir):
    """lag + running frame aggregate (analytic windows)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value", 1, 0.0).over(w), 2).alias("delta_prev"),
        F.round(F.sum("value").over(wr), 2).alias("running_total"),
    )


@register(
    "sort_limit_topk",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def sort_limit_topk(spark, sf_dir):
    """Global top-k: TakeOrderedAndProject, not a full sort."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), "o_orderkey").limit(10).select(
        "o_orderkey", "o_totalprice"
    )


# =====================================================================
# Set operations
# =====================================================================

@register(
    "set_union",
    """SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
       UNION
       SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier""",
)
def set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s).distinct()


@register(
    "set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier""",
)
def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    """SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000""",
)
def set_except(spark, sf_dir):
    """EXCEPT (set semantics): customers with no six-figure order."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@register(
    "set_except_all",
    """SELECT l_orderkey AS okey FROM lineitem
       EXCEPT ALL
       SELECT o_orderkey AS okey FROM orders""",
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics): one surviving row per lineitem beyond
    the first per order — exercises multiset difference."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("okey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("okey"))
    return li.exceptAll(o)


# =====================================================================
# Scalar function battery
# =====================================================================

@register(
    "scalar_string_date_math",
    """SELECT o_orderkey,
              substring(o_orderpriority, 1, 1) AS prio_code,
              concat_ws('#', o_orderstatus, o_orderpriority) AS status_tag,
              CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
              CAST(datediff('day', TIMESTAMP '2024-01-01', o_orderdate) AS BIGINT) AS days_since,
              round(abs(o_totalprice - 50000.0), 2) AS dist_from_50k,
              round(pow(o_totalprice / 100000.0, 2), 6) AS price_sq
       FROM orders WHERE o_orderkey % 7 = 0""",
)
def scalar_string_date_math(spark, sf_dir):
    """String / date / math scalar battery (A4: the reference's
    per-value datatype transforms, as vectorized builtins)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("status_tag"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("timestamp_ntz"))
        .cast("long")
        .alias("days_since"),
        F.round(F.abs(F.col("o_totalprice") - 50000.0), 2).alias("dist_from_50k"),
        F.round(F.pow(F.col("o_totalprice") / 100000.0, 2), 6).alias("price_sq"),
    )


@register(
    "scalar_array_map_json",
    """SELECT event_id,
              CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
              CAST(len(string_split(event_type, 'i')) AS BIGINT) AS n_splits,
              upper(event_type) AS type_uc
       FROM events""",
)
def scalar_array_map_json(spark, sf_dir):
    """JSON extraction + array function surface over events.props."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.size(F.split("event_type", "i", -1)).cast("long").alias("n_splits"),
        F.upper("event_type").alias("type_uc"),
    )
