"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query on sf0.001; ``queries()``
/ ``oracle_sql()`` expose the operator registry implemented in
``pysql2neo4j_spark.entry_queries`` (SURVEY.md §2.C) for the driver's
DuckDB comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The KG flagship (SURVEY.md §7.2): build the customer/order/part
    graph the pysql2neo4j way (PK->node, FK->edge) and return the
    top-10 'entities' (customers) by distinct connected orders with
    edge counts — scan, broadcast join, agg, window, top-k in one plan.
    """
    from pysql2neo4j_spark.entry_queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pysql2neo4j_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pysql2neo4j_spark.entry_queries import resolve_oracles

    return resolve_oracles()
