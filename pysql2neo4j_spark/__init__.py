"""pysql2neo4j_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of ``lycofron/pysql2neo4j``,
generalized from *relational-DB -> Neo4j migration* to *conversation
transcript -> property graph* construction (see SURVEY.md).

The reference's essential semantics — PK -> node identity, FK -> edge,
association table -> edge-with-properties, batched export + periodic
commit == checkpointed partitioned load — are re-expressed Spark-first:

* explicit ``StructType`` schemas (reference: SQLAlchemy reflection),
* partition-parallel Parquet/Iceberg scans (reference: paged SELECT),
* broadcast/sort-merge equi-joins for FK -> edge (reference: indexed
  Cypher MATCH), with salting for hot-key skew,
* per-task atomic file commits + a partition manifest for resume
  (reference: ``USING PERIODIC COMMIT``),
* iterative hash-min connected components for canonical entity ids
  (reference: PK uniqueness constraints).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the public behavior of ``lycofron/pysql2neo4j``.
"""

__version__ = "0.1.0"
