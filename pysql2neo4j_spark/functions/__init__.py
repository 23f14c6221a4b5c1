"""Column-level building blocks. Everything here composes pure
``pyspark.sql.functions`` expressions (JVM-side, whole-stage-codegen
friendly) — no Python UDFs. The UDF boundary lives only in
``operators/`` where batch semantics genuinely require it.
"""
