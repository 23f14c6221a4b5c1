"""Star-schema fixture loaders (TESTDATA.md). Reference analogue:
SQLAlchemy reflection of the source database [recon: rdbmsproc.py] —
here the "reflected" catalog is the fixed table list + parquet footers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import STAR_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in STAR_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
