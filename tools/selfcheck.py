"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + schema + order-insensitive value hash.

Usage: python tools/selfcheck.py [key ...]   (default: all keys)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all cols.

    DRIVER-FAITHFUL (VERDICT r4 #2): the driver's canonicalizer sorts
    rows in pandas and dies on array/map-typed columns (unhashable
    list).  The r2-r4 leniency here (list -> tuple before sorting) let
    dedup_cluster_keep pass locally while failing at the driver, so it
    is gone: an array-typed result column now raises the same
    TypeError the driver hits, and run_registry records it as FAIL.
    Registry results must stringify collections (concat_ws /
    array_to_string — the dedup_exact pattern)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, np.ndarray, dict))).any()
            if bad:
                raise TypeError(
                    f"column {c!r} is array/map-typed — the driver's "
                    "canonicalizer cannot sort it; stringify the column "
                    "(concat_ws on Spark, array_to_string in the oracle)"
                )
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    s = df.to_csv(index=False, float_format="%.9g")
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    try:
        a, b = canon(spark_pdf), canon(duck_pdf)
    except TypeError as exc:  # array/map-typed column — driver-fatal
        problems.append(f"canonicalize: {exc}")
        return problems
    # dtype normalization for comparison
    for c in a.columns:
        if pd.api.types.is_datetime64_any_dtype(a[c]) or pd.api.types.is_datetime64_any_dtype(b[c]):
            a[c] = pd.to_datetime(a[c]).astype("datetime64[us]")
            b[c] = pd.to_datetime(b[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(a[c]) and pd.api.types.is_integer_dtype(b[c]):
            a[c] = a[c].astype("int64")
            b[c] = b[c].astype("int64")
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] spark={a[c].dtype} duck={b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                if not np.allclose(
                    a[c].fillna(-9e99), b[c].astype("float64").fillna(-9e99),
                    rtol=0, atol=1e-9,
                ):
                    problems.append(f"values[{c}] differ (float)")
            else:
                neq = (a[c].astype(str) != b[c].astype(str)).sum()
                if neq:
                    problems.append(f"values[{c}] differ in {neq} rows")
    hs, hd = value_hash(a), value_hash(b)
    if hs != hd:
        problems.append(f"hash {hs} != {hd}")
    return problems


def duckdb_con(sf_dir: str):
    """A DuckDB connection with every star table registered as a view
    over the same parquet the Spark side reads."""
    from pysql2neo4j_spark.schemas import STAR_TABLES

    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_registry(spark, sf_dir: str, only=None, log=print) -> list[tuple[str, str]]:
    """Run every registered query on Spark and its oracle on DuckDB;
    return [(key, problem)] — empty means the full registry is green.
    This is the SAME gate `python tools/selfcheck.py` runs and the gate
    tests/test_selfcheck.py runs in pytest."""
    import __spark_entry__ as entry

    con = duckdb_con(sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures: list[tuple[str, str]] = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            log(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            log(f"OK?  {name}: rows-only check, rows={len(spark_pdf)} "
                f"cols={sorted(spark_pdf.columns)}")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            log(f"FAIL {name}: duckdb error: {exc}")
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, "; ".join(problems)))
            log(f"FAIL {name}: " + "; ".join(problems))
        else:
            log(f"PASS {name}: rows={len(spark_pdf)}")
    return failures


def main() -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from pysql2neo4j_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    only = set(sys.argv[1:])

    spark = get_spark(app_name="selfcheck", master="local[16]")
    failures = run_registry(spark, sf_dir, only=only or None)
    spark.stop()
    n_checked = len(only) if only else len(entry.queries())
    print(f"\n{len(failures)} failures / {n_checked} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
