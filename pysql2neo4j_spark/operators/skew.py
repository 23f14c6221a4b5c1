"""B11 — salted broadcast-hash join (hot-key skew defense).

Reference analogue: pysql2neo4j's FK->relationship MATCH is an indexed
lookup into the parent table [recon: graphproc.py createRelations]; at
Spark scale the equivalent broadcast-hash join collapses when one key
(the hot entity, ~30% of mentions) lands every probe row in one task's
build bucket — worse, in a *shuffle* join the hot key's rows all land in
one reducer. Salting splits the hot key across S buckets:

  fact side:  salt = pmod(xxhash64(<deterministic row col>), S)
  dim side:   explode(sequence(0, S-1)) -> one copy per salt
  join on (key, salt), dim side broadcast.

AQE skew-join only rescues *shuffle* joins after a stage materializes;
explicit salting keeps the plan a single broadcast stage regardless of
key distribution [BASELINE.json:6].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with small ``dim`` on ``key``, salted.

    ``salt_on`` must be a deterministic fact column (NOT rand() — the
    per-turn invariant requires identical results across retries and
    partitionings). Result is identical to the unsalted join (asserted
    in tests/test_skew.py).
    """
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int"))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = f.join(F.broadcast(d), on=[key, "__salt"], how=how)
    return out.drop("__salt")
