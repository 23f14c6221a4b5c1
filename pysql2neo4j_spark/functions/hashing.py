"""MinHash / SimHash / LSH banding — pure Column expressions.

k independent MinHash functions are derived from one 64-bit hash family
(`xxhash64(shingle, seed_i)`) — standard practice; seeds are fixed so
signatures are deterministic across runs and partitionings. Everything
stays JVM-side (higher-order array functions), so signatures for a
100 TB corpus never touch Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MINHASH_K_DEFAULT = 48  # 12 bands x 4 rows


def minhash_signature(shingles: Column, k: int = MINHASH_K_DEFAULT) -> Column:
    """array<bigint> of k minhash values over an array<string> column.

    min over xxhash64(shingle, seed=i) per i in [0, k). Empty shingle
    sets get the hash of the empty string so the signature is total."""
    safe = F.when(F.size(shingles) > 0, shingles).otherwise(F.array(F.lit("")))
    return F.array(
        *[
            F.array_min(F.transform(safe, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(k)
        ]
    )


def band_keys(signature: Column, bands: int, rows: int) -> Column:
    """array<bigint> of LSH band keys: hash of each band's row slice,
    band index mixed in so buckets from different bands never collide."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                F.concat_ws(",", F.transform(F.slice(signature, b * rows + 1, rows), lambda x: x.cast("string"))),
            )
            for b in range(bands)
        ]
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash of an array<string> token column.

    For each bit position j, sum +1/-1 contributions of each token's
    xxhash64 bit j, then take the sign. Pure aggregate expressions via
    higher-order functions (no UDF)."""
    hashed = F.transform(tokens_col, lambda t: F.xxhash64(t))
    bit_cols = []
    for j in range(64):
        # contribution per token: +1 if bit j set else -1
        contrib = F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h, j=j: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        # bit 63 is the sign bit of a signed long: use the negative literal
        bit_val = -(1 << 63) if j == 63 else (1 << j)
        bit_cols.append(
            F.when(contrib > 0, F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
