"""Skew-mitigation helpers.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense and needs no code. This module covers the case AQE can't fix:
a shuffle join where ONE key holds a grossly disproportionate share of
the big side AND the matching small-side rows are few enough to
replicate — the classic salted join.

Mechanics: the big side gets a deterministic salt in [0, salt_buckets)
derived by hashing the full row (stable under retries, no RNG state);
the small side is exploded ``salt_buckets`` times so every
(key, salt) bucket finds its match. The join keys become
(keys…, _salt), splitting each hot key's rows across ``salt_buckets``
reducers. Costs small-side replication ×salt_buckets — use for
dimension-sized right sides only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with the big side salted into
    ``salt_buckets`` sub-partitions per key. Result is identical to the
    unsalted join (verified by tests); only the shuffle layout changes.
    """
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column name {_SALT} is reserved by salted_join")
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    replicated_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>"))
    )
    return salted_big.join(replicated_small, [*keys, _SALT], how).drop(_SALT)
