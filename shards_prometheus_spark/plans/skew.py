"""Skew-salted join — the hot-key scale pattern, as a utility.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits *partitions*, not single pathological keys
on the build side of a shuffled join. Salting is the explicit fix: the
big side's rows get a deterministic salt in [0, n), the small side is
replicated once per salt value, and the join key becomes (key, salt) —
one hot key's rows spread across n tasks instead of one.

Use when: both sides too large to broadcast AND a key's frequency is
orders above the median (the LSH band buckets and label_user series of
this engine are the natural candidates at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, salted n_salt ways.

    The salt is a deterministic hash of the big side's full row, so the
    spread is uniform and repeatable; the small side is exploded ×n_salt
    (only viable when `small` is small — which is the regime where the
    skewed key's fan-out, not the replication, is the bottleneck).
    Result equals the plain join, column-for-column.
    """
    if n_salt < 2:
        return big.join(small, on, how)
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), n_salt
    ).alias("_salt")
    big_s = big.select("*", salt)
    small_s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salt)])),
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")
