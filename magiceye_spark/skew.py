"""Skew mitigation for joins whose key distribution is hot.

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions, but it only applies to sort-merge joins and
only after a shuffle materializes the skew. :func:`salted_join` is the
explicit, planner-level alternative for the pathological case AQE can't fix
— e.g. a row-level diff keyed on a column where one value holds 30% of a
100 TB table:

- the LEFT (large, skewed) side gets a deterministic salt in [0, n_salt)
  hashed from its entire row (xxhash64, JVM-side) — same data, same salt,
  any cluster;
- the RIGHT side is replicated n_salt× with ``explode`` (so keep it the
  smaller side — cost is n_salt · |right|);
- the join key becomes (keys…, salt): each hot key now spreads over n_salt
  shuffle partitions.

Result equality with the plain join is pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with an added salt dimension to spread hot keys.

    Supports inner and left joins (the directional shapes the diff engine
    uses). Right-side duplicates are preserved exactly as in a plain join —
    each left row still matches every right row with its key, because every
    right row exists under every salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn(SALT, salt.cast("int"))
    r = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [*keys, SALT], how).drop(SALT)


def key_skew_stats(
    df: DataFrame, keys: list[str], top_n: int = 10
) -> DataFrame:
    """Shuffle-key skew diagnostics: the ``top_n`` heaviest key values with
    their row count and share of the table — the first thing to look at
    when a join/groupBy stage straggles. (keys…, n_rows, share, rank).

    One aggregation on the key (map-side combined) plus a scalar total;
    the top-n rank runs two-phase over the aggregated key set
    (:func:`magiceye_spark.io.two_phase_window` — even a key-grain rollup
    can be billions of rows at 100 TB, so no unpartitioned window). At
    100 TB: if rank-1 share is tens of percent, AQE skew-split or
    :func:`salted_join` is warranted on that key.
    """
    from magiceye_spark.io import two_phase_window

    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    ranked = two_phase_window(
        counts, [F.desc("n_rows"), *[F.asc(k) for k in keys]], rank_col="rank"
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.col("rank").cast("int").alias("rank"),
        )
        .where(F.col("rank") <= top_n)
        .orderBy("rank")
    )
