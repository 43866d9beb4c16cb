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


def bloom_prefilter_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Semi-join with an explicit broadcast Bloom-filter prefilter — the
    runtime-filter pattern (Spark's own runtime bloom filters, DPP) made
    inspectable and deterministic.

    Build: each dim key sets ``k`` bit positions derived from
    ``md5(j ':' key)``; positions fold into a SPARSE map of 64-bit words
    (``word -> bit_or(masks)``) that aggregates to ONE row and broadcasts
    via the scalar-agg crossJoin pattern. Probe: a fact row survives only
    if ALL k bits are set — evaluated map-side in the scan stage, before
    any shuffle. Because Bloom filters have false positives but never
    false negatives, an exact semi-join over the SURVIVORS reproduces the
    plain semi-join bit-for-bit while shuffling only the pre-filtered
    fraction.

    At 100 TB this is the difference between shuffling the whole fact
    table into the join and shuffling ~selectivity of it: the filter is
    m_bits/8 bytes regardless of fact size (8 KB at the default), merges
    map-side, and — unlike a broadcast hash set — its size is chosen, not
    data-dependent. With k=5 and m growing with |dim|, the false-positive
    rate is (1-e^(-k·n/m))^k; leftover FPs cost only wasted probe rows,
    never correctness.
    """
    survivors = bloom_probe(fact, dim_keys, fact_key, dim_key, m_bits, k)
    # exact verify over the survivors only — no broadcast hint: AQE picks
    # broadcast when the dim fits; at scale this is a shuffle of the
    # pre-filtered fraction, which is the point
    return survivors.join(
        dim_keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "left_semi",
    )


def bloom_probe(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """The prefilter stage alone: fact rows whose key passes the Bloom bit
    test (superset of the true matches — false positives allowed, false
    negatives impossible). Exposed so tests and probes can measure the
    pruning fraction without the verify join."""
    key = F.col(dim_key).cast("string")

    def positions(key_col):
        return [
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), key_col)), 1, 12), 16, 10
            ).cast("long")
            % m_bits
            for j in range(k)
        ]

    masks = dim_keys.select(
        F.explode(F.array(*positions(key))).alias("_pos")
    ).select(
        (F.col("_pos") / 64).cast("long").alias("_word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")
        ).alias("_mask"),
    )
    words = (
        masks.groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("_word", "_bits")))
            ).alias("_bloom")
        )
    )
    probe = fact.crossJoin(F.broadcast(words))
    fkey = F.col(fact_key).cast("string")
    hit = None
    for pos in positions(fkey):
        word_val = F.coalesce(
            F.element_at(F.col("_bloom"), (pos / 64).cast("long")), F.lit(0).cast("long")
        )
        bit = F.call_function(
            "shiftright", word_val, (pos % 64).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = bit == 1
        hit = cond if hit is None else (hit & cond)
    return probe.where(hit).drop("_bloom")
