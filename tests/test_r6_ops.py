"""Round-6 pins: the bounded-Levenshtein verifier kernel is pair-for-pair
identical to the unbounded form it replaced (VERDICT r5 task 1)."""

from pyspark.sql import functions as F

from magiceye_spark.llmops.dedup import _edit_distance_sides, edit_distance_near_dups


def test_bounded_levenshtein_matches_unbounded_filter(spark):
    """`levenshtein(a, b, t) != -1` must equal `levenshtein(a, b) <= t`,
    with the SAME distance value emitted inside the bound — the exact
    substitution made at the dedup.py verifier (banded DP, early exit).
    Checked on a corpus with pairs on both sides of the bound, including
    exactly-at-threshold ties."""
    max_dist = 8
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tmpl "),
            # vary a block of length id%17 so distances straddle max_dist=8
            F.substring(F.lit("abcdefghijklmnopq"), 1, (F.col("id") % 17 + 1).cast("int")),
            F.lit("z" * 70),
        ).alias("text"),
    )
    a, b, bkeys = _edit_distance_sides(docs, max_dist, 80, "text", 10**9)
    cands = (
        a.join(b, [*bkeys, "salt"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.abs(F.length("prefix_a") - F.length("prefix_b")) <= max_dist)
    )
    bounded = cands.withColumn(
        "d", F.levenshtein("prefix_a", "prefix_b", max_dist)
    ).where(F.col("d") != -1)
    unbounded = cands.withColumn(
        "d", F.levenshtein("prefix_a", "prefix_b")
    ).where(F.col("d") <= max_dist)
    got = sorted(map(tuple, bounded.select("doc_a", "doc_b", "d").collect()))
    want = sorted(map(tuple, unbounded.select("doc_a", "doc_b", "d").collect()))
    assert got == want and len(got) > 0
    # and some candidate pairs genuinely exceeded the bound (-1 branch hit)
    assert bounded.count() < cands.count()
    # the production operator agrees with its own oracle-shaped reformulation
    prod = sorted(map(tuple, edit_distance_near_dups(docs, max_dist=max_dist).collect()))
    assert prod == want
