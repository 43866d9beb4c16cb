"""Round-5 mechanism pins: the two-phase window helper, the edit-distance
hot-block salt guard (spread, not just parity), and the streaming quota
batch twin."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magiceye_spark.io import two_phase_window
from magiceye_spark.llmops.dedup import (
    _edit_distance_sides,
    edit_distance_near_dups,
)


def _planted_template_corpus(spark, n_docs=300):
    """One giant (first-word, length-bucket) block: n_docs docs, identical
    80+-char prefix except a fixed-width 3-digit id — every doc shares
    block_word 'tmpl' and the same length bucket."""
    pad = "x" * 90
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("tmpl "), F.lpad(F.col("id").cast("string"), 3, "0"), F.lit(pad)
        ).alias("text"),
    )


def test_edit_distance_salt_spreads_hot_block(spark):
    """The skew guard's MECHANISM (VERDICT r4 task 4): with one planted
    3000-pair hot block and block_cap=50, the left side must split into
    ~n/cap salt groups with no group much above the cap — the per-task
    quadratic work is bounded by cap·block instead of block²."""
    docs = _planted_template_corpus(spark, n_docs=300)
    cap = 50
    a, b, bkeys = _edit_distance_sides(docs, 8, 80, "text", block_cap=cap)
    ga = a.groupBy(*bkeys, "salt").count()
    per_salt = [r["count"] for r in ga.collect()]
    # ceil(300/50) = 6 salts, all present (xxhash64 spread), and no salt
    # group holds more than 2x the cap (hash-uniformity tolerance)
    assert len(per_salt) == 6
    assert max(per_salt) <= 2 * cap
    assert sum(per_salt) == 300
    # the right side replicates the SAME block to every salt: each join
    # task sees (<=2cap a-rows) x (block b-rows) instead of block x block
    gb = b.where(F.col("lb") == a.select("lb").first()["lb"]).groupBy(
        *bkeys, "salt"
    ).count()
    assert all(r["count"] == 300 for r in gb.collect())


def test_edit_distance_salted_equals_unsalted_on_hot_block(spark):
    """Pair parity on the planted hot block: the salted plan (cap=50, 6-way
    spread) yields the identical pair set as the effectively-unsalted plan
    (cap larger than the corpus)."""
    docs = _planted_template_corpus(spark, n_docs=120)
    salted = edit_distance_near_dups(docs, max_dist=8, block_cap=20)
    plain = edit_distance_near_dups(docs, max_dist=8, block_cap=10**9)
    agg = [
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(
                    F.xxhash64(
                        F.col("doc_a").cast("string"),
                        F.col("doc_b").cast("string"),
                        F.col("edit_dist").cast("string"),
                    ),
                    F.lit(1_000_000_007),
                )
            ).alias("sig"),
        ).first()
        for df in (salted, plain)
    ]
    assert agg[0]["n"] == agg[1]["n"] > 0
    assert agg[0]["sig"] == agg[1]["sig"]


def test_two_phase_window_equals_naive_window(spark):
    """two_phase_window == ROW_NUMBER + running SUM over the same total
    order, including mixed asc/desc and decimal running sums."""
    df = spark.range(0, 5007).select(
        (F.col("id") * 2654435761 % 997).alias("k"),
        F.col("id").alias("tie"),
        ((F.col("id") % 13) + F.lit(0.25)).cast("decimal(18,4)").alias("v"),
    )
    order = [F.desc("k"), F.asc("tie")]
    w = Window.orderBy(*order)
    naive = df.select(
        "k",
        "tie",
        F.row_number().over(w).alias("r"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("c"),
    )
    got = two_phase_window(df, order, rank_col="r", cumsum={"c": "v"})
    want = {(x["k"], x["tie"]): (x["r"], str(x["c"])) for x in naive.collect()}
    have = {
        (x["k"], x["tie"]): (x["r"], str(x["c"]))
        for x in got.select("k", "tie", "r", "c").collect()
    }
    assert have == want


def test_two_phase_window_empty_frame(spark):
    df = spark.range(0).select(
        F.col("id").alias("k"), F.lit(1).cast("decimal(18,4)").alias("v")
    )
    out = two_phase_window(df, [F.asc("k")], rank_col="r", cumsum={"c": "v"})
    assert out.count() == 0
    assert set(out.columns) == {"k", "v", "r", "c"}


def test_rfm_ntile_arithmetic_matches_spark_ntile(spark):
    """The closed-form NTILE (from the two-phase global rank) must equal
    Spark's own ntile() for awkward N/n combinations — N not divisible by
    n, N < n, N == n."""
    for n_rows, n_tiles in [(17, 4), (3, 5), (8, 8), (100, 7)]:
        df = spark.range(n_rows).select(F.col("id").alias("k"))
        w = Window.orderBy("k")
        want = [
            (r["k"], r["t"])
            for r in df.select("k", F.ntile(n_tiles).over(w).alias("t")).collect()
        ]
        ranked = two_phase_window(df, [F.asc("k")], rank_col="r")
        q, rem = divmod(n_rows, n_tiles)
        thr = rem * (q + 1)
        if q == 0:
            tile = F.expr(f"(r + {q}) div {q + 1}")
        else:
            tile = F.when(
                F.col("r") <= thr, F.expr(f"(r + {q}) div {q + 1}")
            ).otherwise(rem + F.expr(f"(r - {thr} + {q - 1}) div {q}"))
        got = [
            (r["k"], r["t"])
            for r in ranked.select("k", tile.cast("int").alias("t")).collect()
        ]
        assert sorted(got) == sorted(want), (n_rows, n_tiles)
