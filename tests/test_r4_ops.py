"""Round-4 operator tests: persisted-fingerprint incremental datadiff
(partition pruning at the scan), plus regressions for the advisor findings
it closes (key-swap partitions must not be pruned)."""

import pytest
from pyspark.sql import functions as F

from magiceye_spark import plans
from magiceye_spark.datadiff import (
    diff_data,
    diff_data_incremental,
    read_fingerprints,
    write_fingerprints,
)
from magiceye_spark.io import write_partitioned


def _planted(spark, n=600, months=6):
    """n rows over `months` int partitions; target mutates ONLY month 3."""
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") % months).alias("m"),
        (F.col("id") * 7).alias("v"),
    )
    target = base.withColumn(
        "v", F.when(F.col("m") == 3, F.col("v") + 1).otherwise(F.col("v"))
    )
    return base, target


@pytest.fixture(scope="module")
def pruned_setup(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("incr"))
    base, target = _planted(spark)
    write_partitioned(base, f"{root}/base", ["m"])
    write_fingerprints(base, "m", f"{root}/base_fp", cols=["id", "v"])
    write_partitioned(target, f"{root}/target", ["m"])
    write_fingerprints(target, "m", f"{root}/target_fp", cols=["id", "v"])
    b = spark.read.parquet(f"{root}/base")
    t = spark.read.parquet(f"{root}/target")
    out = diff_data_incremental(
        b, t, ["id"], "m", compare_cols=["v"],
        base_fingerprints=read_fingerprints(spark, f"{root}/base_fp"),
        target_fingerprints=read_fingerprints(spark, f"{root}/target_fp"),
    )
    return b, t, out


def test_incremental_pruned_scan_shows_partition_filters(pruned_setup):
    """The changed-partition set must reach the scan as a PartitionFilter —
    planning-time directory pruning, not read-and-discard."""
    _, _, out = pruned_setup
    pf = [f for f in plans.partition_filters(out) if f.strip()]
    assert len(pf) >= 2, f"expected partition filters on both scans, got {pf}"
    assert all("m#" in f for f in pf), pf


def test_incremental_pruned_matches_full_diff(pruned_setup):
    b, t, out = pruned_setup
    full = diff_data(b, t, ["id"], compare_cols=["v"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))
    # and it actually found the month-3 rows
    assert out.count() == 100


def test_incremental_no_changes_yields_empty(spark, tmp_path):
    base, _ = _planted(spark, n=60)
    p = str(tmp_path)
    write_partitioned(base, f"{p}/b", ["m"])
    write_fingerprints(base, "m", f"{p}/fp", cols=["id", "v"])
    b = spark.read.parquet(f"{p}/b")
    out = diff_data_incremental(
        b, b, ["id"], "m", compare_cols=["v"],
        base_fingerprints=read_fingerprints(spark, f"{p}/fp"),
        target_fingerprints=read_fingerprints(spark, f"{p}/fp"),
    )
    assert out.count() == 0


def test_edit_distance_salted_hot_block_parity(spark):
    """A planted hot block (all docs share first word + token count) must
    produce the IDENTICAL pair set whether or not block salting kicks in —
    salting redistributes the O(b²) work, never the result."""
    from magiceye_spark.llmops.dedup import edit_distance_near_dups

    rows = [
        (i, f"tmpl doc {i:03d} common tail words here", "s") for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    salted = edit_distance_near_dups(docs, max_dist=8, block_cap=10)
    unsalted = edit_distance_near_dups(docs, max_dist=8, block_cap=10**9)
    s_rows = sorted(map(tuple, salted.collect()))
    u_rows = sorted(map(tuple, unsalted.collect()))
    assert s_rows == u_rows
    assert len(s_rows) == 60 * 59 // 2  # every pair within distance 8


def test_edit_distance_length_buckets_lossless(spark):
    """Length-bucket blocking with adjacent probing must be invisible in the
    result: pairs straddling a bucket boundary (length diff ≤ max_dist but
    different buckets) are still found."""
    from magiceye_spark.llmops.dedup import edit_distance_near_dups

    # max_dist=8 → bucket width 9; prefixes of length 8 and 10 land in
    # buckets 0 and 1 — adjacent, still compared
    docs = spark.createDataFrame(
        [
            (1, "alpha bc", "s"),       # 8 chars → bucket 0
            (2, "alpha bcde", "s"),     # 10 chars → bucket 1, dist 2
            (3, "alpha " + "x" * 30, "s"),  # bucket 4: out of reach
        ],
        "doc_id long, text string, source string",
    )
    got = sorted(map(tuple, edit_distance_near_dups(docs, max_dist=8).collect()))
    assert got == [(1, 2, 2)]


def test_referential_audit_single_scan_per_child(spark, sf_dir):
    """A child with k declared FKs must group into ONE plan branch: at most
    one single-row-aggregate exchange per child group (5 groups here), no
    per-relation anti-join shuffles, no Python."""
    from magiceye_spark import plans, registry

    df = registry.queries()["fk_integrity_audit"](spark, sf_dir)
    assert plans.count_shuffles(df) <= 6
    assert plans.python_eval_count(df) == 0


def test_referential_audit_duplicate_parent_keys_safe(spark):
    """Default mode (assume_unique_parents=False) must not inflate child
    rows when the referenced column has duplicates; NULL child keys count
    as orphans (anti-join semantics)."""
    from magiceye_spark.dq import referential_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, parent_id long"
    )
    parent = spark.createDataFrame([(10,), (10,), (20,)], "pid long")
    rows = referential_audit(
        [
            ("child.parent_id->parent", child, "parent_id", parent, "pid"),
            ("child.id->parent", child, "id", parent, "pid"),
        ]
    ).collect()
    got = {r["relation"]: (r["n_child_rows"], r["n_orphans"], r["pass"]) for r in rows}
    assert got["child.parent_id->parent"] == (4, 2, False)  # 99 and NULL
    assert got["child.id->parent"] == (4, 4, False)


def test_stratified_quota_sample_exact_and_stable(spark, sf_dir):
    """Quotas are hit exactly (capped by stratum size), strata without a
    quota are dropped, and the winner set is invariant to repartitioning."""
    from magiceye_spark.llmops.pipeline import stratified_quota_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    quotas = {"src0": 7, "src1": 10**6, "src9_absent": 5}
    out = stratified_quota_sample(docs, quotas)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["src0"] == 7
    assert got["src1"] == sizes["src1"]  # quota above size → whole stratum
    assert set(got) == {"src0", "src1"}
    again = stratified_quota_sample(docs.repartition(13), quotas)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_key_swap_partition_not_pruned(spark):
    """ADVICE regression: two rows swapping KEY values leave the compare-col
    multiset and row count unchanged — the fingerprint must still differ
    (keys are fingerprinted too), so the keyed diff reports the change."""
    base = spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "c")], "id int, m int, v string"
    )
    # rows 1 and 2 swap ids within partition m=0
    target = spark.createDataFrame(
        [(2, 0, "a"), (1, 0, "b"), (3, 1, "c")], "id int, m int, v string"
    )
    out = diff_data_incremental(base, target, ["id"], "m", compare_cols=["v"])
    got = {(r.id, r.diff_status) for r in out.collect()}
    assert got == {(1, "changed"), (2, "changed")}


def test_q12_derived_shipping_no_shuffle_and_consistent(spark, sf_dir):
    """Q12 over derived ship attributes: the derivation itself is map-side
    (zero exchanges over the lineitem scan), mode distribution covers all 7
    modes, and high+low counts equal the filtered join cardinality."""
    from magiceye_spark.analytics import derived_shipping, q12_shipmode_priority
    from magiceye_spark.io import read_table

    l = derived_shipping(read_table(spark, sf_dir, "lineitem"))
    assert plans.count_shuffles(l) == 0
    assert l.select("l_shipmode").distinct().count() == 7
    # receipt strictly after ship by construction (1..28 days)
    bad = l.where(F.col("l_receiptdate") <= F.col("l_shipdate").cast("date")).count()
    assert bad == 0

    out = q12_shipmode_priority(spark, sf_dir).collect()
    assert [r.l_shipmode for r in out] == sorted(r.l_shipmode for r in out)
    assert set(r.l_shipmode for r in out) <= {"MAIL", "SHIP"}
    total = sum(r.high_line_count + r.low_line_count for r in out)
    expected = (
        l.where(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.col("l_shipdate").cast("date") < F.col("l_commitdate"))
            & (F.year("l_receiptdate") == 1996)
        ).count()
    )
    assert total == expected


def test_top_k_two_phase_matches_window_and_has_no_window_op(spark, sf_dir):
    """The salted two-phase grouped top-k returns exactly the window
    variant's rows, and its physical plan contains NO Window operator
    (the single-task per-type sort it exists to eliminate)."""
    from magiceye_spark.events_ops import (
        _events,
        top_users_per_type,
        top_users_per_type_scalable,
    )

    ev = _events(spark, sf_dir)
    want = [tuple(r) for r in top_users_per_type(ev, k=3).collect()]
    for n_salts in (1, 32):
        got_df = top_users_per_type_scalable(ev, k=3, n_salts=n_salts)
        got = [tuple(r) for r in got_df.collect()]
        assert got == want, n_salts
    assert "Window" not in plans.executed_plan(got_df)


def test_diff_triage_escalation_levels(spark, tmp_path):
    """Identical inputs stop at the fingerprint level (no diff built);
    a partitioned change escalates to partition level and the restricted
    diff equals the full diff; no partition_col escalates to row level."""
    from magiceye_spark.datadiff import diff_triage

    base, target = _planted(spark)
    same = diff_triage(base, base, ["id"], partition_col="m", compare_cols=["v"])
    assert same["identical"] and same["level"] == "fingerprint" and same["diff"] is None

    part = diff_triage(base, target, ["id"], partition_col="m", compare_cols=["v"])
    assert not part["identical"] and part["level"] == "partition"
    assert part["changed_partitions"] == [3]
    full = diff_data(base, target, ["id"], compare_cols=["v"])
    assert sorted(map(tuple, part["diff"].collect())) == sorted(
        map(tuple, full.collect())
    )

    row = diff_triage(base, target, ["id"], compare_cols=["v"])
    assert row["level"] == "row"
    assert sorted(map(tuple, row["diff"].collect())) == sorted(
        map(tuple, full.collect())
    )

    # stored-fingerprint mode: no-change short-circuit without scanning
    from magiceye_spark.datadiff import partition_fingerprints

    fp = partition_fingerprints(base, "m", ["id", "v"])
    stored = diff_triage(
        base, base, ["id"], partition_col="m", compare_cols=["v"],
        base_fingerprints=fp, target_fingerprints=fp,
    )
    assert stored["identical"] and stored["changed_partitions"] == []


def test_props_key_stats_planted_multikey(spark):
    """Multi-key / missing-key / nested payloads profile correctly:
    per-key row fraction and distinct-value counts."""
    from magiceye_spark.events_ops import props_key_stats

    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x"}'),
            (2, '{"a": 2}'),
            (3, '{"b": "x", "c": {"d": 5}}'),
            (4, None),
        ],
        "event_id long, props string",
    )
    got = {r["key"]: (r["n_rows"], r["frac_rows"], r["n_distinct"])
           for r in props_key_stats(df).collect()}
    assert got["a"] == (2, 0.5, 2)
    assert got["b"] == (2, 0.5, 1)   # same value both times
    assert got["c"][0] == 1          # nested object counts as one value


def test_diff_data_complex_types_and_map_canon(spark):
    """diff_data handles array/struct/map columns: content-equal maps
    built in different entry orders compare UNCHANGED; real changes in
    any complex column are detected and attributed. Hash mode and
    fingerprints agree."""
    from magiceye_spark.datadiff import diff_data, diff_data_hash, table_fingerprint

    a = spark.createDataFrame(
        [
            (1, [1, 2], (10, "p"), {"x": 1, "y": 2}),
            (2, [3], (20, "q"), {"y": 2}),
        ],
        "id long, arr array<int>, st struct<a:int,b:string>, m map<string,int>",
    )
    # row 1: same map, opposite construction order; row 2: value change
    b = spark.createDataFrame(
        [
            (1, [1, 2], (10, "p"), {"y": 2, "x": 1}),
            (2, [3], (20, "q"), {"y": 3}),
        ],
        "id long, arr array<int>, st struct<a:int,b:string>, m map<string,int>",
    )
    got = {(r["id"], r["diff_status"], r["changed_columns"])
           for r in diff_data(a, b, ["id"]).collect()}
    assert got == {(2, "changed", "m")}
    hgot = {(r["id"], r["diff_status"]) for r in diff_data_hash(a, b, ["id"]).collect()}
    assert hgot == {(2, "changed")}
    # fingerprints of permuted-map tables are equal; changed table differs
    a_perm = spark.createDataFrame(
        [
            (2, [3], (20, "q"), {"y": 2}),
            (1, [1, 2], (10, "p"), {"y": 2, "x": 1}),
        ],
        "id long, arr array<int>, st struct<a:int,b:string>, m map<string,int>",
    )
    fa = table_fingerprint(a).collect()[0]["fingerprint"]
    fp = table_fingerprint(a_perm).collect()[0]["fingerprint"]
    fb = table_fingerprint(b).collect()[0]["fingerprint"]
    assert fa == fp and fa != fb


def test_build_scd2_change_delete_reinsert(spark):
    """SCD2 from 4 snapshot versions: payload change opens a new interval,
    deletion closes at the missing version, re-insert opens fresh, and
    only the newest-version runs are current."""
    from magiceye_spark.datadiff import build_scd2

    def snap(rows):
        return spark.createDataFrame(rows, "id long, v string")

    s1 = snap([(1, "a"), (2, "x"), (3, "m")])
    s2 = snap([(1, "a"), (2, "y"), (3, "m")])          # 2 changes x->y
    s3 = snap([(1, "a"), (2, "y")])                    # 3 deleted
    s4 = snap([(1, "b"), (2, "y"), (3, "m2")])         # 1 changes, 3 re-inserted
    out = build_scd2([(1, s1), (2, s2), (3, s3), (4, s4)], ["id"])
    got = {(r["id"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
           for r in out.collect()}
    assert got == {
        (1, "a", 1, 4, False),
        (1, "b", 4, None, True),
        (2, "x", 1, 2, False),
        (2, "y", 2, None, True),
        (3, "m", 1, 3, False),
        (3, "m2", 4, None, True),
    }


def test_scd2_round_trip_reconstructs_every_version(spark):
    """The SCD2 history is lossless: scd2_snapshot_at(v) equals the
    original snapshot v exactly, for every version including the one
    with deletions."""
    from magiceye_spark.datadiff import build_scd2, scd2_snapshot_at

    def snap(rows):
        return spark.createDataFrame(rows, "id long, v string")

    snaps = [
        (1, snap([(1, "a"), (2, "x"), (3, "m")])),
        (2, snap([(1, "a"), (2, "y"), (3, "m")])),
        (3, snap([(1, "a"), (2, "y")])),
        (4, snap([(1, "b"), (2, "y"), (3, "m2")])),
    ]
    hist = build_scd2(snaps, ["id"])
    for v, original in snaps:
        got = sorted(map(tuple, scd2_snapshot_at(hist, v, ["id"]).collect()))
        want = sorted(map(tuple, original.collect()))
        assert got == want, v


def test_scd2_incremental_equals_rebuild(spark):
    """Applying snapshots one at a time with scd2_apply_snapshot yields
    the SAME history as build_scd2 over the full series — change, delete,
    and re-insert included."""
    from magiceye_spark.datadiff import build_scd2, scd2_apply_snapshot

    def snap(rows):
        return spark.createDataFrame(rows, "id long, v string")

    snaps = [
        (1, snap([(1, "a"), (2, "x"), (3, "m")])),
        (2, snap([(1, "a"), (2, "y"), (3, "m")])),
        (3, snap([(1, "a"), (2, "y")])),
        (4, snap([(1, "b"), (2, "y"), (3, "m2")])),
    ]
    full = build_scd2(snaps, ["id"])
    inc = build_scd2(snaps[:1], ["id"])
    for v, s in snaps[1:]:
        inc = scd2_apply_snapshot(inc, v, s, ["id"])
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_user_value_ewma_matches_pandas(spark):
    """Closed-form EWMA == pandas ewm(adjust=False) on a planted series."""
    import pandas as pd

    from magiceye_spark.events_ops import user_value_ewma

    vals = [10.0, 20.0, 5.0, 40.0, 1.0]
    rows = [
        (i, f"2024-01-01 00:0{i}:00", 7, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = user_value_ewma(df, alpha=0.3).first()
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert got.ewma == pytest.approx(round(want, 4), abs=1e-4)
    assert got.last_value == 1.0 and got.n_events == 5


def test_l_diversity_audit_planted(spark):
    """Planted: one nation with a single segment leaks; one with 3 passes."""
    from magiceye_spark.dq import l_diversity_audit

    rows = [(1, "A")] * 5 + [(2, "A"), (2, "B"), (2, "C")]
    df = spark.createDataFrame(rows, "nation int, seg string")
    out = l_diversity_audit(df, ["nation"], "seg", l=3).first()
    assert out.n_groups == 2
    assert out.n_leaky_groups == 1 and out.n_leaky_rows == 5


def test_transition_matrix_planted(spark):
    """Planted stream click->view->click->purchase: transition counts and
    row-normalized probabilities are exact."""
    from magiceye_spark.events_ops import event_transition_matrix

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "view", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "click", 0.0, "{}"),
        (4, "2024-01-01 00:03:00", 1, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r.prev_type, r.next_type): (r.n, r.p)
           for r in event_transition_matrix(df).collect()}
    assert out == {
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
        ("view", "click"): (1, 1.0),
    }


def test_interarrival_cv_planted(spark):
    """Regular 60s cadence -> std 0, cv 0; users with <3 events drop."""
    from magiceye_spark.events_ops import user_interarrival_stats

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", 0.0, "{}") for i in range(4)
    ] + [(10, "2024-01-01 01:00:00", 2, "click", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.user_id: r for r in user_interarrival_stats(df).collect()}
    assert list(out) == [1]
    assert out[1].mean_gap_s == 60.0 and out[1].std_gap_s == 0.0 and out[1].cv == 0.0


def test_rfm_tiles_deterministic_and_complete(spark, sf_dir):
    """Every customer with orders gets a 3-digit RFM code; quartile sizes
    differ by at most 1 (NTILE contract)."""
    from collections import Counter

    from magiceye_spark import analytics

    rows = analytics.customer_rfm(spark, sf_dir).collect()
    assert all(len(r.rfm) == 3 and r.rfm.isdigit() for r in rows)
    for field in ("r_tile", "f_tile", "m_tile"):
        sizes = Counter(getattr(r, field) for r in rows)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_basket_lift_planted(spark, tmp_path):
    """Two parts always bought together in a 4-order corpus: lift = n/1?
    With 4 orders, pair in 2, each part in 2: lift = 2*4/(2*2) = 2.0."""
    import os

    from magiceye_spark import analytics

    li = [
        (1, 1, 100), (1, 2, 101),
        (2, 1, 100), (2, 2, 101),
        (3, 1, 102), (4, 1, 103),
    ]
    df = spark.createDataFrame(
        [(o, ln, p, 1.0, 100.0, 0.0) for o, ln, p in li],
        "l_orderkey long, l_linenumber long, l_partkey long, l_quantity double, l_extendedprice double, l_discount double",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = analytics.basket_pair_lift(spark, d, min_pair_orders=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.part_a, r.part_b, r.n_both, r.lift) == (100, 101, 2, 2.0)


def test_gini_extremes(spark, tmp_path):
    """Equal spends -> gini ~0; one whale owning ~everything -> gini -> 1."""
    import os

    from magiceye_spark import analytics

    def gini_of(prices):
        rows = [(i, i, p, "1995-01-01") for i, p in enumerate(prices)]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate string"
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        d = str(tmp_path / f"g{len(prices)}_{int(prices[0])}")
        os.makedirs(d, exist_ok=True)
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        return analytics.customer_spend_gini(spark, d).first().gini

    assert gini_of([100.0] * 10) == 0.0
    assert gini_of([0.01] * 9 + [10_000.0]) > 0.85


def test_attribution_weights_sum_to_purchase_value(spark):
    """Planted path click,click,click -> purchase(100): weights
    0.4/0.2/0.4 land on the click days; totals conserve the purchase."""
    from magiceye_spark.events_ops import attributed_daily_revenue

    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-03 10:00:00", 1, "click", 0.0, "{}"),
        (4, "2024-01-04 10:00:00", 1, "purchase", 100.0, "{}"),
        (5, "2024-01-05 10:00:00", 2, "click", 0.0, "{}"),   # no purchase after
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {str(r.click_day): r.attributed_value for r in attributed_daily_revenue(df).collect()}
    assert out == {"2024-01-01": 40.0, "2024-01-02": 20.0, "2024-01-03": 40.0}


def test_activity_streaks_planted(spark):
    """Planted: days 1,2,3, 7,8, 20 -> longest 3, three streaks, 6 days."""
    from magiceye_spark.events_ops import user_activity_streaks

    days = ["01", "02", "03", "07", "08", "20"]
    rows = [
        (i, f"2024-01-{d} 12:00:00", 1, "click", 0.0, "{}")
        for i, d in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    row = user_activity_streaks(df).first()
    assert (row.n_active_days, row.longest_streak, row.n_streaks) == (6, 3, 3)
