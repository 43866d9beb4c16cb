"""Property-based tests (hypothesis) for the row-level diff family: for
random small tables the DataFrame operators must agree with a direct
Python-dict reference implementation, and the three modes must agree with
each other on statuses.

Kept to few, small examples — each example runs real Spark jobs.
"""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from magiceye_spark.datadiff import diff_data, diff_data_hash, diff_rows_set

ROW = st.tuples(
    st.integers(min_value=0, max_value=7),           # key
    st.one_of(st.none(), st.integers(0, 3)),         # v1 (nullable)
    st.sampled_from(["a", "b", "c"]),                # v2
)
TABLE = st.lists(ROW, min_size=0, max_size=12)
SCHEMA = "k int, v1 int, v2 string"


def _dedup_by_key(rows):
    seen = {}
    for r in rows:
        seen.setdefault(r[0], r)  # first row wins per key
    return list(seen.values())


def _expected(base, target):
    b = {r[0]: r for r in base}
    t = {r[0]: r for r in target}
    out = {}
    for k in b:
        if k not in t:
            out[k] = "removed"
        elif b[k] != t[k]:
            out[k] = "changed"
    for k in t:
        if k not in b:
            out[k] = "added"
    return out


_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(base=TABLE, target=TABLE)
@_settings
def test_diff_data_matches_reference(spark, base, target):
    base, target = _dedup_by_key(base), _dedup_by_key(target)
    bdf = spark.createDataFrame(base, SCHEMA) if base else spark.createDataFrame([], SCHEMA)
    tdf = spark.createDataFrame(target, SCHEMA) if target else spark.createDataFrame([], SCHEMA)
    got = {r["k"]: r["diff_status"] for r in diff_data(bdf, tdf, keys=["k"]).collect()}
    assert got == _expected(base, target)
    # hash mode agrees on statuses
    got_hash = {
        r["k"]: r["diff_status"] for r in diff_data_hash(bdf, tdf, keys=["k"]).collect()
    }
    assert got_hash == got


@given(base=TABLE, target=TABLE)
@_settings
def test_rowset_diff_matches_multiset_reference(spark, base, target):
    bdf = spark.createDataFrame(base, SCHEMA) if base else spark.createDataFrame([], SCHEMA)
    tdf = spark.createDataFrame(target, SCHEMA) if target else spark.createDataFrame([], SCHEMA)
    got = Counter(
        (tuple(r)[:-1], r["diff_status"])
        for r in diff_rows_set(bdf, tdf).collect()
    )
    cb, ct = Counter(base), Counter(target)
    want = Counter()
    for row, n in (cb - ct).items():
        want[(row, "removed")] = n
    for row, n in (ct - cb).items():
        want[(row, "added")] = n
    assert got == want


LEFT_ROW = st.tuples(
    st.integers(0, 3),                    # key
    st.integers(0, 50),                   # ts
    st.integers(100, 104),                # left payload (unique-ish id)
)
RIGHT_ROW = st.tuples(
    st.integers(0, 3),
    st.integers(0, 50),
    st.integers(0, 9),                    # right payload
)


@given(
    left=st.lists(LEFT_ROW, min_size=1, max_size=10),
    right=st.lists(RIGHT_ROW, min_size=0, max_size=10),
)
@_settings
def test_asof_join_matches_reference(spark, left, right):
    """asof_join must attach, per left row, the right row with the greatest
    ts <= left.ts for the same key (NULL when none)."""
    from magiceye_spark.events_ops import asof_join

    # uniquify right per (key, ts): keep max payload — mirrors the
    # pre-dedup the events showcase does
    rdict = {}
    for k, ts, v in right:
        rdict[(k, ts)] = max(v, rdict.get((k, ts), -1))
    right_rows = [(k, float(ts), v) for (k, ts), v in rdict.items()]

    ldf = spark.createDataFrame(
        [(k, float(ts), lid) for k, ts, lid in left], "k int, ts double, lid int"
    )
    rdf = spark.createDataFrame(
        right_rows or [], "k int, ts double, rv int"
    ) if right_rows else spark.createDataFrame([], "k int, ts double, rv int")

    got = {
        (r["k"], r["ts"], r["lid"]): r["asof_rv"]
        for r in asof_join(ldf, rdf, keys=["k"], right_carry=["rv"]).collect()
    }
    want = {}
    for k, ts, lid in left:
        cands = [(rts, v) for (rk, rts), v in rdict.items() if rk == k and rts <= ts]
        want[(k, float(ts), lid)] = max(cands)[1] if cands else None
    assert got == want


@given(rows=TABLE)
@_settings
def test_self_diff_is_empty(spark, rows):
    rows = _dedup_by_key(rows)
    df = spark.createDataFrame(rows, SCHEMA) if rows else spark.createDataFrame([], SCHEMA)
    assert diff_data(df, df, keys=["k"]).count() == 0
    assert diff_rows_set(df, df).count() == 0


@given(base=TABLE, target=TABLE)
@_settings
def test_incremental_equals_full_on_random_tables(spark, base, target):
    """Partition pruning (lazy AND stored-fingerprint mode) must be
    invisible: diff_data_incremental == diff_data on random tables with a
    key-derived partition column — including the key-swap shapes the r4
    advisor fix covers (fingerprints include keys)."""
    from pyspark.sql import functions as F

    from magiceye_spark.datadiff import (
        diff_data_incremental,
        partition_fingerprints,
    )

    base, target = _dedup_by_key(base), _dedup_by_key(target)
    bdf = spark.createDataFrame(base, SCHEMA) if base else spark.createDataFrame([], SCHEMA)
    tdf = spark.createDataFrame(target, SCHEMA) if target else spark.createDataFrame([], SCHEMA)
    bdf = bdf.withColumn("p", F.col("k") % 3)
    tdf = tdf.withColumn("p", F.col("k") % 3)
    expected = _expected(base, target)
    lazy = {
        r["k"]: r["diff_status"]
        for r in diff_data_incremental(
            bdf, tdf, ["k"], "p", compare_cols=["v1", "v2"]
        ).collect()
    }
    assert lazy == expected
    fp_cols = ["k", "v1", "v2"]
    stored = {
        r["k"]: r["diff_status"]
        for r in diff_data_incremental(
            bdf, tdf, ["k"], "p", compare_cols=["v1", "v2"],
            base_fingerprints=partition_fingerprints(bdf, "p", fp_cols),
            target_fingerprints=partition_fingerprints(tdf, "p", fp_cols),
        ).collect()
    }
    assert stored == expected


def test_compare_cols_subset_limits_attribution(spark):
    """Restricting compare_cols must ignore differences outside the subset."""
    base = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], SCHEMA)
    target = spark.createDataFrame([(1, 99, "a"), (2, 20, "z")], SCHEMA)
    # only compare v2: the v1 change on key 1 is invisible
    got = {r["k"]: (r["diff_status"], r["changed_columns"])
           for r in diff_data(base, target, keys=["k"], compare_cols=["v2"]).collect()}
    assert got == {2: ("changed", "v2")}


def test_profile_table_and_drift(spark):
    """Profile stats on a planted table; drift flags exactly the moved
    columns; approx mode agrees on everything but n_distinct tolerance."""
    from magiceye_spark.profile import profile_drift, profile_table

    rows = [(1, 10.0, "a"), (2, 20.0, "a"), (3, None, "b"), (4, 40.0, None)]
    d = spark.createDataFrame(rows, "id long, v double, s string")
    p = {r["column"]: r for r in profile_table(d).collect()}
    assert p["v"]["n_nulls"] == 1 and p["v"]["null_rate"] == 0.25
    assert p["v"]["n_distinct"] == 3 and p["v"]["avg"] == round(70 / 3, 4)
    assert p["s"]["avg"] is None and p["s"]["min"] == "a" and p["s"]["max"] == "b"
    assert p["id"]["min"] == "1" and p["id"]["max"] == "4"

    # drift: bump v on one row, leave id/s untouched
    rows2 = [(1, 10.0, "a"), (2, 99.0, "a"), (3, None, "b"), (4, 40.0, None)]
    d2 = spark.createDataFrame(rows2, "id long, v double, s string")
    moved = {
        r["column"] for r in profile_drift(profile_table(d), profile_table(d2)).collect()
    }
    assert moved == {"v"}

    # approx mode: same shape, n_distinct within HLL tolerance
    pa = {r["column"]: r for r in profile_table(d, approx=True).collect()}
    assert pa["v"]["n_nulls"] == 1
    assert abs(pa["v"]["n_distinct"] - 3) <= 1


@given(
    left=st.lists(LEFT_ROW, min_size=1, max_size=10),
    right=st.lists(RIGHT_ROW, min_size=0, max_size=10),
    tol=st.one_of(st.none(), st.integers(0, 20)),
)
@_settings
def test_asof_join_forward_tolerance_matches_reference(spark, left, right, tol):
    """direction='forward' must attach the right row with the SMALLEST
    ts >= left.ts per key; tolerance_seconds nulls matches farther than
    tol (in the ts column's own units for non-timestamp columns)."""
    from magiceye_spark.events_ops import asof_join

    rdict = {}
    for k, ts, v in right:
        rdict[(k, ts)] = max(v, rdict.get((k, ts), -1))
    right_rows = [(k, float(ts), v) for (k, ts), v in rdict.items()]

    ldf = spark.createDataFrame(
        [(k, float(ts), lid) for k, ts, lid in left], "k int, ts double, lid int"
    )
    rdf = (
        spark.createDataFrame(right_rows, "k int, ts double, rv int")
        if right_rows
        else spark.createDataFrame([], "k int, ts double, rv int")
    )
    got = {
        (r["k"], r["ts"], r["lid"]): r["asof_rv"]
        for r in asof_join(
            ldf, rdf, keys=["k"], right_carry=["rv"],
            direction="forward", tolerance_seconds=tol,
        ).collect()
    }
    want = {}
    for k, ts, lid in left:
        cands = [
            (rts, v)
            for (rk, rts), v in rdict.items()
            if rk == k and rts >= ts and (tol is None or rts - ts <= tol)
        ]
        want[(k, float(ts), lid)] = min(cands)[1] if cands else None
    assert got == want


def test_psi_histogram_drift_planted(spark):
    """PSI ≈ 0 when both sides draw the same distribution; a planted
    location shift pushes total PSI past the conventional 0.2 alert."""
    from pyspark.sql import functions as F

    from magiceye_spark.profile import psi_histogram_drift

    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("value"))
    same = psi_histogram_drift(base, base, "value")
    rows = same.collect()
    assert [r["bin"] for r in rows] == list(range(10))
    assert abs(sum(r["psi_term"] for r in rows)) < 1e-9
    # shift: second half of the domain only
    shifted = spark.range(2000).select(
        (50 + F.col("id") % 50).cast("double").alias("value")
    )
    drift = psi_histogram_drift(base, shifted, "value").collect()
    assert sum(r["psi_term"] for r in drift) > 0.2
    # empty target bins still appear (Laplace-smoothed, no log(0))
    assert all(r["psi_term"] is not None for r in drift)
