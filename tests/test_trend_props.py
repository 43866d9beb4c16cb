"""Property-based tests for the r6 statistics layer: on random small
integer series the Spark operators must agree with direct pure-Python
references — Mann-Kendall S/var/z + Theil-Sen, two-sample KS, and the
Spearman matrix's average-rank tie handling. Few, small examples: each
runs real Spark jobs."""

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SERIES = st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=10)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _events_from_daily(spark, per_type_daily):
    rows = []
    for typ, vals in per_type_daily.items():
        for day, v in enumerate(vals):
            ts = dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=day)
            rows.append((len(rows), ts, 1, typ, float(v), "{}"))
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _mk_ref(vals):
    from collections import Counter

    n = len(vals)
    s = sum(
        (vals[j] > vals[i]) - (vals[j] < vals[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = sum(c * (c - 1) * (2 * c + 5) for c in Counter(vals).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    z = 0.0
    if var > 0 and s > 0:
        z = (s - 1) / math.sqrt(var)
    elif var > 0 and s < 0:
        z = (s + 1) / math.sqrt(var)
    slopes = sorted(
        (vals[j] - vals[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    sen = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2.0
    return s, var, z, sen


@given(vals=SERIES)
@_settings
def test_mann_kendall_theil_sen_property(spark, vals):
    from magiceye_spark.sketches import daily_trend_robust

    row = daily_trend_robust(_events_from_daily(spark, {"t": vals})).collect()[0]
    s, var, z, sen = _mk_ref(vals)
    assert row.s_stat == s
    assert abs(row.var_s - var) < 1e-9
    assert abs(row.z_mk - z) < 1e-9
    assert abs(row.sen_slope - sen) < 1e-9


@given(
    a=st.lists(st.integers(0, 8), min_size=2, max_size=10),
    b=st.lists(st.integers(0, 8), min_size=2, max_size=10),
)
@_settings
def test_ks_two_sample_property(spark, a, b):
    """D must equal max |ECDF_a − ECDF_b| over the union grid for any
    pair of halves (first half = days 0.., second half = days 15..)."""
    from magiceye_spark.sketches import ks_half_month_drift

    rows, eid = [], 0
    for i, v in enumerate(a):
        rows.append((eid, dt.datetime(2024, 1, 1 + i % 14, 8), 1, "t", float(v), "{}"))
        eid += 1
    for i, v in enumerate(b):
        rows.append((eid, dt.datetime(2024, 1, 16 + i % 14, 8), 1, "t", float(v), "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    row = ks_half_month_drift(ev).collect()[0]
    grid = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        for x in grid
    )
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_d - want) < 1e-12
