"""Round-6 second wave: robust trend (Mann-Kendall + Theil-Sen), CUSUM
changepoint, cross-type daily correlation, and the t-closeness privacy
audit — each pinned against an independent pure-Python reference."""

import datetime as dt
import math

from pyspark.sql import functions as F

from magiceye_spark import dq
from magiceye_spark.sketches import (
    daily_cusum_changepoint,
    daily_trend_robust,
    daily_type_correlation,
)


def _events_from_daily(spark, per_type_daily):
    """Build an events frame whose daily rollup is exactly per_type_daily:
    {type: [v0, v1, ...]} — one event at noon of each day."""
    rows = []
    for typ, vals in per_type_daily.items():
        for day, v in enumerate(vals):
            ts = dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(days=day)
            rows.append((len(rows), ts, 1, typ, float(v), "{}"))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def _mk_reference(vals):
    n = len(vals)
    s = sum(
        (1 if vals[j] > vals[i] else -1 if vals[j] < vals[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(c * (c - 1) * (2 * c + 5) for c in Counter(vals).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    if var > 0 and s > 0:
        z = (s - 1) / math.sqrt(var)
    elif var > 0 and s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    slopes = sorted(
        (vals[j] - vals[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    sen = (slopes[(m - 1) // 2] + slopes[m // 2]) / 2.0
    return s, var, z, sen


def test_daily_trend_robust_matches_reference(spark):
    """S, tie-corrected variance, z and the Theil-Sen slope must equal the
    textbook pairwise formulation — on a rising series, a falling one, a
    tie-heavy one (variance correction engaged) and a constant one
    (S = 0, z = 0)."""
    data = {
        "up": [1.0, 2.5, 2.0, 4.0, 5.5, 7.0],
        "down": [9.0, 7.5, 8.0, 5.0, 4.5, 2.0],
        "tied": [3.0, 3.0, 3.0, 4.0, 4.0, 5.0],
        "flat": [2.0, 2.0, 2.0, 2.0, 2.0, 2.0],
    }
    got = {
        r.event_type: r
        for r in daily_trend_robust(_events_from_daily(spark, data)).collect()
    }
    for typ, vals in data.items():
        s, var, z, sen = _mk_reference(vals)
        row = got[typ]
        assert row.n_days == len(vals) and row.n_pairs == len(vals) * (len(vals) - 1) // 2
        assert row.s_stat == s, typ
        assert abs(row.var_s - var) < 1e-9, typ
        assert abs(row.z_mk - z) < 1e-12, typ
        assert abs(row.sen_slope - sen) < 1e-12, typ


def test_daily_cusum_finds_planted_shift(spark):
    """A clean level shift at day 10 of 20 must put the changepoint on the
    last day of the low regime with the exact before/after means; a flat
    series reports zero deviation."""
    shifted = [10.0] * 10 + [50.0] * 10
    got = {
        r.event_type: r
        for r in daily_cusum_changepoint(
            _events_from_daily(spark, {"shift": shifted, "flat": [7.0] * 20})
        ).collect()
    }
    row = got["shift"]
    assert row.cp_x == 9 and row.cp_date == dt.date(2024, 1, 10)
    assert abs(row.mean_before - 10.0) < 1e-9
    assert abs(row.mean_after - 50.0) < 1e-9
    assert abs(row.mean_delta - 40.0) < 1e-9
    # max |dev| at the boundary: 10 days * (10 - 30) = -200
    assert abs(row.max_abs_dev - 200.0) < 1e-9
    assert abs(got["flat"].max_abs_dev) < 1e-9


def test_daily_type_correlation_matches_numpy(spark):
    """pearson_r must match the moment formula computed in Python on the
    same daily series: a perfectly correlated pair (r = 1), an
    anti-correlated pair (r = -1), and a zero-variance side (NULL)."""
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    c = [5.0, 4.0, 3.0, 2.0, 1.0]
    d = [3.0] * 5
    out = {
        (r.type_a, r.type_b): r.pearson_r
        for r in daily_type_correlation(
            _events_from_daily(spark, {"a": a, "b": b, "c": c, "d": d})
        ).collect()
    }
    assert abs(out[("a", "b")] - 1.0) < 1e-12
    assert abs(out[("a", "c")] + 1.0) < 1e-12
    assert out[("a", "d")] is None and out[("c", "d")] is None
    # a noisy pair against the plain moment formula
    import random

    rng = random.Random(7)
    x = [round(rng.uniform(1, 9), 4) for _ in range(12)]
    y = [round(xi * 2 + rng.uniform(-3, 3), 4) for xi in x]
    out2 = daily_type_correlation(
        _events_from_daily(spark, {"x": x, "y": y})
    ).collect()
    n, sx, sy = len(x), sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx, syy = sum(a * a for a in x), sum(b * b for b in y)
    want = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    got = [r.pearson_r for r in out2 if (r.type_a, r.type_b) == ("x", "y")][0]
    # the engine's moments are exact decimals; the Python reference
    # accumulates double error, so the tolerance is the reference's
    assert abs(got - want) < 1e-6


def test_t_closeness_hand_example(spark):
    """Ordered-EMD on a hand-computable frame: two groups over two bins.
    Global is 50/50; group A is 100/0 (EMD = |0.5| / 1 = 0.5), group B is
    0/100 (EMD = 0.5). With t = 0.2 both violate; with t = 0.6 none do."""
    rows = [("A", 100.0)] * 4 + [("B", 1100.0)] * 4
    df = spark.createDataFrame(rows, "grp string, bal double")
    out = dq.t_closeness_audit(df, ["grp"], "bal", bin_width=1000.0, t=0.2).collect()[0]
    assert out.m_bins == 2 and out.n_groups == 2
    assert out.n_over_t == 2 and abs(out.over_t_row_frac - 1.0) < 1e-12
    assert abs(out.max_emd - 0.5) < 1e-12
    loose = dq.t_closeness_audit(df, ["grp"], "bal", bin_width=1000.0, t=0.6).collect()[0]
    assert loose.n_over_t == 0 and loose.over_t_row_frac == 0.0


def test_t_closeness_identical_groups_zero(spark):
    """Groups distributed exactly like the global distribution have
    EMD = 0 — the audit must report no violations at any positive t."""
    rows = []
    for g in ("A", "B", "C"):
        rows += [(g, 500.0)] * 3 + [(g, 1500.0)] * 2 + [(g, 2500.0)] * 1
    df = spark.createDataFrame(rows, "grp string, bal double")
    out = dq.t_closeness_audit(df, ["grp"], "bal", bin_width=1000.0, t=0.01).collect()[0]
    assert out.n_groups == 3 and out.n_over_t == 0
    assert abs(out.max_emd) < 1e-12


def test_snm_finds_prefix_stable_edits(spark):
    """SNM must pair docs that sort adjacently (shared prefix) and differ
    mid-text, must NOT pair docs beyond the window, and the bucket join
    must produce exactly the rank-window pair set (vs a direct rank
    self-join reference)."""
    from magiceye_spark.llmops.dedup import sorted_neighborhood_near_dups

    texts = []
    # family A: shared 40-char prefix, one word flipped mid-text
    for i in range(3):
        texts.append("alpha block of shared prefix text here word%d tail common end" % i)
    # family B: sorts far from A
    for i in range(3):
        texts.append("zulu block of shared prefix text here word%d tail common end" % i)
    # 20 filler docs that sort between the families, so A and B are
    # farther apart in rank than the window
    for i in range(20):
        texts.append("middle filler %02d unique content row nothing shared" % i)
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b) for r in sorted_neighborhood_near_dups(docs, window=5).collect()
    }
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got  # family A
    assert (3, 4) in got and (3, 5) in got and (4, 5) in got  # family B
    assert not any(a < 3 <= 2 < 3 and b >= 3 for a, b in got if a < 3 and b in (3, 4, 5))
    # cross-family pairs impossible: ranks separated by 20 fillers
    assert not any(a in (0, 1, 2) and b in (3, 4, 5) for a, b in got)


def test_snm_bucket_join_equals_rank_window_reference(spark):
    """The bucketed candidate join must enumerate EXACTLY the pairs with
    0 < rank_gap <= window (no loss at bucket boundaries, no extras) —
    verified against a direct threshold-free reference with threshold=0
    so Jaccard never filters."""
    from magiceye_spark.llmops.dedup import sorted_neighborhood_near_dups

    docs = spark.createDataFrame(
        [(i, "w%03d common token" % ((i * 17) % 41), "en", "s", 20) for i in range(60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = sorted_neighborhood_near_dups(docs, window=4, threshold=0.0).collect()
    gaps = [r.rank_gap for r in out]
    assert len(out) == sum(min(4, 60 - i) for i in range(1, 61))  # Σ pairs
    assert max(gaps) == 4 and min(gaps) == 1


def test_source_distinctive_terms_surfaces_planted_term(spark):
    """A term appearing overwhelmingly in one source must top that
    source's list with z > 0; a uniformly-spread term must not make any
    top list; z must match the Monroe et al. formula computed in Python."""
    import math as m

    from magiceye_spark.llmops.textstats import source_distinctive_terms

    rows = []
    for i in range(40):
        rows.append((i, "common words everywhere plus specialterm", "en", "srcA", 40))
    for i in range(40, 80):
        rows.append((i, "common words everywhere plus othernoise", "en", "srcB", 40))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = source_distinctive_terms(docs, k=3, a0=10.0, min_df=5).collect()
    top = {(r.source, r.rank): (r.term, r.z_odds) for r in out}
    assert top[("srcA", 1)][0] == "specialterm"
    assert top[("srcB", 1)][0] == "othernoise"
    # reference z for specialterm in srcA: y_sw=40, y_w=40, n_s=200, n=400
    a0, y_sw, y_w, n_s, n = 10.0, 40, 40, 200, 400
    a_w = a0 * y_w / n
    y_rw, n_r = y_w - y_sw, n - n_s
    delta = m.log((y_sw + a_w) / (n_s + a0 - y_sw - a_w)) - m.log(
        (y_rw + a_w) / (n_r + a0 - y_rw - a_w)
    )
    z = delta / m.sqrt(1.0 / (y_sw + a_w) + 1.0 / (y_rw + a_w))
    assert abs(top[("srcA", 1)][1] - round(z, 6)) < 1e-9
    # every term in the shared scaffold is symmetric → |z| well below the planted one
    assert all(
        abs(v[1]) < abs(z) for kk, v in top.items() if v[0] not in ("specialterm", "othernoise")
    )


def test_type_value_assoc_matches_python_contingency(spark):
    """chi2_part / mi_part must equal a direct Python computation over the
    same contingency (zero cells included in chi2, excluded from MI), and
    an independent table must give ~0 for both."""
    import math as m

    rows = []
    # type A: values in bin 0 (x25), type B: values in bin 2 → strong association
    eid = 0
    for v, typ, cnt in [(10.0, "A", 30), (60.0, "A", 10), (10.0, "B", 10), (60.0, "B", 30)]:
        for _ in range(cnt):
            rows.append((eid, dt.datetime(2024, 1, 1 + eid % 28, 9), 1, typ, v, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from magiceye_spark.sketches import type_value_association

    got = {r.event_type: r for r in type_value_association(events, bin_width=25.0).collect()}
    # contingency: A: (30,10), B: (10,30); col totals (40,40); n=80
    n = 80
    for typ, (o0, o2) in {"A": (30, 10), "B": (10, 30)}.items():
        r_x = o0 + o2
        chi = sum(
            (o - r_x * 40 / n) ** 2 / (r_x * 40 / n) for o in (o0, o2)
        )
        mi = sum(
            (o / n) * m.log(o * n / (r_x * 40)) for o in (o0, o2) if o > 0
        )
        assert abs(got[typ].chi2_part - chi) < 1e-9, typ
        assert abs(got[typ].mi_part - mi) < 1e-9, typ
        assert got[typ].n_rows == r_x and got[typ].n_bins == 2


def test_seasonal_decomposition_recovers_planted_weekly_pattern(spark):
    """A pure weekly pattern (constant across weeks) must decompose into a
    constant trend = overall mean, seasonal = dow offset, residual ~ 0;
    edge days without a full 7-day window must be NULL."""
    from magiceye_spark.sketches import seasonal_decomposition

    base = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]  # dow 0..6
    vals = base * 4  # 28 days, x=0 is a dow-0 day
    rows = seasonal_decomposition(
        _events_from_daily(spark, {"t": vals})
    ).collect()
    mean = sum(base) / 7.0
    byx = {r.x: r for r in rows}
    assert len(byx) == 28
    for x in (0, 1, 2, 25, 26, 27):  # no full window
        assert byx[x].trend is None and byx[x].seasonal is None
    for x in range(3, 25):
        r = byx[x]
        assert abs(r.trend - mean) < 1e-9
        assert abs(r.seasonal - (base[x % 7] - mean)) < 1e-9
        assert abs(r.residual) < 1e-9
        assert r.day == dt.date(2024, 1, 1) + dt.timedelta(days=x)


def _synth_emb(spark, n=40, d=6, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 6) for _ in range(d)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from magiceye_spark.llmops.simsearch import embedding_covariance

    emb = _synth_emb(spark)
    X = np.array([r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64)
    X = np.round(X, 6)
    want = np.cov(X, rowvar=False)  # ddof=1, matching /(n-1)
    got = embedding_covariance(emb).collect()
    assert len(got) == 6 * 7 // 2
    for r in got:
        assert r.n == 40
        assert abs(r.cov - want[r.i - 1, r.j - 1]) < 1e-9, (r.i, r.j)


def test_embedding_pca_matches_numpy(spark):
    import numpy as np

    from magiceye_spark.llmops.simsearch import embedding_pca_project

    emb = _synth_emb(spark, n=60, d=5)
    X = np.round(np.array([r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64), 6)
    C = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    mu = X.mean(axis=0)
    want = (X - mu) @ np.array(comps).T
    got = embedding_pca_project(emb, n_components=2).orderBy("vec_id").collect()
    for k, r in enumerate(got):
        assert abs(r.pc1 - want[k, 0]) < 2e-6
        assert abs(r.pc2 - want[k, 1]) < 2e-6
    # PC1 variance ~ top eigenvalue
    pc1 = np.array([r.pc1 for r in got])
    assert abs(pc1.var(ddof=1) - vals[order[0]]) < 1e-5


def test_nb_source_confusion_separable_corpus_is_diagonal(spark):
    """On a cleanly separable two-source corpus the resubstitution
    confusion matrix must be exactly diagonal; scores must match the
    add-1 multinomial formula computed in Python for a probe doc."""
    import math as m

    rows = []
    for i in range(10):
        rows.append((i, "apple banana cherry apple", "en", "fruit", 25))
    for i in range(10, 20):
        rows.append((i, "bolt washer gear bolt", "en", "metal", 21))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from magiceye_spark.llmops.textstats import nb_source_confusion

    out = {(r.actual, r.predicted): r.n_docs for r in nb_source_confusion(docs).collect()}
    assert out == {("fruit", "fruit"): 10, ("metal", "metal"): 10}


def test_nb_score_rearrangement_equals_direct_formula(spark):
    """The sparse rearrangement score(d,s) = ln(Ns/N) − T·ln(n_s+V) +
    Σ_seen c·ln(y+1) must equal the direct smoothed product
    Π ((y_ts+1)/(n_s+V))^c computed in log space — including for a doc
    containing terms unseen in the scored source."""
    import math as m

    rows = [
        (0, "x x y", "en", "A", 5),
        (1, "y z", "en", "B", 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # replicate internals: vocab {x,y,z} V=3; A: x:2 y:1 (n=3); B: y:1 z:1 (n=2)
    # direct score of doc0 against B: ln(1/2) + 2*ln((0+1)/(2+3)) + 1*ln((1+1)/(2+3))
    direct = m.log(0.5) + 2 * m.log(1 / 5) + m.log(2 / 5)
    rearranged = m.log(0.5) - 3 * m.log(5) + 1 * m.log(2)  # T=3, seen: y (c=1, ln(1+1))
    assert abs(direct - rearranged) < 1e-12
    # and the classifier must still label each doc by its own source
    from magiceye_spark.llmops.textstats import nb_source_confusion

    out = {(r.actual, r.predicted): r.n_docs for r in nb_source_confusion(docs).collect()}
    assert out == {("A", "A"): 1, ("B", "B"): 1}


def test_wilson_ci_matches_closed_form(spark):
    """Wilson bounds must equal the closed form for hand-picked counts,
    stay inside [0, 1], and bracket the point rate; 0-flagged and
    all-flagged sources must not produce NaN."""
    import math as m

    rows = []
    specs = {"s1": (40, 3), "s2": (400, 30), "s3": (10, 0), "s4": (10, 10)}
    did = 0
    for src, (n, k) in specs.items():
        for i in range(n):
            rows.append((did, "t", "en", src, 100 if i < k else 900))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from magiceye_spark.llmops.textstats import source_flag_rate_ci

    got = {r.source: r for r in source_flag_rate_ci(docs, max_chars=400, z=1.96).collect()}
    for src, (n, k) in specs.items():
        p, z = k / n, 1.96
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * m.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        r = got[src]
        assert r.n_docs == n and r.n_flagged == k
        assert abs(r.flag_rate - p) < 1e-12
        assert abs(r.wilson_lo - (center - half) / denom) < 1e-12
        assert abs(r.wilson_hi - (center + half) / denom) < 1e-12
        assert 0.0 <= r.wilson_lo <= p <= r.wilson_hi <= 1.0


def test_embedding_outliers_rank_planted_outlier_first(spark):
    """A planted far-away vector must rank first, its z² matching the
    diagonal Mahalanobis formula computed in Python over the same
    rounded data; ties impossible by construction."""
    import numpy as np

    from magiceye_spark.llmops.simsearch import embedding_outlier_scores

    rng = __import__("random").Random(11)
    rows = [
        (i, [round(rng.uniform(-0.1, 0.1), 6) for _ in range(4)], 0)
        for i in range(50)
    ]
    rows.append((99, [5.0, -5.0, 5.0, -5.0], 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = embedding_outlier_scores(emb, k=3).collect()
    assert got[0].vec_id == 99
    X = np.round(np.array([r[1] for r in rows], dtype=np.float64), 6)
    mu, var = X.mean(axis=0), X.var(axis=0, ddof=1)
    want = (((X[-1] - mu) ** 2) / var).sum()
    assert abs(got[0].z2 - want) < 1e-6 * want


def test_vocab_coverage_curve_matches_python(spark):
    """Ranks must follow (freq desc, term asc); cum_frac must match the
    cumulative fraction computed in Python and reach 1.0 at the last
    vocabulary rank."""
    from collections import Counter

    from magiceye_spark.llmops.textstats import vocab_coverage_curve

    texts = ["b a a c a b", "c b d a", "e a b"]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = vocab_coverage_curve(docs, k=100).collect()
    cnt = Counter(w for t in texts for w in t.split())
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    assert [r.term for r in got] == [t for t, _ in order]
    run = 0
    for r, (t, c) in zip(got, order):
        run += c
        assert r.freq == c and r.cum_freq == run
        assert abs(r.cum_frac - run / total) < 1e-12
    assert abs(got[-1].cum_frac - 1.0) < 1e-12


def test_nb_crossval_separable_corpus_perfect_and_partitioned(spark):
    """On a separable corpus both folds must score accuracy 1.0, and the
    fold sizes must sum to the corpus size (every doc evaluated exactly
    once)."""
    from magiceye_spark.llmops.textstats import nb_crossval_accuracy

    rows = []
    for i in range(30):
        rows.append((i, "apple banana cherry plum", "en", "fruit", 20))
    for i in range(30, 60):
        rows.append((i, "bolt washer gear sprocket", "en", "metal", 20))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = nb_crossval_accuracy(docs).collect()
    assert [r.fold for r in got] == [0, 1]
    assert sum(r.n_eval for r in got) == 60
    assert all(r.n_eval > 0 for r in got)
    assert all(r.accuracy == 1.0 and r.n_correct == r.n_eval for r in got)


def test_ks_drift_detects_planted_shift_and_matches_scipy_free_reference(spark):
    """D must equal the max-ECDF-gap computed in Python on the same
    values; a type whose second half shifts must flag drifted=True, an
    identical-halves type must give D from ties only (~small) and not
    flag."""
    rows, eid = [], 0
    # 'shift': first half values 1..10 each day, second half values 21..30
    for day in range(30):
        for v in range(1, 11):
            val = float(v) if day < 15 else float(v + 20)
            rows.append((eid, dt.datetime(2024, 1, 1 + day, 10), 1, "shift", val, "{}"))
            eid += 1
    # 'same': identical value multiset in both halves
    for day in range(30):
        for v in range(1, 11):
            rows.append((eid, dt.datetime(2024, 1, 1 + day, 10), 1, "same", float(v), "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from magiceye_spark.sketches import ks_half_month_drift

    got = {r.event_type: r for r in ks_half_month_drift(events).collect()}
    s = got["shift"]
    assert s.n_a == 150 and s.n_b == 150
    assert abs(s.ks_d - 1.0) < 1e-12  # disjoint supports
    assert s.drifted is True
    assert abs(s.at_value - 10.0) < 1e-12  # gap maxes at the end of half-a support
    same = got["same"]
    assert abs(same.ks_d) < 1e-12 and same.drifted is False

    # reference on a mixed case: interleaved but different distributions
    import random

    rng = random.Random(5)
    rows2, eid = [], 0
    vals_a = [round(rng.uniform(0, 10), 2) for _ in range(80)]
    vals_b = [round(rng.uniform(3, 13), 2) for _ in range(70)]
    for i, v in enumerate(vals_a):
        rows2.append((eid, dt.datetime(2024, 1, 1 + i % 14, 8), 1, "m", v, "{}"))
        eid += 1
    for i, v in enumerate(vals_b):
        rows2.append((eid, dt.datetime(2024, 1, 16 + i % 14, 8), 1, "m", v, "{}"))
        eid += 1
    ev2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = ks_half_month_drift(ev2).collect()[0]
    grid = sorted(set(vals_a) | set(vals_b))
    def ecdf(vs, x):
        return sum(1 for v in vs if v <= x) / len(vs)
    want = max(abs(ecdf(vals_a, x) - ecdf(vals_b, x)) for x in grid)
    assert abs(r.ks_d - want) < 1e-12


def test_spearman_matches_python_reference_with_ties(spark):
    """rho must equal the average-rank Spearman computed in Python on
    series WITH ties (the tie-correction path), hit ±1 on monotone
    pairs, and NULL on a constant side."""
    a = [1.0, 2.0, 2.0, 3.0, 5.0, 4.0]
    b = [2.0, 3.0, 3.5, 4.0, 9.0, 6.0]   # same order as a -> rho 1 w/o ties? ranks differ
    c = [6.0, 5.0, 5.0, 4.0, 1.0, 2.0]
    d = [7.0] * 6
    from magiceye_spark.sketches import daily_type_spearman

    out = {
        (r.type_a, r.type_b): r.spearman_rho
        for r in daily_type_spearman(
            _events_from_daily(spark, {"a": a, "b": b, "c": c, "d": d})
        ).collect()
    }

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    def pearson(x, y):
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(p * q for p, q in zip(x, y))
        sxx, syy = sum(p * p for p in x), sum(q * q for q in y)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    want_ab = pearson(avg_ranks(a), avg_ranks(b))
    assert abs(out[("a", "b")] - want_ab) < 1e-9
    want_ac = pearson(avg_ranks(a), avg_ranks(c))
    assert abs(out[("a", "c")] - want_ac) < 1e-9 and want_ac < -0.9
    assert out[("a", "d")] is None


def test_snm_agreement_counts_consistent(spark):
    """On the sf0.001 corpus: n_both <= min(n_ref, n_snm), recall in
    [0, 1], and the three counts reconcile with the underlying pair
    sets computed directly."""
    from magiceye_spark.llmops.dedup import (
        jaccard_near_dups,
        snm_vs_allpairs_agreement,
        sorted_neighborhood_near_dups,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = snm_vs_allpairs_agreement(docs).collect()[0]
    ref = {(r.doc_a, r.doc_b) for r in jaccard_near_dups(docs, threshold=0.5).collect()}
    snm = {
        (r.doc_a, r.doc_b)
        for r in sorted_neighborhood_near_dups(docs, window=5, threshold=0.5).collect()
    }
    assert row.n_ref == len(ref) and row.n_snm == len(snm)
    assert row.n_both == len(ref & snm)
    assert row.snm_extra == len(snm - ref)
    assert 0.0 <= row.snm_recall <= 1.0
    assert abs(row.snm_recall - len(ref & snm) / len(ref)) < 1e-12


def test_rename_candidates_pairs_and_rejects(spark):
    """A dropped+added pair with identical type+comment is proposed as a
    rename (closest name wins ties); a type-changed column and a
    comment-changed column are NOT; a genuinely new column with no
    matching drop proposes nothing."""
    from magiceye_spark.diff.core import rename_candidates
    from magiceye_spark.snapshot import SchemaSnapshot

    base = SchemaSnapshot.from_rows(
        spark,
        tables=[("t1", ""), ("t2", "")],
        columns=[
            ("t1", "user_id", "bigint", "", True, "the user", False),
            ("t1", "addr", "text", "", True, "street address", False),
            ("t2", "amount", "int", "", True, "cents", False),
        ],
    )
    target = SchemaSnapshot.from_rows(
        spark,
        tables=[("t1", ""), ("t2", "")],
        columns=[
            # rename: same type+comment, close name
            ("t1", "user_identifier", "bigint", "", True, "the user", False),
            # two candidates for addr; addr2 is closer than address_line
            ("t1", "addr2", "text", "", True, "street address", False),
            ("t1", "address_line", "text", "", True, "street address", False),
            # type changed -> NOT a rename candidate for amount
            ("t2", "amount2", "bigint", "", True, "cents", False),
            # brand-new column, no matching drop
            ("t2", "created_at", "timestamp", "", True, "row ts", False),
        ],
    )
    got = {
        (r.table_name, r.old_column): (r.new_column, r.name_dist)
        for r in rename_candidates(base, target).collect()
    }
    assert got[("t1", "user_id")][0] == "user_identifier"
    assert got[("t1", "addr")] == ("addr2", 1)
    assert ("t2", "amount") not in got  # type changed, not proposed
    assert len(got) == 2


def test_fd_audit_holds_and_violations(spark):
    """A real dependency holds (max 1 rhs per lhs); a planted violation
    reports the violating lhs count and max fan-out exactly."""
    rows = [
        (1, "a", "x"), (1, "a", "x"),       # key 1 -> a consistently
        (2, "b", "x"), (2, "b", "y"),       # rhs2 varies under key 2
        (3, "c", "z"),
    ]
    df = spark.createDataFrame(rows, "k int, v1 string, v2 string")
    from magiceye_spark.dq import functional_dependency_audit

    out = {
        r.dependency: r
        for r in functional_dependency_audit(
            df, [(["k"], "v1"), (["k"], "v2")]
        ).collect()
    }
    assert out["k -> v1"].holds is True and out["k -> v1"].n_violating_lhs == 0
    r = out["k -> v2"]
    assert r.holds is False and r.n_violating_lhs == 1 and r.max_rhs_per_lhs == 2
    assert r.n_lhs_values == 3


def test_pk_candidate_audit_nulls_and_dups(spark):
    """A unique non-null set is a key; duplicates and NULLs each
    disqualify, with exact counts."""
    rows = [(1, 10, "a"), (2, 10, "b"), (3, None, "c"), (4, 11, "d"), (4, 12, "e")]
    df = spark.createDataFrame(rows, "id int, grp int, v string")
    from magiceye_spark.dq import pk_candidate_audit

    out = {r.candidate: r for r in pk_candidate_audit(df, [["id"], ["grp"], ["v"]]).collect()}
    ridd = out["id"]
    assert ridd.is_key is False and ridd.n_dup_rows == 2 and ridd.n_null_rows == 0
    rg = out["grp"]
    assert rg.is_key is False and rg.n_dup_rows == 2 and rg.n_null_rows == 1
    rv = out["v"]
    assert rv.is_key is True and rv.n_distinct == 5 and rv.n_rows == 5


def test_lag_correlation_weekly_pattern_and_reference(spark):
    """A pure weekly pattern gives lag_r(7) = 1 and lag_r(1) < 1; values
    must match the pairwise Pearson computed in Python."""
    base = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    vals = base * 4
    from magiceye_spark.sketches import daily_lag_correlation

    out = {
        (r.event_type, r.lag): r
        for r in daily_lag_correlation(_events_from_daily(spark, {"w": vals})).collect()
    }

    def pearson_pairs(vals, k):
        pairs = [(vals[i], vals[i - k]) for i in range(k, len(vals))]
        n = len(pairs)
        sx = sum(p[0] for p in pairs); sy = sum(p[1] for p in pairs)
        sxy = sum(p * q for p, q in pairs)
        sxx = sum(p * p for p, _ in pairs); syy = sum(q * q for _, q in pairs)
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        return (n * sxy - sx * sy) / math.sqrt(den) if den > 0 else None

    for k in range(1, 8):
        r = out[("w", k)]
        assert r.n_pairs == 28 - k
        want = pearson_pairs(vals, k)
        assert abs(r.lag_r - want) < 1e-9, k
    assert abs(out[("w", 7)].lag_r - 1.0) < 1e-12
    assert out[("w", 1)].lag_r < 0.9


def test_segmented_trend_recovers_broken_stick(spark):
    """A flat-then-rising series must place the changepoint at the end of
    the flat regime and report slope_before ~ 0, slope_after ~ the
    planted slope."""
    # second regime starts ABOVE the series mean so the CUSUM minimum sits
    # exactly at the regime boundary (a gradual rise would put the argmax
    # where values cross the mean — correct CUSUM behavior, different test)
    vals = [5.0] * 12 + [50.0 + 3.0 * i for i in range(1, 13)]
    from magiceye_spark.sketches import segmented_trend

    row = segmented_trend(_events_from_daily(spark, {"s": vals})).collect()[0]
    assert row.cp_x == 11  # last flat day
    assert abs(row.slope_before) < 1e-9
    assert abs(row.slope_after - 3.0) < 1e-9
    assert row.slope_change > 2.9
    assert row.n_before == 12 and row.n_after == 12


def test_language_id_confusion_planted(spark):
    """Correctly-labeled docs land on the diagonal; a mislabeled doc (en
    text declared 'de') shows as one off-diagonal cell."""
    rows = [
        (0, "the quick brown fox and the lazy dog with their friends", "en", "s", 50),
        (1, "the cat and the dog are in the house with them", "en", "s", 40),
        (2, "der hund und die katze sind nicht in dem haus", "de", "s", 40),
        (3, "the train was late because the driver had the flu", "de", "s", 40),  # mislabeled
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from magiceye_spark.llmops.textstats import language_id_confusion

    got = {(r.declared_lang, r.lang_pred): r.n_docs for r in language_id_confusion(docs).collect()}
    assert got[("en", "en")] == 2
    assert got[("de", "de")] == 1
    assert got[("de", "en")] == 1
    assert sum(got.values()) == 4


def test_seasonal_anomalies_fire_on_planted_spike_not_on_rhythm(spark):
    """A weekly rhythm alone must produce NO anomalies (the seasonal
    component absorbs it); one spiked day on top of the rhythm must be
    the unique flagged day."""
    from magiceye_spark.sketches import seasonal_residual_anomalies

    base = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    clean = base * 4
    spiked = list(clean)
    spiked[10] += 500.0
    out_clean = seasonal_residual_anomalies(
        _events_from_daily(spark, {"t": clean}), z_cut=1.5
    ).collect()
    assert out_clean == []
    out = seasonal_residual_anomalies(
        _events_from_daily(spark, {"t": spiked}), z_cut=3.0
    ).collect()
    assert [r.x for r in out] == [10]
    assert out[0].z > 3.0


def test_quality_calibration_deciles_partition_and_order(spark):
    """Deciles must partition the corpus (sizes sum to N, each ~N/10),
    mean_score must be non-decreasing across deciles (rank-ordered by
    construction), and a corpus where short docs are exactly the
    low-score docs must show short_rate 1.0 in the bottom decile and 0
    in the top."""
    from magiceye_spark.llmops.textstats import quality_score_calibration

    rows = []
    for i in range(40):
        # low-quality: tiny repeated text AND short n_chars
        rows.append((i, "x y", "en", "s", 100))
    for i in range(40, 80):
        good = ("the quick brown fox jumps over the lazy dog and then "
                "walks home with a friendly calm smile %d" % i)
        rows.append((i, good, "en", "s", 900))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = quality_score_calibration(docs, max_chars=400, n_bins=10).collect()
    assert sum(r.n_docs for r in out) == 80
    scores = [r.mean_score for r in out]
    assert scores == sorted(scores)
    assert out[0].short_rate == 1.0 and out[-1].short_rate == 0.0


def test_type_mix_drift_matches_python_contingency(spark):
    """chi2 and G must equal the direct Python computation on the same
    2xT contingency; an identical mix in both halves gives ~0 for both."""
    import math as m

    rows, eid = [], 0
    # half a: A:30 B:10; half b: A:10 B:30 (drifted mix)
    for day, typ, cnt in [(1, "A", 30), (1, "B", 10), (20, "A", 10), (20, "B", 30)]:
        for _ in range(cnt):
            rows.append((eid, dt.datetime(2024, 1, day, 9), 1, typ, 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from magiceye_spark.sketches import type_mix_drift

    r = type_mix_drift(ev).collect()[0]
    assert r.n_a == 40 and r.n_b == 40 and r.dof == 1
    n = 80
    chi = g = 0.0
    for ca, cb in ((30, 10), (10, 30)):
        rt = ca + cb
        ea, eb = rt * 40 / n, rt * 40 / n
        chi += (ca - ea) ** 2 / ea + (cb - eb) ** 2 / eb
        g += 2 * (ca * m.log(ca / ea) + cb * m.log(cb / eb))
    assert abs(r.chi2 - chi) < 1e-9
    assert abs(r.g_stat - g) < 1e-9

    # identical mix -> both ~0
    rows2 = []
    for day in (1, 20):
        for typ, cnt in (("A", 20), ("B", 20)):
            for _ in range(cnt):
                rows2.append((len(rows2), dt.datetime(2024, 1, day, 9), 1, typ, 1.0, "{}"))
    ev2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r2 = type_mix_drift(ev2).collect()[0]
    assert abs(r2.chi2) < 1e-9 and abs(r2.g_stat) < 1e-9


def test_user_behavior_similarity_planted_twin(spark):
    """A planted behavioral twin of probe user 1 must rank first for that
    probe with cosine ~1; an orthogonal user must rank below a
    same-direction one; self-matches are excluded."""
    rows, eid = [], 0

    def add(uid, typ, cnt):
        nonlocal eid
        for _ in range(cnt):
            rows.append((eid, dt.datetime(2024, 1, 2, 9), uid, typ, 1.0, "{}"))
            eid += 1

    add(1, "click", 10); add(1, "purchase", 2)      # probe
    add(2, "click", 20); add(2, "purchase", 4)      # exact direction twin
    add(3, "error", 15)                              # orthogonal
    add(4, "click", 10); add(4, "view", 10)          # partial overlap
    from magiceye_spark.events_ops import user_behavior_similarity

    out = user_behavior_similarity(
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ),
        n_probes=1,
        k=3,
    ).collect()
    assert all(r.probe_id == 1 and r.similar_user != 1 for r in out)
    assert out[0].similar_user == 2 and abs(out[0].cosine - 1.0) < 1e-12
    ranks = {r.similar_user: r.rank for r in out}
    assert ranks[4] < ranks[3]  # partial overlap beats orthogonal
