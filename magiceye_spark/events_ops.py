"""Event-stream batch operators: sessionization, as-of join, and JSON
property extraction over the ``events`` table.

These are the batch shapes of the operators a training-data/event pipeline
needs beyond plain rollups (SURVEY.md §2.4). All pure DataFrame API:

- :func:`sessionize` — gap-based sessionization with window functions. ONE
  shuffle (partition by user); the running session counter and the session
  aggregation share that partitioning, so Catalyst reuses the exchange.
- :func:`asof_join` — generic "latest right row at-or-before each left row"
  join via the union + last-value-ignore-nulls trick: tag both sides, sort
  within the key partition by (ts, tag), and carry the most recent right row
  forward. ONE shuffle on the key — no range cross-join, no per-key collect;
  this is the formulation that survives 100 TB where a theta-join
  (``l.ts >= r.ts``) would explode. Skewed keys split by AQE.
- :func:`props_rollup` — typed extraction from a JSON string column
  (``get_json_object``, JVM-side) feeding a grouped aggregate.

Timestamps: the testdata stores TIMESTAMP(NANOS); everything here works on
the micros-truncated timestamp from :func:`magiceye_spark.analytics._events`
so Spark and the DuckDB oracle (``CAST(ts AS TIMESTAMP)``) agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from magiceye_spark.analytics import _dec, _events, _money

#: DuckDB-side rendering of the events table with nanos truncated to micros
#: (mirrors analytics._events on the Spark side).
SQL_EVENTS_US = (
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props "
    "FROM events"
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Returns one row per session:
    (user_id, session_seq, session_start, session_end, n_events, sum_value).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    is_new = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_session = events.withColumn("session_seq", F.sum(is_new).over(run))
    return (
        with_session.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum(_dec(F.col("value")))).alias("sum_value"),
        )
        .orderBy(user_col, "session_seq")
    )


def sql_sessionize(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS ({SQL_EVENTS_US}),
flagged AS (
  SELECT *,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_carry: list[str] | None = None,
    tie_col: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row with the same keys:
    ``direction='backward'`` (default) the most recent with ``right.ts <=
    left.ts``, ``direction='forward'`` the earliest with ``right.ts >=
    left.ts`` — pandas ``merge_asof`` semantics at Spark scale (left
    outer: unmatched rows keep NULLs). ``tolerance_seconds`` bounds the
    match distance; a match farther away is nulled out, not substituted.

    ``right_carry`` names the right columns to attach (prefixed ``r_``);
    ``tie_col`` breaks ties among right rows sharing a timestamp (largest
    wins). Implemented as union + last(ignorenulls) over a single
    key-partitioned window — one shuffle, linear in rows, either
    direction (forward just flips the window's sort order; no second
    formulation, no theta join).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_carry = right_carry or [c for c in right.columns if c not in keys and c != ts_col]
    l = left.withColumn("_tag", F.lit(1))
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"r_{c}") for c in right_carry],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    ts_ord = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    order = [ts_ord, F.col("_tag").asc()]
    if tie_col is not None:
        order.append(F.col(f"r_{tie_col}").asc_nulls_first())
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = u.select(
        "*",
        *[
            F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_carry
        ],
        F.last(F.when(F.col("_tag") == 0, F.col(ts_col)), ignorenulls=True)
        .over(w)
        .alias("asof_ts"),
    )
    out = carried.where(F.col("_tag") == 1).drop(
        "_tag", *[f"r_{c}" for c in right_carry]
    )
    if tolerance_seconds is not None:
        is_ts = dict(out.dtypes)[ts_col].startswith("timestamp")
        to_us = (lambda c: F.unix_micros(c)) if is_ts else (lambda c: c)
        gap = (
            to_us(F.col(ts_col)) - to_us(F.col("asof_ts"))
            if direction == "backward"
            else to_us(F.col("asof_ts")) - to_us(F.col(ts_col))
        )
        unit = 1_000_000 if is_ts else 1  # non-timestamp ts_col: same unit as the column
        ok = gap <= F.lit(int(tolerance_seconds * unit))
        out = out.select(
            *[c for c in out.columns if not c.startswith("asof_")],
            *[
                F.when(ok, F.col(c)).alias(c)
                for c in out.columns
                if c.startswith("asof_")
            ],
        )
    return out


def purchases_with_last_click(events: DataFrame) -> DataFrame:
    """As-of showcase: each purchase annotated with the user's most recent
    click at-or-before the purchase. (purchase_id, user_id, ts,
    asof_event_id = click id, asof_ts = click time)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    # dedupe clicks sharing (user, ts) to the max event_id so the as-of
    # match is uniquely defined on both engines
    clicks = clicks.groupBy("user_id", "ts").agg(F.max("event_id").alias("event_id"))
    out = asof_join(purchases, clicks, keys=["user_id"], right_carry=["event_id"])
    return out.select(
        "purchase_id", "user_id", "ts",
        F.col("asof_event_id").alias("click_event_id"),
        F.col("asof_ts").alias("click_ts"),
    ).orderBy("purchase_id")


SQL_PURCHASE_LAST_CLICK = f"""
WITH e AS ({SQL_EVENTS_US}),
clicks AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM e WHERE event_type = 'click' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM e WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts,
       c.event_id AS click_event_id, c.ts AS click_ts
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.purchase_id
"""


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    window_seconds: int,
    ts_col: str = "ts",
    count_col: str = "n_in_window",
) -> DataFrame:
    """For each left row, count right rows with the same keys and
    ``right.ts ∈ [left.ts - window, left.ts]`` — a bounded range join.

    A naive theta join (``r.ts BETWEEN l.ts - w AND l.ts``) degenerates to a
    per-key nested loop; this buckets both sides into window-sized time
    buckets and equi-joins each left row against its own and the previous
    bucket (any right row in range lives in one of the two), then filters
    exactly. Shuffle key (keys…, bucket) is well-distributed; cost is
    O(matches), not O(|l|·|r| per key). Left rows with no matches keep 0.
    Left rows must be distinct (carry a unique id column) — duplicates
    would collapse in the per-row count aggregation.
    """
    win_us = window_seconds * 1_000_000
    r = right.select(
        *keys, F.unix_micros(F.col(ts_col)).alias("_r_us")
    ).withColumn("_bucket", (F.col("_r_us") / win_us).cast("long"))
    l = left.withColumn("_l_us", F.unix_micros(F.col(ts_col))).withColumn(
        "_bucket0", (F.col("_l_us") / win_us).cast("long")
    )
    l_exploded = l.withColumn(
        "_bucket", F.explode(F.array(F.col("_bucket0"), F.col("_bucket0") - 1))
    )
    matches = (
        l_exploded.join(r, [*keys, "_bucket"])
        .where(
            (F.col("_r_us") >= F.col("_l_us") - win_us)
            & (F.col("_r_us") <= F.col("_l_us"))
        )
        .groupBy(*[F.col(c) for c in l.columns if c not in ("_bucket0",)])
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    out = l.join(matches, [c for c in l.columns if c != "_bucket0"], "left")
    return out.drop("_l_us", "_bucket0").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0))
    )


def clicks_before_purchase(events: DataFrame, window_seconds: int = 300) -> DataFrame:
    """Range-join showcase: clicks by the same user in the 5 minutes up to
    (and including) each purchase."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.where(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        purchases, clicks, keys=["user_id"], window_seconds=window_seconds,
        count_col="n_clicks",
    ).orderBy("purchase_id")


SQL_CLICKS_BEFORE_PURCHASE = f"""
WITH e AS ({SQL_EVENTS_US}),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts FROM e WHERE event_type = 'purchase'
),
clicks AS (SELECT user_id, ts FROM e WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id, p.ts,
       (SELECT COUNT(*) FROM clicks c
        WHERE c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 300 SECOND AND p.ts) AS n_clicks
FROM purchases p
ORDER BY p.purchase_id
"""


def props_rollup(events: DataFrame) -> DataFrame:
    """Typed JSON extraction + rollup: pull ``$.k`` out of the props JSON
    column (JVM ``get_json_object``, no Python) and aggregate per event
    type: (event_type, n_events, sum_k, n_k_over_50)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_k_over_50"),
        )
        .orderBy("event_type")
    )


SQL_PROPS_ROLLUP = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 END) AS n_k_over_50
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def props_key_stats(events: DataFrame, props_col: str = "props") -> DataFrame:
    """Semi-structured column profiler: which JSON keys exist in the
    ``props`` payload, in what fraction of rows, and how many distinct
    values each takes — the schema-inference report run before promoting
    a JSON blob column to typed columns. JVM-side ``json_object_keys`` +
    explode + one aggregation; no Python, no sampling (exact over the
    full table — swap the distinct for approx_count_distinct at 100 TB)."""
    total = events.count()
    entries = events.select(
        F.explode(F.from_json(F.col(props_col), "map<string,string>")).alias(
            "key", "_v"
        )
    )
    return (
        entries.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.count(F.lit(1)) / F.lit(total), 4).alias("frac_rows"),
            F.countDistinct("_v").alias("n_distinct"),
        )
        .orderBy("key")
    )


SQL_PROPS_KEY_STATS = """
WITH keys AS (
  SELECT UNNEST(json_keys(props)) AS key, props FROM events
)
SELECT key, COUNT(*) AS n_rows,
       ROUND(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM events), 4) AS frac_rows,
       COUNT(DISTINCT json_extract_string(props, '$.' || key)) AS n_distinct
FROM keys
GROUP BY key
ORDER BY key
"""


def user_running_stats(events: DataFrame) -> DataFrame:
    """Window-frame battery per user event: running index (row_number),
    seconds since previous event (lag), cumulative value sum (unbounded
    preceding frame), and 5-event moving average (bounded frame). All sums
    through per-row-rounded decimals so both engines agree bitwise."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last5 = w.rowsBetween(-4, 0)
    dec_v = F.round(F.col("value"), 4).cast("decimal(18,4)")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w).alias("event_seq"),
        ((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1_000_000.0)
        .alias("secs_since_prev"),
        F.round(F.sum(dec_v).over(cum).cast("double"), 2).alias("cum_value"),
        F.round(
            F.sum(dec_v).over(last5).cast("double") / F.count(F.lit(1)).over(last5), 4
        ).alias("moving_avg_5"),
    )


SQL_RUNNING_STATS = f"""
WITH e AS ({{events}})
SELECT event_id, user_id, ts,
       ROW_NUMBER() OVER w AS event_seq,
       (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS secs_since_prev,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_value,
       ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS moving_avg_5
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""".replace("{events}", SQL_EVENTS_US)


_FUNNEL_STEPS = ("signup", "click", "purchase")


def conversion_funnel(
    events: DataFrame, steps: tuple[str, ...] = _FUNNEL_STEPS
) -> DataFrame:
    """Ordered conversion funnel: users counted at step i only if they did
    step i strictly after their first occurrence of step i-1 (first-touch
    semantics). One aggregation shuffle on user_id; the step comparison is
    a per-user scalar expression. Returns (step_idx, step, n_users)."""
    firsts = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached(i): t0..ti all present and strictly increasing
    conds = []
    for i in range(len(steps)):
        c = F.col("t0").isNotNull()
        for j in range(1, i + 1):
            c = c & F.col(f"t{j}").isNotNull() & (F.col(f"t{j}") > F.col(f"t{j-1}"))
        conds.append(c)
    counts = firsts.agg(
        *[F.count(F.when(c, 1)).alias(f"n{i}") for i, c in enumerate(conds)]
    )
    # explode the single counts row — a per-step select + union would
    # repeat the user-agg subtree (a full events scan) once per step
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(entries).alias("e"))
        .select("e.step_idx", "e.step", "e.n_users")
        .orderBy("step_idx")
    )


def sql_conversion_funnel(steps: tuple[str, ...] = _FUNNEL_STEPS) -> str:
    firsts = ", ".join(
        f"MIN(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}"
        for i, s in enumerate(steps)
    )
    selects = []
    for i, s in enumerate(steps):
        cond = "t0 IS NOT NULL" + "".join(
            f" AND t{j} IS NOT NULL AND t{j} > t{j-1}" for j in range(1, i + 1)
        )
        selects.append(
            f"SELECT {i} AS step_idx, '{s}' AS step, "
            f"COUNT(CASE WHEN {cond} THEN 1 END) AS n_users FROM firsts"
        )
    return (
        f"WITH e AS ({SQL_EVENTS_US}), "
        f"firsts AS (SELECT user_id, {firsts} FROM e GROUP BY user_id) "
        + " UNION ALL ".join(selects)
        + " ORDER BY step_idx"
    )


def cohort_retention(events: DataFrame, max_days: int = 7) -> DataFrame:
    """Day-N retention by first-seen cohort: users grouped by their first
    active day, counted again on each later day they were active.
    (cohort_day, day_offset, n_users). Two shuffles: first-day per user
    (broadcast back), then the (cohort, offset) rollup."""
    first_day = events.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", F.to_date(F.col("ts")).alias("active_day")
    ).distinct()
    j = active.join(F.broadcast(first_day), "user_id")
    offset = F.datediff(F.col("active_day"), F.col("cohort_day"))
    return (
        j.select("user_id", "cohort_day", offset.alias("day_offset"))
        .where(F.col("day_offset") <= max_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def sql_cohort_retention(max_days: int = 7) -> str:
    return f"""
WITH e AS ({SQL_EVENTS_US}),
first_day AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day FROM e GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM e
)
SELECT cohort_day, date_diff('day', cohort_day, active_day) AS day_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM active JOIN first_day USING (user_id)
WHERE date_diff('day', cohort_day, active_day) <= {max_days}
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
"""


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    return sessionize(_events(spark, sf_dir), gap_minutes=gap_minutes)


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchases_with_last_click(_events(spark, sf_dir))


def purchases_with_next_error(events: DataFrame, tolerance_hours: int = 1) -> DataFrame:
    """Forward as-of with tolerance: each purchase annotated with the
    user's FIRST error at-or-after it, but only within
    ``tolerance_hours`` — incident attribution (did this purchase hit an
    error shortly after?). Exercises asof_join(direction='forward',
    tolerance_seconds=...) — one keyed window shuffle, no theta join."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    errors = (
        events.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(
        purchases,
        errors,
        keys=["user_id"],
        right_carry=["event_id"],
        direction="forward",
        tolerance_seconds=tolerance_hours * 3600,
    )
    return out.select(
        "purchase_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("error_event_id"),
        F.col("asof_ts").alias("error_ts"),
    ).orderBy("purchase_id")


def sql_purchase_next_error(tolerance_hours: int = 1) -> str:
    return f"""
WITH e AS ({SQL_EVENTS_US}),
errors AS (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM e WHERE event_type = 'error' GROUP BY user_id, ts
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM e WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts,
       CASE WHEN x.ts <= p.ts + INTERVAL {tolerance_hours} HOUR
            THEN x.event_id END AS error_event_id,
       CASE WHEN x.ts <= p.ts + INTERVAL {tolerance_hours} HOUR
            THEN x.ts END AS error_ts
FROM purchases p
ASOF LEFT JOIN errors x ON p.user_id = x.user_id AND p.ts <= x.ts
ORDER BY p.purchase_id
"""


def props_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return props_rollup(_events(spark, sf_dir))


def clicks_before_purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clicks_before_purchase(_events(spark, sf_dir))


# ------------------------------------------------------ active-user curves

def active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """DAU + rolling ``window_days``-day active users per day:
    (day, dau, wau). The standard engagement curve.

    A rolling COUNT DISTINCT cannot ride a window frame, so each distinct
    (day, user) pair is fanned out to the ``window_days`` window-end days it
    contributes to (one map-side explode of the ALREADY-distinct day-user
    set — days × users rows, not events rows) and re-aggregated. At 100 TB
    of raw events the expensive step is the first distinct, which is one
    shuffle of (day, user); the fan-out multiplies only that reduced set.
    """
    active = (
        events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    )
    # fan out WITH the offset so dau and wau come from ONE aggregation:
    # offset-0 rows are unique per (day, user) — the set was distinct — so
    # dau is a plain conditional count; only wau needs the distinct. Days
    # that exist only as window tails (no offset-0 activity) are exactly
    # the days the old dau⋈wau inner join dropped: filter dau > 0.
    fanned = active.select(
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
        "day",
        "user_id",
    ).select(F.date_add(F.col("day"), F.col("off")).alias("day"), "off", "user_id")
    return (
        fanned.groupBy("day")
        .agg(
            F.count(F.when(F.col("off") == 0, 1)).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .where(F.col("dau") > 0)
        .orderBy("day")
    )


def sql_active_users(window_days: int = 7) -> str:
    return f"""
WITH active AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM ({SQL_EVENTS_US}) e),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM active GROUP BY day),
fanned AS (SELECT day + CAST(t.i AS INTEGER) AS day, user_id
           FROM active, range({window_days}) t(i)),
wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM fanned GROUP BY day)
SELECT d.day, d.dau, w.wau
FROM dau d JOIN wau w USING (day)
ORDER BY day
"""


def top_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by summed value within each event type:
    (event_type, user_id, total_value, rank) — the grouped top-k shape.
    One aggregation shuffle; the rank window runs on the aggregated
    (type, user) set, partitioned by type."""
    totals = events.groupBy("event_type", "user_id").agg(
        _money(F.sum(_dec(F.col("value")))).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )


def sql_top_users_per_type(k: int = 3) -> str:
    return f"""
WITH totals AS (
  SELECT event_type, user_id,
         ROUND(CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, user_id, total_value, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id ASC) AS rank
  FROM totals
) WHERE rank <= {k}
ORDER BY event_type, rank
"""


def top_users_per_type_scalable(
    events: DataFrame, k: int = 3, n_salts: int = 32
) -> DataFrame:
    """`top_users_per_type` without the per-type rank window: identical
    output, different physical shape for the regime where one event type
    has billions of users. The window variant sorts ALL of a type's
    (user, total) rows in ONE task (Window partitionBy event_type);
    here a salted two-phase top-k distributes that sort:

      1. totals per (type, user) — the same first shuffle;
      2. per (type, salt) local top-k: sort_array(collect_list(struct))
         sliced to k — each salt's sort is k·|salt share| and runs in
         parallel across ``n_salts`` tasks per type;
      3. per type merge of n_salts·k candidates — KB-sized input.

    Ordering struct is (-total_value, user_id) so ascending array sort
    gives value-desc, user-asc — exactly the window's ORDER BY, so the
    DuckDB oracle (sql_top_users_per_type) is shared verbatim. No Window
    operator appears in the plan (pinned in tests)."""
    totals = events.groupBy("event_type", "user_id").agg(
        _money(F.sum(_dec(F.col("value")))).alias("total_value")
    )
    ordered = F.struct(
        (-F.col("total_value")).alias("nv"),
        F.col("user_id").alias("uid"),
        F.col("total_value").alias("tv"),
    )
    salted = (
        totals.withColumn("_salt", F.pmod(F.xxhash64("user_id"), F.lit(n_salts)))
        .groupBy("event_type", "_salt")
        .agg(F.slice(F.sort_array(F.collect_list(ordered)), 1, k).alias("cand"))
    )
    merged = salted.groupBy("event_type").agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("cand"))), 1, k).alias("topk")
    )
    return (
        merged.select(
            "event_type", F.posexplode("topk").alias("pos", "entry")
        )
        .select(
            "event_type",
            F.col("entry.uid").alias("user_id"),
            F.col("entry.tv").alias("total_value"),
            (F.col("pos") + 1).cast("int").alias("rank"),
        )
        .orderBy("event_type", "rank")
    )


def ohlc_daily(events: DataFrame) -> DataFrame:
    """OHLC downsampling: per (day, event_type), the open/high/low/close of
    ``value`` with (ts, event_id) as the deterministic event order — the
    standard timeseries compaction that turns an event stream into bars.

    ONE aggregation shuffle: open/close are ``min_by``/``max_by`` over the
    composite order struct (no window, no second pass), high/low plain
    min/max — all map-side-partial, so the reduce state per group is a few
    scalars at any scale."""
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


SQL_OHLC_DAILY = """
WITH e AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, ts,
         event_id, value
  FROM events),
r AS (
  SELECT day, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY day, event_type ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY day, event_type ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e)
SELECT day, event_type,
       MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM r
GROUP BY day, event_type
ORDER BY day, event_type
"""


def latest_per_user_day(events: DataFrame) -> DataFrame:
    """CDC-style compaction: the LATEST event per (user, day) by
    (ts, event_id) — the "last record wins" downsample that turns an event
    log into a daily snapshot table. One shuffle on the compaction key; at
    scale this is the pattern that keeps a 100 TB log queryable as an
    n_users×n_days table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(
        F.col("user_id"), F.date_trunc("day", F.col("ts"))
    ).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "user_id",
            "event_id",
            "event_type",
            "value",
        )
        .orderBy("day", "user_id")
    )


SQL_LATEST_PER_USER_DAY = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id, event_id,
       event_type, value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, date_trunc('day', ts)
    ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
ORDER BY day, user_id
"""


def purchase_latency_stats(events: DataFrame) -> DataFrame:
    """Funnel timing: distribution of click→purchase latency per purchase
    DAY — (day, n_purchases, n_attributed, avg_latency_s, p50_latency_s).
    Builds on the as-of join (each purchase's most recent click at-or-before
    it); the latency aggregate costs one extra day-keyed shuffle over the
    purchase-count-sized as-of output. The "how long does conversion take"
    readout every funnel report pairs with the conversion rate."""
    pc = purchases_with_last_click(events)
    lat = F.col("ts").cast("double") - F.col("click_ts").cast("double")
    return (
        pc.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            lat.alias("latency_s"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("latency_s").alias("n_attributed"),
            F.round(F.avg("latency_s"), 2).alias("avg_latency_s"),
            F.round(F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY latency_s)"), 2).alias(
                "p50_latency_s"
            ),
        )
        .orderBy("day")
    )


SQL_PURCHASE_LATENCY = f"""
WITH att AS ({SQL_PURCHASE_LAST_CLICK.replace("ORDER BY p.purchase_id", "")})
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_purchases,
       COUNT(click_ts) AS n_attributed,
       ROUND(AVG(epoch(ts) - epoch(click_ts)), 2) AS avg_latency_s,
       ROUND(percentile_cont(0.5) WITHIN GROUP (
             ORDER BY epoch(ts) - epoch(click_ts)), 2) AS p50_latency_s
FROM att
GROUP BY 1
ORDER BY 1
"""


def user_value_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-user exponentially-weighted moving average of ``value`` in event
    order — the classic time-decayed feature (recent behavior weighted
    over history) computed in CLOSED FORM: with events v_1..v_n,
    EWMA = (1−α)^(n−1)·v_1 + Σ_{i≥2} α(1−α)^(n−i)·v_i
    (pandas ewm(adjust=False) semantics). One user-keyed shuffle; the
    weights are per-row pow() expressions over row_number and the group
    size — no recursion, no UDF, no per-user iteration.

    Output: (user_id, n_events, last_value, ewma). Ties on ts break on
    event_id so both engines weight the same ordering."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wall)
    weight = F.when(
        F.col("_rn") == 1, F.pow(F.lit(1 - alpha), F.col("_n") - 1)
    ).otherwise(
        F.lit(alpha) * F.pow(F.lit(1 - alpha), F.col("_n") - F.col("_rn"))
    )
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("_rn", rn)
        .withColumn("_n", n)
        .withColumn("_w", weight)
        .groupBy("user_id")
        .agg(
            F.max("_n").cast("long").alias("n_events"),
            F.round(F.max_by("value", F.col("_rn")), 4).alias("last_value"),
            # DECIMAL sum (order-free): a user whose weighted terms are
            # short exact decimals (e.g. 0.7^3 * a 2-dp value = 5 dp
            # ending in 5) can land the TRUE sum on a 4-dp half-boundary,
            # where double association order decides the rounding — the
            # same latent class as attributed_daily_revenue's r13 flake
            F.round(
                F.sum((F.col("_w") * F.col("value")).cast("decimal(28,10)")),
                4,
            )
            .cast("double")
            .alias("ewma"),
        )
        .orderBy("user_id")
    )


def sql_user_value_ewma(alpha: float = 0.3) -> str:
    return f"""
WITH e AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM ({SQL_EVENTS_US}) ev)
SELECT user_id,
       CAST(MAX(n) AS BIGINT) AS n_events,
       ROUND(MAX_BY(value, rn), 4) AS last_value,
       CAST(ROUND(SUM(CAST(CASE WHEN rn = 1 THEN POW({1 - alpha}, n - 1)
                      ELSE {alpha} * POW({1 - alpha}, n - rn) END * value
                      AS DECIMAL(28,10))), 4) AS DOUBLE) AS ewma
FROM e
GROUP BY user_id
ORDER BY user_id
"""


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transitions between event types per user stream:
    (prev_type, next_type, n, p) where p is row-normalized over prev_type.
    The session-flow fingerprint — which steps actually follow which. One
    user-keyed window (lag) + one pair aggregation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 4).alias("p"),
    ).orderBy("prev_type", "next_type")


def sql_event_transition_matrix() -> str:
    return f"""
WITH e AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM ({SQL_EVENTS_US}) ev),
c AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM e WHERE prev_type IS NOT NULL
  GROUP BY 1, 2)
SELECT prev_type, next_type, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 4) AS p
FROM c
ORDER BY prev_type, next_type
"""


def user_interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival gap statistics in seconds: mean, std, and
    the coefficient of variation (CV ≈ 1 Poisson, >1 bursty, <1 regular)
    — the burstiness screen for bots and schedulers. Gaps are integer
    microsecond diffs (engine-exact); only the final ratios are doubles.
    Users with fewer than 3 events emit no row (std needs 2 gaps)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    gaps = events.select("user_id", gap_us.alias("gap")).where(
        F.col("gap").isNotNull()
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg(F.col("gap") / 1e6), 4).alias("mean_gap_s"),
            F.round(F.stddev_samp(F.col("gap") / 1e6), 4).alias("std_gap_s"),
            F.round(
                F.stddev_samp(F.col("gap") / 1e6) / F.avg(F.col("gap") / 1e6), 4
            ).alias("cv"),
        )
        .where(F.col("n_gaps") >= 2)
        .orderBy("user_id")
    )


def sql_user_interarrival_stats() -> str:
    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM ({SQL_EVENTS_US}) ev),
s AS (
  SELECT user_id, COUNT(*) AS n_gaps,
         ROUND(AVG(gap / 1e6), 4) AS mean_gap_s,
         ROUND(STDDEV_SAMP(gap / 1e6), 4) AS std_gap_s,
         ROUND(STDDEV_SAMP(gap / 1e6) / AVG(gap / 1e6), 4) AS cv
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id)
SELECT * FROM s WHERE n_gaps >= 2 ORDER BY user_id
"""


def dow_hour_matrix(events: DataFrame) -> DataFrame:
    """Traffic heatmap: event counts by (day-of-week, hour-of-day) with
    share of total — the load-profile rollup behind capacity planning and
    anomaly baselines. One aggregation; the share is a broadcast scalar
    division. dow: 1=Sunday..7=Saturday — Spark's DAYOFWEEK is 1-based;
    DuckDB's is 0-based (Sunday=0), so the SQL twin adds +1 to align."""
    base = events.select(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    )
    total = base.count()
    return (
        base.groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hour").cast("long").alias("hour"),
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("share"),
        )
        .orderBy("dow", "hour")
    )


def sql_dow_hour_matrix() -> str:
    return f"""
WITH e AS (SELECT CAST(DAYOFWEEK(ts) + 1 AS BIGINT) AS dow,
                  CAST(HOUR(ts) AS BIGINT) AS hour
           FROM ({SQL_EVENTS_US}) ev),
t AS (SELECT COUNT(*) AS total FROM e)
SELECT dow, hour, COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(MIN(total) AS DOUBLE), 6) AS share
FROM e CROSS JOIN t
GROUP BY dow, hour
ORDER BY dow, hour
"""


def attributed_daily_revenue(events: DataFrame) -> DataFrame:
    """Position-based (40/20/40) multi-touch attribution: every click is
    assigned to the user's NEXT purchase; within each purchase's click
    path the first click earns 0.4, the last 0.4, interior clicks split
    0.2 (single-click paths earn 1.0, two-click paths 0.5/0.5). Output:
    attributed purchase value per CLICK DAY — where the credit lands on
    the calendar, the marketing-spend view.

    Plan: one user-keyed window assigns each click its next purchase
    (first purchase at-or-after the click — the forward as-of), one
    (user, purchase) window ranks the path, and the rollup groups by
    click day. The per-click weighted term is a double (identical IEEE
    ops in both engines), but the DAY SUM runs in DECIMAL(28,8): double
    summation order varies with partial-agg scheduling, and a day whose
    true sum sits on a half-cent boundary (sf0.01 day 2024-01-28:
    1433.945) then rounds differently run-to-run — the r13 full-sweep
    flake. Decimal addition is exact and associative (order-free), both
    engines round DECIMAL half-away-from-zero identically, and the final
    cast back to double maps the same 2-dp decimal to the same bits."""
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    purchase_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    tagged = events.select(
        "user_id", "ts", "event_id", "event_type", "value"
    ).withColumn(
        "next_purchase_id",
        F.first(purchase_id, ignorenulls=True).over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ),
    ).withColumn(
        "next_purchase_value",
        F.first(purchase_val, ignorenulls=True).over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ),
    )
    clicks = tagged.where(
        (F.col("event_type") == "click") & F.col("next_purchase_id").isNotNull()
    )
    wp = Window.partitionBy("user_id", "next_purchase_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wp_all = Window.partitionBy("user_id", "next_purchase_id")
    ranked = clicks.withColumn("pos", F.row_number().over(wp)).withColumn(
        "k", F.count(F.lit(1)).over(wp_all)
    )
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("pos") == 1, F.lit(0.4) + F.when(F.col("k") == 2, 0.1).otherwise(0.0))
        .when(F.col("pos") == F.col("k"), F.lit(0.4) + F.when(F.col("k") == 2, 0.1).otherwise(0.0))
        .otherwise(F.lit(0.2) / (F.col("k") - 2))
    )
    return (
        ranked.groupBy(F.to_date("ts").alias("click_day"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(
                F.sum(
                    (weight * F.col("next_purchase_value")).cast(
                        "decimal(28,8)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("click_day")
    )


def sql_attributed_daily_revenue() -> str:
    return f"""
WITH e AS ({SQL_EVENTS_US}),
clicks AS (
  SELECT c.user_id, c.ts, c.event_id,
         p.event_id AS next_purchase_id,
         p.value AS next_purchase_value
  FROM e c
  JOIN LATERAL (
    SELECT p.event_id, p.value
    FROM e p
    WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
      AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
    ORDER BY p.ts, p.event_id
    LIMIT 1
  ) p ON TRUE
  WHERE c.event_type = 'click'),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, next_purchase_id
                            ORDER BY ts, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, next_purchase_id) AS k
  FROM clicks)
SELECT CAST(ts AS DATE) AS click_day,
       COUNT(*) AS n_clicks,
       CAST(ROUND(SUM(CAST(CASE WHEN k = 1 THEN 1.0
                      WHEN pos = 1 OR pos = k THEN 0.4 + CASE WHEN k = 2 THEN 0.1 ELSE 0.0 END
                      ELSE 0.2 / (k - 2) END * next_purchase_value AS DECIMAL(28,8))), 2) AS DOUBLE) AS attributed_value
FROM ranked
GROUP BY 1
ORDER BY 1
"""


def session_type_cooccurrence(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Which behaviors co-occur within a session: unordered event-type
    pairs counted over sessionized streams, with the share of sessions
    containing both. The cross_source_overlap plan on session grain — one
    session assignment (shared user window), one collect_set, row-local
    pair explosion; no self-join."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts"))
    is_new = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = events.withColumn("session_seq", F.sum(is_new).over(run))
    sets = (
        sess.groupBy("user_id", "session_seq")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
    )
    n_sessions = sets.count()
    pairs = F.flatten(
        F.transform(
            F.col("types"),
            lambda a, i: F.transform(
                F.slice(F.col("types"), i + 2, F.size(F.col("types"))),
                lambda b: F.struct(a.alias("type_a"), b.alias("type_b")),
            ),
        )
    )
    return (
        sets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.type_a").alias("type_a"), F.col("p.type_b").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .select(
            "type_a",
            "type_b",
            "n_sessions",
            F.round(F.col("n_sessions") / F.lit(float(n_sessions)), 4).alias(
                "session_share"
            ),
        )
        .orderBy("type_a", "type_b")
    )


def sql_session_type_cooccurrence(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS ({SQL_EVENTS_US}),
flagged AS (
  SELECT *, CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
                 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged),
sets AS (
  SELECT user_id, session_seq FROM numbered GROUP BY user_id, session_seq),
n AS (SELECT COUNT(*) AS n_sessions FROM sets),
st AS (
  SELECT DISTINCT user_id, session_seq, event_type FROM numbered)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_sessions,
       ROUND(COUNT(*) / CAST(MIN(n.n_sessions) AS DOUBLE), 4) AS session_share
FROM st a
JOIN st b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
         AND a.event_type < b.event_type
CROSS JOIN n
GROUP BY 1, 2
ORDER BY 1, 2
"""


def user_activity_streaks(events: DataFrame) -> DataFrame:
    """Longest consecutive-day activity streak per user — the engagement
    gaps-and-islands: distinct active days, anchored by (day − rank)
    which is constant within a consecutive run, so streaks fall out of
    one grouped count without a lag pass. Output: (user_id,
    n_active_days, longest_streak, n_streaks)."""
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.withColumn(
        "anchor", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.max("len").cast("long").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


SQL_USER_ACTIVITY_STREAKS = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ({SQL_EVENTS_US}) e),
anchored AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
  FROM days),
s AS (SELECT user_id, anchor, COUNT(*) AS len FROM anchored GROUP BY user_id, anchor)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       COUNT(*) AS n_streaks
FROM s
GROUP BY user_id
ORDER BY user_id
"""


def session_concurrency(
    events: DataFrame,
    gap_minutes: int = 30,
    bin_seconds: int = 3600,
) -> DataFrame:
    """For every session, the number of OTHER users' sessions that overlap
    it in time (interval-overlap self-join) — the concurrency measure
    behind load profiles and co-activity analysis.

    A naive theta self-join (``a.start <= b.end AND b.start <= a.end``)
    is a nested loop over all session pairs. This bins time into
    ``bin_seconds`` buckets, explodes each session over the buckets it
    spans, and equi-joins on the bucket — the classic binned interval
    join. Each overlapping pair is counted EXACTLY once without a
    distinct: the pair is kept only in bucket
    ``max(floor(a.start/W), floor(b.start/W))``, the first bucket both
    intervals cover (they both cover it iff they overlap, since
    ``b.start <= a.end`` implies ``floor(b.start/W) <= floor(a.end/W)``).
    Shuffle key is the bucket — time-distributed; fan-out per session is
    ``len/W`` buckets. Sessions that overlap nothing keep 0 via the left
    join back to the session table.

    Returns (user_id, session_seq, session_start, n_concurrent).
    """
    sessions = sessionize(events, gap_minutes=gap_minutes).select(
        "user_id",
        "session_seq",
        "session_start",
        F.unix_micros(F.col("session_start")).alias("_s_us"),
        F.unix_micros(F.col("session_end")).alias("_e_us"),
    )
    win_us = bin_seconds * 1_000_000
    binned = sessions.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col("_s_us") / win_us).cast("long"),
                (F.col("_e_us") / win_us).cast("long"),
            )
        ),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pair_bin = F.greatest(
        (F.col("a._s_us") / win_us).cast("long"),
        (F.col("b._s_us") / win_us).cast("long"),
    )
    overlaps = (
        a.join(
            b,
            (F.col("a._bin") == F.col("b._bin"))
            & (F.col("a.user_id") != F.col("b.user_id"))
            & (F.col("a._s_us") <= F.col("b._e_us"))
            & (F.col("b._s_us") <= F.col("a._e_us"))
            & (F.col("a._bin") == pair_bin),
        )
        .groupBy(F.col("a.user_id").alias("user_id"), F.col("a.session_seq").alias("session_seq"))
        .agg(F.count(F.lit(1)).alias("n_concurrent"))
    )
    return (
        sessions.join(overlaps, ["user_id", "session_seq"], "left")
        .select(
            "user_id",
            "session_seq",
            "session_start",
            F.coalesce(F.col("n_concurrent"), F.lit(0)).alias("n_concurrent"),
        )
        .orderBy("user_id", "session_seq")
    )


def sql_session_concurrency(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH e AS ({SQL_EVENTS_US}),
flagged AS (
  SELECT *,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
),
sessions AS (
  SELECT user_id, session_seq, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM numbered GROUP BY user_id, session_seq
)
SELECT a.user_id, a.session_seq, a.session_start,
       COALESCE(COUNT(b.user_id), 0) AS n_concurrent
FROM sessions a LEFT JOIN sessions b
  ON a.user_id <> b.user_id
 AND a.session_start <= b.session_end
 AND b.session_start <= a.session_end
GROUP BY a.user_id, a.session_seq, a.session_start
ORDER BY a.user_id, a.session_seq
"""


def debounce_events(
    events: DataFrame,
    quiet_seconds: int = 60,
    keys: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Burst collapse: keep only the FIRST event of every burst, where a
    burst is a maximal run of same-key events each within
    ``quiet_seconds`` of the previous raw event — duplicate clicks,
    retry storms, and sensor chatter collapse to one row.

    Same gap-run machinery as :func:`sessionize` (one lag + one running
    sum over a single (keys) shuffle), but keyed by (user, type) and
    keeping the first ROW of each run rather than aggregating it. The
    "first of each run" rule is deterministic and engine-portable —
    unlike true trailing-edge debounce-against-last-KEPT, which is
    inherently sequential; the run rule is what log pipelines actually
    deploy because it is a pure window expression at any scale.

    Returns the surviving events with a burst_len column (how many raw
    events the kept row absorbed, itself included).
    """
    gap_us = quiet_seconds * 1_000_000
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    is_new = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    burst = events.withColumn("_burst", F.sum(is_new).over(run))
    per_burst = Window.partitionBy(*keys, "_burst").orderBy("ts", "event_id")
    return (
        burst.withColumn("_rn", F.row_number().over(per_burst))
        .withColumn(
            "burst_len",
            F.count(F.lit(1)).over(Window.partitionBy(*keys, "_burst")),
        )
        .where(F.col("_rn") == 1)
        .select("event_id", *keys, "ts", "value", "burst_len")
        .orderBy(*keys, "ts", "event_id")
    )


def sql_debounce_events(quiet_seconds: int = 60) -> str:
    gap_us = quiet_seconds * 1_000_000
    return f"""
WITH e AS ({SQL_EVENTS_US}),
flagged AS (
  SELECT *,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
runs AS (
  SELECT *,
         CAST(SUM(is_new) OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS burst
  FROM flagged
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type, burst
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type, burst) AS burst_len
  FROM runs
)
SELECT event_id, user_id, event_type, ts, value, CAST(burst_len AS BIGINT) AS burst_len
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type, ts, event_id
"""


def user_behavior_similarity(
    events: DataFrame, n_probes: int = 8, k: int = 10
) -> DataFrame:
    """Top-k behaviorally-similar users for a deterministic probe set:
    each user is a 5-dim event-type count vector, similarity is cosine —
    the collaborative-filtering / audience-lookalike shape ("who behaves
    like this user") on the events stream. Probes are the ``n_probes``
    lowest user ids (deterministic; TakeOrdered, no global sort); the
    corpus side is scanned once map-side against the broadcast probes —
    the same probe-broadcast pattern as cosine_topk, linear at any user
    count.

    Counts are exact integers; cosine is one fixed IEEE expression over
    them (NULL-free: every user has ≥1 event); ranking ties break to the
    lower user id."""
    from pyspark.sql.window import Window

    types = ["click", "view", "purchase", "signup", "error"]
    vec = events.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"c_{t}")
            for t in types
        ]
    )
    probes = vec.orderBy("user_id").limit(n_probes)
    p = probes.select(
        F.col("user_id").alias("probe_id"),
        *[F.col(f"c_{t}").alias(f"p_{t}") for t in types],
    )
    j = vec.crossJoin(F.broadcast(p)).where(F.col("user_id") != F.col("probe_id"))
    dot = None
    na = None
    nb = None
    for t in types:
        term = F.col(f"c_{t}").cast("double") * F.col(f"p_{t}").cast("double")
        a2 = F.col(f"c_{t}").cast("double") * F.col(f"c_{t}").cast("double")
        b2 = F.col(f"p_{t}").cast("double") * F.col(f"p_{t}").cast("double")
        dot = term if dot is None else dot + term
        na = a2 if na is None else na + a2
        nb = b2 if nb is None else nb + b2
    cos = dot / (F.sqrt(na) * F.sqrt(nb))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("user_id"))
    return (
        j.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", F.col("user_id").alias("similar_user"), "cosine")
        .orderBy("probe_id", "rank")
    )


def sql_user_behavior_similarity(n_probes: int = 8, k: int = 10) -> str:
    types = ["click", "view", "purchase", "signup", "error"]
    counts = ",\n         ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c_{t}"
        for t in types
    )
    dot = " + ".join(f"CAST(v.c_{t} AS DOUBLE) * CAST(p.c_{t} AS DOUBLE)" for t in types)
    na = " + ".join(f"CAST(v.c_{t} AS DOUBLE) * CAST(v.c_{t} AS DOUBLE)" for t in types)
    nb = " + ".join(f"CAST(p.c_{t} AS DOUBLE) * CAST(p.c_{t} AS DOUBLE)" for t in types)
    return f"""
WITH vec AS (
  SELECT user_id,
         {counts}
  FROM events GROUP BY user_id),
probes AS (SELECT * FROM vec ORDER BY user_id LIMIT {n_probes}),
scored AS (
  SELECT p.user_id AS probe_id, v.user_id AS similar_user,
         ({dot}) / (SQRT({na}) * SQRT({nb})) AS cosine
  FROM vec v CROSS JOIN probes p
  WHERE v.user_id <> p.user_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                               ORDER BY cosine DESC, similar_user ASC) AS rank
  FROM scored)
SELECT probe_id, rank, similar_user, cosine
FROM ranked WHERE rank <= {k}
ORDER BY probe_id, rank
"""
