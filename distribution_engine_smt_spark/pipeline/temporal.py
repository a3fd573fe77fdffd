"""Temporal / sketch operators over the ``events`` table: gap-based
sessionization, as-of (most-recent-prior) joins, and a KMV distinct-count
sketch.

These are the event-analytics primitives the reference's hive streams
imply but never expose as queries (its Postgres DAO answers point lookups
only): sessionization is the standard funnel/engagement building block,
the as-of join is the attribution primitive ("which click led to this
purchase"), and KMV is the mergeable distinct sketch you run when exact
COUNT(DISTINCT) over 100 TB is too expensive.

All three are deterministic and have exact DuckDB oracle twins — the
as-of join is checked against DuckDB's native ASOF JOIN, and KMV uses
md5 (the portable hash) so both engines compute the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..driver_queries import _t, register

SESSION_GAP_US = 1800 * 1_000_000  # 30 min inactivity closes a session
KMV_K = 32                         # sketch size: k-th minimum hash value
_HEX15 = 16 ** 15                  # 15 md5 hex chars = 60 bits, fits a long


# ---------------------------------------------------------------------------
# sessionize: gap-based session windows per user
# ---------------------------------------------------------------------------
def sessionize_events(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of ``sessionize`` (property tests feed it
    arbitrary event frames)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    epoch_us = F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col("ts")
    )
    gap = epoch_us - F.lag(epoch_us).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    return (
        ev.withColumn("session_id", F.sum(is_new).over(w).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .orderBy(F.col("user_id").asc(), F.col("session_id").asc())
    )


@register(
    "sessionize",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, ts,
             CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS INT)
               AS session_id
      FROM e
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS start_ts, max(ts) AS end_ts
    FROM s
    GROUP BY user_id, session_id
    ORDER BY user_id ASC, session_id ASC
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions = maximal runs of a user's events with < 30 min between
    consecutive events. One shuffle total: the lag window, the session-id
    running sum, and the per-session aggregate all share the user_id
    partitioning (Catalyst reuses the exchange; the groupBy key is a
    superset of it). Gap math is integer microseconds — no sub-second
    truncation ambiguity between engines. At 100 TB this is the canonical
    sessionization plan: shuffle by user once, everything else is local.
    """
    return sessionize_events(_t(spark, sf_dir)["events"])


# ---------------------------------------------------------------------------
# as-of join: each purchase matched to the user's latest click at-or-before it
# ---------------------------------------------------------------------------
@register(
    "asof_purchase_attribution",
    """
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id ASC
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union-and-running-max trick: tag clicks 0 and
    purchases 1, sort by (ts, tag) within user, and carry the running max
    click timestamp forward — each purchase then reads the latest click at
    or before it (tag 0 < 1 makes an equal-timestamp click visible,
    matching ASOF's >= bound).

    Spark has no ASOF JOIN; the naive alternative (range join) is a
    quadratic nested-loop. This formulation is ONE shuffle keyed by
    user_id and a linear window pass — the standard scale plan for
    point-in-time joins (backtesting, attribution, slowly-changing
    dimensions). The oracle is DuckDB's native ASOF JOIN.
    """
    return asof_attribution(_t(spark, sf_dir)["events"])


def asof_attribution(ev: DataFrame) -> DataFrame:
    """DataFrame-level core of ``asof_purchase_attribution``."""
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.lit(0).alias("tag")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("tag")
    )
    both = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("tag").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(F.when(F.col("tag") == 0, F.col("ts"))).over(w)
    return (
        both.withColumn("last_click_ts", last_click)
        .filter(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_click_ts",
            F.timestamp_diff("MICROSECOND", F.col("last_click_ts"), F.col("ts"))
            .cast("long")
            .alias("gap_us"),
        )
        .orderBy(F.col("event_id").asc())
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch: k-th minimum md5 estimates COUNT(DISTINCT)
# ---------------------------------------------------------------------------
@register(
    "kmv_distinct",
    f"""
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events
    ),
    h AS (
      SELECT event_type,
             list_reduce(list_transform(generate_series(1, 15),
               i -> CAST(strpos('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                    AS BIGINT)),
               (a, x) -> a * 16 + x) AS hv
      FROM d
    ),
    r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
      FROM h
    ),
    ex AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT r.event_type, hv AS kth_hash,
           CASE WHEN n_exact < {KMV_K} THEN CAST(n_exact AS DOUBLE)
                ELSE round(({KMV_K} - 1) / (CAST(hv AS DOUBLE) / {_HEX15}.0), 4)
           END AS est_distinct,
           n_exact
    FROM r JOIN ex ON r.event_type = ex.event_type
    WHERE rn = least({KMV_K}, n_exact)
    ORDER BY r.event_type ASC
    """,
)
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct sketch: hash each value with md5 (the
    cross-engine hash), keep the k smallest per group; the k-th smallest,
    scaled to [0,1), estimates distinct count as (k-1)/h_k.

    Why it matters at 100 TB: the per-group state is k longs regardless of
    cardinality, the sketch is mergeable across partitions (min-merge), and
    unlike HyperLogLog the identical sketch is computable in any engine
    that has md5 — which is exactly what the oracle checks. The exact
    count rides along for the error to be visible. The plan is a distinct
    (one shuffle, map-side partial), a window per group, and a broadcast
    join of two tiny per-group frames.
    """
    ev = _t(spark, sf_dir)["events"]
    d = ev.select("event_type", "user_id").distinct()
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("event_type").orderBy(F.col("hv").asc())
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("n_exact")
    )
    # KMV small-cardinality fallback: with fewer than k distinct values the
    # sketch holds ALL of them and reports the exact count (the standard
    # KMV contract) — the k-th row simply doesn't exist, so the group keys
    # on its LAST row instead. Keeps tiny corpora (sf0.001) and sparse
    # groups first-class instead of silently dropping them.
    kth = (
        d.withColumn("hv", hv)
        .withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(exact), "event_type")
        .filter(F.col("rn") == F.least(F.lit(KMV_K), F.col("n_exact")))
    )
    return (
        kth.select(
            "event_type",
            F.col("hv").alias("kth_hash"),
            F.when(
                F.col("n_exact") < KMV_K, F.col("n_exact").cast("double")
            )
            .otherwise(
                F.round(
                    F.lit(float(KMV_K - 1))
                    / (F.col("hv").cast("double") / F.lit(float(_HEX15))),
                    4,
                )
            )
            .alias("est_distinct"),
            "n_exact",
        )
        .orderBy(F.col("event_type").asc())
    )


# ---------------------------------------------------------------------------
# tumbling windows: the Structured Streaming windowed-agg shape, batch twin
# ---------------------------------------------------------------------------
@register(
    "tumbling_event_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start ASC, event_type ASC
    """,
)
def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aligned 1-hour tumbling counts/sums per event type — the batch
    twin of ``streaming.windows.run_tumbling_stream`` (same column logic,
    shared via ``tumbling_counts``). One shuffle keyed by (window,
    event_type) with map-side partial aggregation; decimal-space sums make
    the result bit-identical to the DuckDB oracle."""
    from ..streaming.windows import tumbling_counts

    ev = _t(spark, sf_dir)["events"]
    return tumbling_counts(ev).orderBy(
        F.col("window_start").asc(), F.col("event_type").asc()
    )


# ---------------------------------------------------------------------------
# range join: all (error, signup) event pairs within a +/-60 s window
# ---------------------------------------------------------------------------
RANGE_WINDOW_US = 60 * 1_000_000


@register(
    "range_join_events",
    f"""
    SELECT e.event_id AS error_id, s.event_id AS signup_id,
           epoch_us(s.ts) - epoch_us(e.ts) AS dt_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON abs(epoch_us(s.ts) - epoch_us(e.ts)) <= {RANGE_WINDOW_US}
    ORDER BY error_id ASC, signup_id ASC
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join via time-bucketing: Spark would execute the
    raw |t1 - t2| <= w predicate as a broadcast nested-loop (quadratic);
    instead both sides are binned at the window width, the error side fans
    out to its 3 adjacent bins, and the join becomes an EQUI-join on bin
    followed by the exact residual filter. Each signup lives in exactly one
    bin, so no pair can match twice — no distinct needed.

    At 100 TB this is the standard plan for temporal correlation joins:
    shuffle keyed by bin (add a salt sub-key if one hot minute dominates),
    3x fan-out on one side only, candidate set bounded by bin co-residents
    instead of the full cross product.
    """
    ev = _t(spark, sf_dir)["events"]
    epoch_us = F.timestamp_diff(
        "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), epoch_us.alias("e_us")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        epoch_us.alias("s_us"),
        F.floor(epoch_us / RANGE_WINDOW_US).alias("bin"),
    )
    e_bin = F.floor(F.col("e_us") / RANGE_WINDOW_US)
    err_bins = errors.withColumn(
        "bin", F.explode(F.array(e_bin - 1, e_bin, e_bin + 1))
    )
    dt = F.col("s_us") - F.col("e_us")
    return (
        err_bins.join(signups, "bin")
        .filter(F.abs(dt) <= RANGE_WINDOW_US)
        .select("error_id", "signup_id", dt.cast("long").alias("dt_us"))
        .orderBy(F.col("error_id").asc(), F.col("signup_id").asc())
    )


# ---------------------------------------------------------------------------
# rolling z-score anomaly detection over the event stream
# ---------------------------------------------------------------------------
_ZS_WIN = 6  # trailing window: up to 6 PRIOR events per user
_ZS_MIN = 3  # minimum history before a z-score is emitted

_ZS_LAGS = ", ".join(
    f"lag(value, {i}) OVER w AS l{i}" for i in range(1, _ZS_WIN + 1)
)
_ZS_ARR = "[" + ", ".join(f"l{i}" for i in range(_ZS_WIN, 0, -1)) + "]"


@register(
    "event_zscore_anomaly",
    f"""
    WITH lagged AS (
      SELECT event_id, user_id, value, {_ZS_LAGS}
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    arrd AS (
      SELECT event_id, user_id, value,
             list_filter({_ZS_ARR}, x -> x IS NOT NULL) AS arr
      FROM lagged
    ),
    stats AS (
      SELECT event_id, user_id, value, len(arr) AS n,
             CASE WHEN len(arr) >= {_ZS_MIN}
                  THEN list_reduce(arr, (a, b) -> a + b) END AS s,
             CASE WHEN len(arr) >= {_ZS_MIN}
                  THEN list_reduce(list_transform(arr, x -> x * x),
                                   (a, b) -> a + b) END AS s2
      FROM arrd
    )
    SELECT event_id, user_id, n,
           round((value - s / n) / sqrt((s2 - s * s / n) / (n - 1)), 6) AS z,
           abs((value - s / n) / sqrt((s2 - s * s / n) / (n - 1))) > 2.0
               AS is_anomaly
    FROM stats
    WHERE n >= {_ZS_MIN} AND (s2 - s * s / n) / (n - 1) > 0.0
    ORDER BY event_id ASC
    """,
)
def event_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score: each event scored against the mean/stddev
    of its previous <= 6 events; |z| > 2 flags the anomaly.

    Engine-parity design: windowed SUM/STDDEV aggregates accumulate in an
    engine-specific order (Spark re-folds bounded frames, DuckDB uses
    segment trees), so their float results are not reproducible across
    engines. Instead the trailing frame is materialized EXPLICITLY as
    lag(1..6) columns — pure row movement, no arithmetic — and mean/var
    come from fixed-order left folds over that array, bit-identical in
    both engines (the sample-variance identity (s2 - s^2/n)/(n-1) in
    matching association order). One shuffle on user_id; the lag frame is
    O(window) columns, independent of partition size — the plan a
    1000-executor run wants for billions of users.
    """
    t = _t(spark, sf_dir)
    ev = t["events"]
    # one-parse SQL text (r13): same trees as the old Column-DSL chain.
    # lag() needs the window; it stays a windowed selectExpr over the
    # same (user_id; ts, event_id) frame.
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    lagged = ev.select(
        "event_id",
        "user_id",
        "value",
        *[F.lag("value", i).over(w).alias(f"l{i}") for i in range(1, _ZS_WIN + 1)],
    )
    arr_sql = (
        "filter(array("
        + ", ".join(f"l{i}" for i in range(_ZS_WIN, 0, -1))
        + "), x -> x IS NOT NULL)"
    )
    arrd = lagged.selectExpr(
        "event_id", "user_id", "value", arr_sql + " AS arr"
    )
    fold = lambda c: f"aggregate({c}, 0.0D, (a, b) -> a + b)"  # noqa: E731
    # 0.0 + x == x exactly for x > 0, so the init-less DuckDB fold matches
    stats = arrd.selectExpr(
        "event_id",
        "user_id",
        "value",
        "size(arr) AS n",
        f"CASE WHEN size(arr) >= {_ZS_MIN} THEN {fold('arr')} END AS s",
        f"CASE WHEN size(arr) >= {_ZS_MIN} "
        f"THEN {fold('transform(arr, x -> x * x)')} END AS s2",
    )
    var = "((s2 - s * s / n) / (n - 1))"
    z = f"((value - s / n) / sqrt{var})"
    return (
        stats.where(F.expr(f"n >= {_ZS_MIN} AND {var} > 0.0D"))
        .selectExpr(
            "event_id",
            "user_id",
            "n",
            f"round({z}, 6) AS z",
            f"(abs({z}) > 2.0D) AS is_anomaly",
        )
        .orderBy(F.col("event_id").asc())
    )


# ---------------------------------------------------------------------------
# sliding windows: overlapping 1 h windows on a 30 min hop, batch twin
# ---------------------------------------------------------------------------
@register(
    "sliding_event_counts",
    """
    SELECT ws AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts)
               - k * INTERVAL '30 minutes' AS ws,
             event_type, value
      FROM events, unnest([0, 1]) t(k)
    )
    GROUP BY 1, 2
    ORDER BY window_start ASC, event_type ASC
    """,
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows on a 30-minute hop (each event counts in
    exactly 2 windows) — the moving-average / rolling-rate shape; batch
    twin of ``streaming.windows.run_sliding_stream`` (column logic shared
    via ``sliding_counts``). Spark's F.window handles the 2x fan-out
    internally; the oracle reconstructs it as an explicit unnest over the
    two candidate 30-min grid starts. One (window, event_type) shuffle
    with map-side partials; decimal sums keep it bit-identical."""
    from ..streaming.windows import sliding_counts

    ev = _t(spark, sf_dir)["events"]
    return sliding_counts(ev).orderBy(
        F.col("window_start").asc(), F.col("event_type").asc()
    )


# ---------------------------------------------------------------------------
# funnel analysis: ordered view -> click -> purchase conversion per user
# ---------------------------------------------------------------------------
@register(
    "event_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step_no, 'view' AS step,
             CAST(count(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
    ) ORDER BY step_no ASC
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase (strict event-time ordering, not mere presence) —
    the conversion table every product-analytics engine ships.

    Scale: each stage is one conditional-min aggregation keyed by
    user_id; AQE reuses the user_id partitioning across the three
    stages, so the funnel costs one logical shuffle plus two co-located
    joins. min() is order-independent — no window, no sort."""
    ev = _t(spark, sf_dir)["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    spark_counts = [
        v.agg(F.count("*").alias("n")).select(
            F.lit(1).alias("step_no"), F.lit("view").alias("step"),
            F.col("n").cast("long").alias("n_users"),
        ),
        c.agg(F.count("*").alias("n")).select(
            F.lit(2).alias("step_no"), F.lit("view>click").alias("step"),
            F.col("n").cast("long").alias("n_users"),
        ),
        p.agg(F.count("*").alias("n")).select(
            F.lit(3).alias("step_no"), F.lit("view>click>purchase").alias("step"),
            F.col("n").cast("long").alias("n_users"),
        ),
    ]
    out = spark_counts[0]
    for f in spark_counts[1:]:
        out = out.unionByName(f)
    return out.orderBy(F.col("step_no").asc())
