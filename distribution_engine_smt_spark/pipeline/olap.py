"""Classic OLAP surfaces over the TPC-H-ish carrier tables: scan-heavy
aggregation (Q1 shape), a multiway star join (Q5 shape), ROLLUP subtotal
grids, and a fixed-category PIVOT.

These round out the engine's reporting surface — the query shapes a BI
layer issues against the same warehouse the pipeline operators maintain.

Determinism rules (same as everywhere else in the repo): money sums
accumulate per-row DOUBLE arithmetic (fixed multiply order, identical
IEEE results in both engines) cast to DECIMAL for the exact,
summation-order-independent reduction, then round(.., 6) on the way out;
groupings order on names, never on float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..driver_queries import _t, register

_SHIP_CUTOFF = "2000-01-01"


# ---------------------------------------------------------------------------
# pricing summary: the scan-dominated flag/status aggregate (TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax)
                         AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC, l_linestatus ASC
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical scan-bound report: one pushed-down date filter, one
    (returnflag, linestatus) shuffle of map-side decimal partials over a
    handful of groups. At 100 TB this is bandwidth-limited by design —
    the plan has nothing to mis-plan, which is why Q1 is the scan
    benchmark. Money math: per-row double products in fixed order, cast
    to DECIMAL for the exact reduction."""
    li = _t(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(charge.cast("decimal(28,6)")).cast("double").alias("sum_charge"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_qty"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy(F.col("l_returnflag").asc(), F.col("l_linestatus").asc())
    )


# ---------------------------------------------------------------------------
# regional revenue: the star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register(
    "regional_revenue",
    """
    SELECT r.r_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name ASC, n.n_name ASC
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star join: facts (lineitem, orders) join on their keys; the
    dimension chain customer -> nation -> region folds into ONE broadcast
    map (collapsed before touching facts, so the fact side sees a single
    broadcast hash join, not three). At 100 TB: lineitem⋈orders is the
    one big shuffle (or zero if both are bucketed by orderkey); customer
    stays broadcast-able per-token in this engine's domain — if it ever
    isn't, it becomes the second shuffle and nation/region still ride
    the broadcast."""
    t = _t(spark, sf_dir)
    dim = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    facts = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        facts.join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue.cast("decimal(28,6)")).cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.col("r_name").asc(), F.col("n_name").asc())
    )


# ---------------------------------------------------------------------------
# ROLLUP: subtotal grid over (region, nation)
# ---------------------------------------------------------------------------
@register(
    "sales_rollup",
    """
    SELECT r.r_name, n.n_name,
           CAST(grouping(r.r_name) * 2 + grouping(n.n_name) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    ORDER BY gid ASC, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
    """,
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal grid: per-(region, nation), per-region, and grand-total
    rows from ONE pass — `GROUP BY ROLLUP`, the reporting surface for
    drill-down UIs. gid disambiguates subtotal levels from genuine NULL
    keys (both engines compute grouping() identically). At scale ROLLUP
    is an Expand (3 rows per input here) feeding the same partial-agg
    shuffle as a flat groupBy; decimal sums keep subtotals exactly equal
    to the sum of their children."""
    t = _t(spark, sf_dir)
    joined = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    gid = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("long")
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            gid.alias("gid"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(
            F.col("gid").asc(),
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# PIVOT: per-user event-type count matrix (fixed category list)
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot",
    f"""
    SELECT user_id,
           {", ".join(
               f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id
    ORDER BY user_id ASC
    """,
)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide: one row per user, one count column per event type.
    The category list is FIXED (declared, not discovered) — at scale a
    discovery pivot costs an extra distinct pass and makes the output
    schema data-dependent, so production pivots always pin the columns.
    Compiles to a single groupBy with conditional-count partials; no
    second pass, no shuffle beyond the user_id exchange."""
    ev = _t(spark, sf_dir)["events"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0)
    )
    return out.select(
        "user_id",
        *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
    ).orderBy(F.col("user_id").asc())


# ---------------------------------------------------------------------------
# moving average: 7-day trailing window over daily counts (frame aggregate)
# ---------------------------------------------------------------------------
@register(
    "daily_moving_avg",
    """
    WITH d AS (
      -- CAST to TIMESTAMP: DuckDB's date_trunc('day') yields DATE while
      -- Spark's yields timestamp — the cast keeps the twin types aligned
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(sum(v) OVER w AS DOUBLE)
                 / sum(n) OVER w, 6) AS avg_value_7d
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY event_type ASC, day ASC
    """,
)
def daily_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing average event value per type — the window-FRAME
    aggregate surface (ROWS BETWEEN), distinct from the rank windows and
    the tumbling/sliding groupBys elsewhere.

    Determinism: the frame accumulates pre-aggregated DAY rows whose
    values are DECIMAL sums — decimal addition is exact and
    order-independent, so the engine's internal frame-accumulation order
    (the thing that makes float window sums engine-specific) cannot move
    the result; the single double division happens once per output row.
    Scale: the window partitions by event_type over day-grain rows —
    thousands of rows per partition at any corpus size (days x types),
    never corpus-sized."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir)["events"]
    d = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("v"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        d.select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n_events"),
            F.round(
                F.sum("v").over(w).cast("double") / F.sum("n").over(w), 6
            ).alias("avg_value_7d"),
        )
        .orderBy(F.col("event_type").asc(), F.col("day").asc())
    )


# ---------------------------------------------------------------------------
# CUBE: full margin grid over two independent dimensions
# ---------------------------------------------------------------------------
@register(
    "segment_region_cube",
    """
    SELECT c.c_mktsegment, r.r_name,
           CAST(grouping(c.c_mktsegment) * 2 + grouping(r.r_name) AS BIGINT)
             AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (c.c_mktsegment, r.r_name)
    ORDER BY gid ASC, c_mktsegment ASC NULLS FIRST, r_name ASC NULLS FIRST
    """,
)
def segment_region_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (market segment, region) — the cross-margin
    companion to ``sales_rollup``: ROLLUP subtotals a hierarchy, CUBE
    produces EVERY margin of two independent dimensions (cell grid +
    per-segment row margins + per-region column margins + grand total)
    in one pass. This is the slice-and-dice surface a BI layer asks for
    when the dimensions don't nest.

    At scale: one Expand (4 output rows per input row here) feeding a
    single partial-agg shuffle — same cost shape as a flat groupBy times
    the grouping-set count, never one job per margin. The dimension
    chain folds into broadcasts before touching the fact table, gid
    disambiguates margin rows from genuine NULL keys, and decimal sums
    keep every margin exactly the sum of its cells."""
    t = _t(spark, sf_dir)
    joined = (
        t["orders"]
        .join(
            F.broadcast(t["customer"]),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    gid = (F.grouping("c_mktsegment") * 2 + F.grouping("r_name")).cast("long")
    return (
        joined.cube("c_mktsegment", "r_name")
        .agg(
            gid.alias("gid"),
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy(
            F.col("gid").asc(),
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("r_name").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# shipping priority: the join -> group -> top-k reporting shape (TPC-H Q3)
# ---------------------------------------------------------------------------
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-01-01"


@register(
    "shipping_priority",
    f"""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> fact join -> group
    -> top-10. The classic "urgent unshipped orders" report, completing
    the OLAP set alongside Q1 (pricing_summary) and Q5
    (regional_revenue).

    Plan shape that must survive 100x: the segment filter cuts customer
    to ~1/5 BEFORE it broadcasts; orders carries its date filter into
    the scan (pushed), joins the filtered-customer broadcast, and only
    then meets lineitem (the only corpus-sized table) — so the single
    fact-side shuffle is the l_orderkey group. The final cut is
    TakeOrderedAndProject on (revenue DESC, date, orderkey), never a
    global sort. Revenue is exact decimal; the deterministic orderkey
    tiebreak makes the top-10 stable across engines."""
    t = _t(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == _Q3_SEGMENT)
    orders = t["orders"].filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp_ntz")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# correlated scalar subquery, decorrelated: above-nation-average balances
# ---------------------------------------------------------------------------
@register(
    "above_nation_avg_balance",
    """
    SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
           round(CAST((SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                       FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey) AS DOUBLE)
                 / (SELECT count(*) FROM customer c3
                    WHERE c3.c_nationkey = c.c_nationkey), 4) AS nation_avg
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2))
          * (SELECT count(*) FROM customer c3
             WHERE c3.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2)))
             FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    ORDER BY c.c_custkey ASC
    """,
)
def above_nation_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery ("balance above my nation's average"),
    written the way every engine must EXECUTE it: decorrelated into one
    per-nation aggregate broadcast back onto the row stream. The oracle
    keeps the correlated form, so this pair checks that the manual
    decorrelation is semantically identical to the subquery.

    Determinism: the comparison is cross-multiplied into decimal space
    (balance * count > sum) instead of comparing against a float mean —
    decimal compare is exact, so no row can flip sides on a 1-ulp
    engine difference; the displayed nation_avg does one rounded float
    division per row. At scale the aggregate side is 25 rows —
    broadcast — and the row side is one scan, no self-join shuffle; a
    naive per-row subquery execution would be O(n) scans, which is the
    reference's N+1 lookup pattern (queries/accounts J6) writ large."""
    t = _t(spark, sf_dir)
    per_nation = (
        t["customer"]
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal_sum"),
            F.count("*").alias("bal_n"),
        )
    )
    return (
        t["customer"]
        .join(F.broadcast(per_nation), "c_nationkey")
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(
            F.col("c_acctbal").cast("decimal(18,2)") * F.col("bal_n")
            > F.col("bal_sum")
        )
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            F.round(
                F.col("bal_sum").cast("double") / F.col("bal_n"), 4
            ).alias("nation_avg"),
        )
        .orderBy(F.col("c_custkey").asc())
    )
