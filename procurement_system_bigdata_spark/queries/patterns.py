"""Common OLAP patterns Spark lacks as single operators, composed from
built-ins: as-of join, sessionization, top-k per group, pivot.

Each is exact, deterministic, and oracle-checked (DuckDB has native ASOF
JOIN; the Spark side composes union+window — same semantics, shuffle-keyed,
no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions import portable as P

SESSION_GAP_MIN = 30


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase event, the user's most recent signup or
    login-like marker ('view' here) at-or-before it.

    Spark has no native ASOF JOIN; the scalable composition is the
    union+window trick: tag both streams, sort per user by (ts, tag), and
    carry the last marker value forward with last_value(ignorenulls) — one
    shuffle on user_id, no per-row lookups, no UDF.  (The alternative —
    applyInPandas + pd.merge_asof per group — leaves codegen; unnecessary.)
    DuckDB oracle uses its native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    # NULL-ts guard: same divergent-NULL-ordering class as event_transitions
    ev = ev.filter(F.col("ts").isNotNull())
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pts"),
    )
    markers = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("marker_id"),
        F.unix_micros("ts").alias("mts"),
    )
    tagged = purchases.select(
        "user_id", F.col("pts").alias("ts_us"), F.lit(1).alias("is_purchase"),
        F.col("purchase_id"), F.lit(None).cast("long").alias("marker_id"),
        F.lit(None).cast("long").alias("marker_ts"),
    ).unionByName(
        markers.select(
            "user_id", F.col("mts").alias("ts_us"), F.lit(0).alias("is_purchase"),
            F.lit(None).cast("long").alias("purchase_id"),
            F.col("marker_id"), F.col("mts").alias("marker_ts"),
        )
    )
    # markers sort before purchases at the same timestamp (is_purchase asc)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_purchase", "marker_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_marker_id", F.last("marker_id", ignorenulls=True).over(w))
        .withColumn("last_marker_ts", F.last("marker_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select(
            "user_id",
            "purchase_id",
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("last_marker_id").alias("asof_view_id"),
            F.col("last_marker_ts").alias("asof_view_ts_us"),
        )
    )


Q_ASOF_JOIN_SQL = """
    WITH purchases AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pts
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    markers AS (
        -- pre-aggregate tied timestamps to MAX(marker_id): DuckDB's ASOF
        -- JOIN picks an insert-order-dependent row among equal mts, while
        -- the Spark window (orderBy ts_us, is_purchase, marker_id; last
        -- ignorenulls) deterministically carries the largest id — this
        -- makes the tie-break explicit and identical on both engines
        SELECT user_id, MAX(event_id) AS marker_id, epoch_us(ts) AS mts
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
        GROUP BY user_id, epoch_us(ts)
    )
    SELECT p.user_id, p.purchase_id, p.pts AS purchase_ts_us,
           m.marker_id AS asof_view_id, m.mts AS asof_view_ts_us
    FROM purchases p
    ASOF LEFT JOIN markers m
      ON p.user_id = m.user_id AND p.pts >= m.mts
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per-user sessions split on >30-minute gaps
    (lag + conditional cumsum — the standard window composition; the
    streaming equivalent is session_window, streaming/events.py)."""
    ev = load_table(spark, sf_dir, "events")
    # NULL-ts guard: same divergent-NULL-ordering class as event_transitions
    base = ev.filter(F.col("ts").isNotNull()).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    with_new = base.withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sess = with_new.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


Q_SESSIONIZE_SQL = f"""
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
        WHERE ts IS NOT NULL
    ),
    flagged AS (
        SELECT *,
            CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                               ORDER BY ts_us, event_id)
                      > {SESSION_GAP_MIN * 60 * 1_000_000}
                 THEN 1 ELSE 0 END AS new_session
        FROM base
    ),
    sess AS (
        SELECT *,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY 1, 2
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per (user, event_type) — the rank-and-filter
    pattern (same shape as W1/P12, generalized to k>1)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_type", F.col("rnk").cast("long").alias("rnk"),
                "event_id", "value")
    )


Q_TOPK_PER_GROUP_SQL = """
    SELECT user_id, event_type, CAST(rnk AS BIGINT) AS rnk, event_id, value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY value DESC, event_id ASC) AS rnk
        FROM events
    ) WHERE rnk <= 3
"""


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames over per-user event time: lag/lead deltas, a 3-row
    ROWS-frame moving average, and a RANGE-frame trailing-1-hour sum.

    The reference uses no frame specifications (SURVEY §2.5) — this is the
    time-series extension surface.  Frame aggregates are computed in exact
    cents (BIGINT) and divided once at the edge: windowed SUM(double) is
    engine-order-dependent (DuckDB uses segment trees, Spark per-frame
    accumulation), so only integer frame sums hash-match across engines.
    One shuffle on user_id serves every window (same partition key).
    """
    ev = load_table(spark, sf_dir, "events")
    # NULL-ts guard: same divergent-NULL-ordering class as event_transitions
    base = ev.filter(F.col("ts").isNotNull()).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
        P.spark_cents(F.col("value")).alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    rows3 = w.rowsBetween(-2, Window.currentRow)
    hour_us = 3_600_000_000
    trailing = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, Window.currentRow)
    )
    return base.select(
        "user_id",
        "ts_us",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias(
            "delta_value"
        ),
        (
            F.sum("cents").over(rows3).cast("double")
            / (F.count(F.lit(1)).over(rows3) * F.lit(100.0))
        ).alias("moving_avg3"),
        (F.sum("cents").over(trailing).cast("double") / F.lit(100.0)).alias(
            "trailing_1h_sum"
        ),
    )


Q_WINDOW_FRAMES_SQL = """
    WITH base AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, ts_us, event_id, value,
        LAG(value) OVER w AS prev_value,
        LEAD(value) OVER w AS next_value,
        value - COALESCE(LAG(value) OVER w, CAST(0.0 AS DOUBLE)) AS delta_value,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
          / (COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             * CAST(100.0 AS DOUBLE)) AS moving_avg3,
        CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts_us
                              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) / CAST(100.0 AS DOUBLE) AS trailing_1h_sum
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type value totals as columns (exact-cents).
    Spark's .pivot() with an explicit value list compiles to the same
    conditional-aggregation the oracle states explicitly."""
    ev = load_table(spark, sf_dir, "events")
    cents = P.spark_cents(F.col("value"))
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg((F.sum(cents) / 100.0))
    )
    # absent (user, type) combos surface as NULL after pivot -> 0 like the
    # oracle's COALESCE'd conditional aggregation
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0.0)).alias(f"{t}_total") for t in EVENT_TYPES],
    )


Q_PIVOT_EVENT_VALUES_SQL = f"""
    SELECT user_id,
        {", ".join(
            "CAST(COALESCE(SUM(CASE WHEN event_type = '" + t + "' "
            "THEN CAST(ROUND(value * 100) AS BIGINT) END), 0) AS BIGINT)"
            " / CAST(100.0 AS DOUBLE) AS " + t + "_total"
            for t in EVENT_TYPES
        )}
    FROM events
    GROUP BY user_id
"""


def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill (hypertable-style dense rollup): hourly per-type
    aggregates densified onto a complete hour grid, missing hours get
    n_events=0 and a LOCF (last-observation-carried-forward) value.

    The reference has no time-series densification (its only densify is the
    J3 cross-join grid, SURVEY §2.3); this is the standard TimescaleDB
    ``time_bucket_gapfill``+``locf`` shape re-expressed in Spark builtins.

    Scale shape: the fact aggregation is one partial-aggregated shuffle at
    (hour x type) cardinality; the grid is sequence()-generated from a
    1-row global bound aggregate (no driver collect) and cross-joined with
    the tiny type dim — grid size is time-bounded, independent of fact
    rows.  The LOCF window sorts grid rows only, partitioned by type.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = P.spark_cents(F.col("value"))
    hr = F.date_trunc("hour", F.col("ts"))
    # ONE fact scan: the grid bounds and the type dim both derive from the
    # (hour x type)-cardinality rollup instead of the raw fact table
    # (identical values — the min/max event hour and the type set survive
    # the rollup); the scan audit measured THREE events scans before
    hourly = ev.groupBy(hr.alias("hr"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("total_value"),
    ).localCheckpoint()
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
        ).alias("hr")
    )
    types = hourly.select("event_type").distinct()
    dense = grid.crossJoin(F.broadcast(types))
    locf_w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(hourly, ["hr", "event_type"], "left")
        .select(
            F.unix_micros(F.col("hr")).alias("hour_us"),
            "event_type",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last(F.col("total_value"), ignorenulls=True)
            .over(locf_w)
            .alias("filled_value"),
        )
    )


Q_GAP_FILL_HOURLY_SQL = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
                   AS total_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT MIN(date_trunc('hour', ts)) AS lo,
               MAX(date_trunc('hour', ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    ),
    dense AS (
        SELECT g.hr, t.event_type
        FROM grid g CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    )
    SELECT epoch_us(d.hr) AS hour_us, d.event_type,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(h.total_value IGNORE NULLS) OVER (
               PARTITION BY d.event_type ORDER BY d.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM dense d
    LEFT JOIN hourly h ON d.hr = h.hr AND d.event_type = h.event_type
"""


ROLLING_WINDOW_DAYS = 7


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding distinct-count: per active day, DAU and trailing-7-day WAU
    plus the DAU/WAU stickiness ratio — the standard engagement report.

    A rolling COUNT(DISTINCT) admits no window-function form (distinct
    does not decompose over frames), and the naive day×activity range join
    is O(days · activity).  The scalable shape is CONTRIBUTION EXPLODE:
    each distinct (user, day) activity row contributes to the 7 window
    ends it can be seen from (a bounded sequence() explode, map-side), so
    the whole report is the per-user-day dedup shuffle plus one
    (window-end)-keyed distinct aggregate — cost 7× the distinct activity
    table, independent of the window-length×days product.  The DuckDB
    oracle intentionally uses the OTHER formulation (the semantic range
    join) so the two engines cross-check the definition rather than
    sharing one algorithm.
    """
    # NULL users would count toward DAU (plain COUNT) but not WAU
    # (COUNT DISTINCT skips NULL) — drop them explicitly on both engines
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
    )
    ud = ev.distinct().localCheckpoint()  # feeds dau AND the explode
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add("d", ROLLING_WINDOW_DAYS - 1)
            )
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, dau.d == wau.day)
        .select(
            "d",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


Q_ROLLING_ACTIVE_USERS_SQL = f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        WHERE user_id IS NOT NULL
    ),
    dau AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    )
    SELECT a.d, a.dau,
           CAST((SELECT COUNT(DISTINCT b.user_id) FROM ud b
                 WHERE b.d BETWEEN a.d - {ROLLING_WINDOW_DAYS - 1} AND a.d)
                AS BIGINT) AS wau,
           CAST(a.dau AS DOUBLE)
               / (SELECT COUNT(DISTINCT b.user_id) FROM ud b
                  WHERE b.d BETWEEN a.d - {ROLLING_WINDOW_DAYS - 1} AND a.d)
               AS stickiness
    FROM dau a
"""


ANOMALY_Z = 2.0


def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-volume z-scores: exact integer daily counts, corpus
    mean/std derived from EXACT BIGINT/DECIMAL moment sums (Σn, Σn², k),
    then one identical double expression per engine (the repo's float
    discipline: no float accumulation order anywhere, sqrt is IEEE
    correctly-rounded so bit-equal cross-engine).  Flags |z| > 2.

    Scale: one (day)-keyed count aggregate, a 1-row moment reduce
    broadcast back over the day table — day-span-sized, trivially flat.
    Σn² accumulates in DECIMAL(38,0): exact for daily counts up to ~1e19,
    beyond any real per-day event volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()  # feeds the moment reduce AND the z projection
    )
    moments = daily.agg(
        F.sum("n").cast("decimal(38,0)").alias("s1"),
        # cast BEFORE the square (mirrors the oracle): a LONG×LONG product
        # would overflow silently past n ≈ 3e9 events/day
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("s2"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    # degenerate corpora are EXPLICIT on both engines (no reliance on
    # engine division semantics — Spark 4 ANSI mode throws on x/0 where
    # DuckDB returns NULL): a single active day (k=1, sample variance
    # undefined) or uniform daily counts (std=0) yield NULL z/flag rows
    z = F.when(
        F.col("std") > 0.0,
        (F.col("n").cast("double") - F.col("mean")) / F.col("std"),
    )
    return (
        daily.crossJoin(F.broadcast(moments))
        .select(
            "d",
            "n",
            (F.col("s1").cast("double") / F.col("k")).alias("mean"),
            # GREATEST clamp on the variance operand (both engines): with
            # near-uniform daily counts in the billions, s1² > 2^53 loses
            # precision and the exact-math difference can round to a small
            # NEGATIVE double — DuckDB's sqrt then RAISES (never NaN) while
            # Spark's returns NaN, which compares greater than 0.0 and
            # would mark every day anomalous
            F.when(
                F.col("k") > 1,
                F.sqrt(
                    F.greatest(
                        F.lit(0.0),
                        (
                            F.col("s2").cast("double")
                            - F.col("s1").cast("double")
                            * F.col("s1").cast("double")
                            / F.col("k")
                        )
                        / (F.col("k") - 1),
                    )
                ),
            ).alias("std"),
        )
        .select(
            "d",
            "n",
            z.alias("z_score"),
            F.when(z.isNotNull(), F.abs(z) > ANOMALY_Z).alias("is_anomaly"),
        )
    )


Q_DAILY_ANOMALIES_SQL = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    moments AS (
        SELECT CAST(SUM(n) AS DECIMAL(38,0)) AS s1,
               CAST(SUM(CAST(n AS DECIMAL(38,0)) * n) AS DECIMAL(38,0)) AS s2,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM daily
    ),
    scored AS (
        SELECT d, n,
               CAST(s1 AS DOUBLE) / k AS mean,
               CASE WHEN k > 1 THEN
                   sqrt(GREATEST(0.0,
                        (CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / k)
                        / (k - 1)))
               END AS std
        FROM daily CROSS JOIN moments
    )
    SELECT d, n,
           CASE WHEN std > 0.0
                THEN (CAST(n AS DOUBLE) - mean) / std END AS z_score,
           CASE WHEN std > 0.0
                THEN abs((CAST(n AS DOUBLE) - mean) / std) > {ANOMALY_Z}
           END AS is_anomaly
    FROM scored
"""


# Robust-outlier dial: |value - median| > MAD_K * MAD flags a row.  3 MADs
# ~ 2 sigma on a normal distribution (MAD = 0.6745 sigma) but, unlike the
# z-score in q_daily_anomalies, is insensitive to the outliers themselves —
# the estimator a pipeline wants when the tail IS the thing being hunted.
MAD_K = 3.0


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier counts per event type: how many events sit
    more than MAD_K median-absolute-deviations from their type's median
    value, plus the robust location/scale estimates themselves.

    Cross-engine exactness: values are fixed-pointed to integer micro-units
    FIRST (shared half-away primitive), so both engines take medians over
    identical BIGINTs.  Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` share the same linear-interpolation definition
    (index p*(n-1)); over integers the result is an exact x.0/x.5 double,
    deviations are exact multiples of 0.5, the MAD is an exact multiple of
    0.25, and the MAD_K comparison is therefore boundary-deterministic on
    both engines — no float accumulation anywhere.

    Scale: two keyed aggregations and two broadcast joins; the per-type
    median/MAD tables are event-type-vocabulary-sized (bounded, broadcast
    at any corpus size).  Exact percentile sorts per group — the right
    trade below ~1e9 rows/group; at 100 TB swap in approx_percentile
    (t-digest sketch, single pass, mergeable) on the SAME shape and keep
    the oracle on the exact twin.  A zero MAD (over half the group at one
    value) degenerates to flagging every off-median row — the standard MAD
    behavior, deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    # finite guard, not bare IS NOT NULL: a NaN/Inf value reaching the
    # micro-unit BIGINT cast throws under ANSI mode and crashes the DuckDB
    # mirror's CAST (the class fixed for histograms in operators/sketches)
    vals = ev.filter(P.spark_finite(F.col("value"))).select(
        "event_type",
        P.spark_half_away(F.col("value") * 1000000.0)
        .cast("long")
        .alias("value_u"),
    )
    med = vals.groupBy("event_type").agg(
        F.percentile("value_u", 0.5).alias("med_u")
    )
    # devs is a COMPUTED frame (scan ⋈ median) with two consumers (the MAD
    # aggregate and the final per-type roll-up), so the derived-corpus
    # materialization rule applies — without it each consumer re-runs the
    # events scan + fixed-point projection + broadcast join
    devs = (
        vals.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "med_u",
            F.abs(F.col("value_u").cast("double") - F.col("med_u")).alias(
                "dev_u"
            ),
        )
        .localCheckpoint()
    )
    mad = devs.groupBy("event_type").agg(
        F.percentile("dev_u", 0.5).alias("mad_u")
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.first("med_u").alias("median_micro"),
            F.first("mad_u").alias("mad_micro"),
            F.sum(
                F.when(F.col("dev_u") > MAD_K * F.col("mad_u"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max("dev_u").alias("max_abs_dev_micro"),
        )
    )


_VAL_U = P.duck_half_away("value * 1000000.0")

Q_ROBUST_OUTLIERS_SQL = f"""
    WITH vals AS (
        SELECT event_type, CAST({_VAL_U} AS BIGINT) AS value_u
        FROM events WHERE {P.duck_finite("value")}
    ),
    med AS (
        SELECT event_type, quantile_cont(value_u, 0.5) AS med_u
        FROM vals GROUP BY event_type
    ),
    devs AS (
        SELECT v.event_type, m.med_u,
               abs(CAST(v.value_u AS DOUBLE) - m.med_u) AS dev_u
        FROM vals v JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev_u, 0.5) AS mad_u
        FROM devs GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ANY_VALUE(d.med_u) AS median_micro,
           ANY_VALUE(m.mad_u) AS mad_micro,
           CAST(SUM(CASE WHEN d.dev_u > {MAD_K} * m.mad_u THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
           MAX(d.dev_u) AS max_abs_dev_micro
    FROM devs d JOIN mad m USING (event_type)
    GROUP BY d.event_type
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for every (from_type -> to_type) step, the transition count and the
    row-normalized probability in ppm — the next-event model behind
    "users who viewed then usually purchased" product analytics, and the
    missing middle between sessionize (where) and funnel_conversion
    (whether) in this family.

    Determinism: per-user ordering is (ts_us, event_id) — the same total
    tie-break every window query in this module uses — so lead() is
    reproducible on both engines.  Probabilities are fixed-pointed to ppm
    through the shared half-away primitive.

    Scale: ONE shuffle on user_id for the lead() window (per-user
    partitions, bounded by per-user event volume), then a map-side-
    combinable count over a type² grid; the per-from totals attach back as
    a type-vocabulary-sized broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = (
        # NULL-ts guard (whole-class fix, review round 5): Spark windows
        # sort NULLs FIRST, DuckDB NULLS LAST — any NULL ts silently
        # reorders one engine's stream; an unorderable event cannot take
        # part in an ordered transition, so both engines drop it
        ev.filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
            F.col("event_type").alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    # counts is type²-sized with two consumers (totals + the final attach):
    # materialize once so neither consumer re-runs the lead() window chain
    counts = (
        steps.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
        .localCheckpoint()
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_from")
    )
    prob = P.spark_half_away(
        F.col("n_transitions").cast("double")
        * 1000000.0
        / F.col("n_from").cast("double")
    ).cast("long")
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type", "n_transitions", prob.alias("prob_ppm")
        )
    )


_TRANS_PPM = P.duck_half_away(
    "CAST(n_transitions AS DOUBLE) * 1000000.0 / CAST(n_from AS DOUBLE)"
)

Q_EVENT_TRANSITIONS_SQL = f"""
    WITH steps AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS to_type
        FROM events WHERE ts IS NOT NULL
    ),
    counts AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM steps WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ),
    totals AS (
        SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS n_from
        FROM counts GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST({_TRANS_PPM} AS BIGINT) AS prob_ppm
    FROM counts c JOIN totals t ON c.from_type = t.from_type
"""


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user activity streaks over calendar days —
    number of distinct active days, number of maximal consecutive-day
    runs, and the longest run.  The engagement metric behind "7-day
    streak" product features, and the canonical islands composition:
    group key = day − row_number(day), constant exactly within a
    consecutive run.

    Scale: one user-keyed shuffle for the window; both downstream
    aggregates stay on the user key (same partitioning, no second
    exchange for the outer groupBy's map side).  NULL ts drops under the
    same divergent-NULL-ordering guard as the rest of this family.
    """
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak_days"),
        F.min("streak_start").alias("first_active_day"),
    )


Q_USER_STREAKS_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events WHERE ts IS NOT NULL
    ),
    islands AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day
               ) AS INTEGER) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
               MIN(day) AS streak_start
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak_days,
           MIN(streak_start) AS first_active_day
    FROM streaks GROUP BY user_id
"""


def q_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day) — each event's value
    weighted by the interval until the user's NEXT event that day (the
    last event of a day closes the window and carries no weight; days
    with one event have no intervals and are excluded).  The standard
    monitoring/finance aggregation where a plain AVG over-counts bursts:
    with events at 09:00 (v=1, held 8 h) and 17:00 (v=100), AVG says
    50.5 but the day's exposure was v=1 — TWAP says 1.

    Exactness: intervals are exact BIGINT microseconds, values are
    fixed-point micro-units, and the Σ(value·dt) accumulator is
    DECIMAL(38,0) on both engines — the BIGINT product of a 500-unit
    value (5e8 micro) by a near-day interval (8.6e10 µs) is ~4e19, past
    2^63, so a LONG sum would overflow silently.  One double division at
    the edge, half-away fixed-pointed.

    Scale: one user-keyed window shuffle; the (user, day) aggregate
    reuses the partitioning map-side.  NULL ts and non-finite values drop
    under the shared guards.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(
        F.col("ts").isNotNull() & P.spark_finite(F.col("value"))
    ).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        P.spark_half_away(F.col("value") * 1000000.0)
        .cast("long")
        .alias("value_u"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    with_dt = base.withColumn(
        "dt_us", F.lead("ts_us").over(w) - F.col("ts_us")
    ).filter(F.col("dt_us").isNotNull())
    agg = with_dt.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dt_us").cast("long").alias("span_us"),
        F.sum(
            F.col("value_u").cast("decimal(38,0)") * F.col("dt_us")
        ).alias("_vdt"),
    )
    twap = F.when(
        F.col("span_us") > 0,
        P.spark_half_away(
            F.col("_vdt").cast("double") / F.col("span_us").cast("double")
        ).cast("long"),
    )
    return agg.select(
        "user_id", "day", "n_intervals", "span_us",
        twap.alias("twap_micro"),
    )


_TWAP_VAL_U = P.duck_half_away("value * 1000000.0")

Q_TWAP_DAILY_SQL = f"""
    WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS ts_us,
               event_id, CAST({_TWAP_VAL_U} AS BIGINT) AS value_u
        FROM events
        WHERE ts IS NOT NULL AND {P.duck_finite("value")}
    ),
    with_dt AS (
        SELECT *, LEAD(ts_us) OVER (PARTITION BY user_id, day
                                    ORDER BY ts_us, event_id) - ts_us AS dt_us
        FROM base
    ),
    agg AS (
        SELECT user_id, day,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dt_us) AS BIGINT) AS span_us,
               SUM(CAST(value_u AS DECIMAL(38,0)) * dt_us) AS vdt
        FROM with_dt WHERE dt_us IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT user_id, day, n_intervals, span_us,
           CASE WHEN span_us > 0 THEN
               CAST({P.duck_half_away("CAST(vdt AS DOUBLE) / CAST(span_us AS DOUBLE)")}
                    AS BIGINT)
           END AS twap_micro
    FROM agg
"""
