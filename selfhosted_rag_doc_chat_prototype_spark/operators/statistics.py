"""Exact statistical monitoring over the event stream.

Extends the reference's analytics corpus (``docs/analytics.md`` A1-A10:
time-bucketed throughput + latency distributions) with the statistical
process-control and exact-quantile reports an operations team layers on
the same tables: autocorrelation of the daily series, tabular CUSUM
change detection, exact rank-based latency percentiles, and
median-absolute-deviation robust anomaly flags.

Cross-engine exactness strategy (docs/ROUNDING.md): every statistic is
computed in EXACT INTEGER UNITS -- deviations from the mean are scaled
by the day count so ``N*x_t - S`` is a BIGINT, CUSUM uses the
``running_sum - min(0, running_min(running_sum))`` closed form (all
integer adds/mins, no recursive float state), percentile ranks are
``ceil(p*n/100)`` via integer division, and the MAD flag compares
``|x-med| * 10000 > 44478 * mad`` (3 * 1.4826 scale in fixed-point)
instead of multiplying by a float constant. Ratios of identical
integers (ACF, robust z) are emitted as unrounded doubles -- bitwise
identical across engines.

Scale notes (100 TB): every query's corpus-sized step is ONE
partial-aggregated groupBy collapsing events to day or event-type
grain; the windows/self-joins that follow run over CALENDAR- or
TYPE-cardinality rows, so the single-partition windows are bounded by
days-of-history, not data volume (the same argument as
``daily_anomaly_zscore`` / ``ewma_control_chart`` in analytics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table
from .rank import distributed_rank

# ACF lags reported; 14 days spans two weekly cycles of the synthetic
# stream and stays far under the densified-calendar cardinality.
ACF_MAX_LAG = 14
# CUSUM baseline length (days) and the k/h parameters in exact integer
# units: k = mu0/20 (a 5% drift allowance), alarm at C > 7*M/2 (i.e.
# h = 3.5 sigma-ish in units of the baseline mean).
CUSUM_BASELINE_DAYS = 7
PCTS = (50, 90, 99)
# 3 * 1.4826 (the normal-consistency MAD scale) in 1e-4 fixed point.
MAD_FLAG_NUM = 44478
MAD_FLAG_DEN = 10000


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified (day, n_events) series: zero-filled calendar between
    min and max day, NULL-ts rows carry no day and drop out (the same
    densification contract as daily_anomaly_zscore)."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = counts.filter(F.col("d").isNotNull()).agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    return days.join(counts, "d", "left").select(
        "d", F.coalesce("n", F.lit(0)).cast("long").alias("n_events")
    )


_DAILY_SQL = """
        counts AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY CAST(ts AS DATE)
        ),
        bounds AS (
            SELECT min(d) AS lo, max(d) AS hi FROM counts
            WHERE d IS NOT NULL
        ),
        days AS (
            SELECT unnest(generate_series(lo, hi,
                          INTERVAL 1 DAY))::DATE AS d
            FROM bounds
        ),
        daily AS (
            SELECT days.d AS d,
                   CAST(coalesce(counts.n, 0) AS BIGINT) AS n_events
            FROM days LEFT JOIN counts ON days.d = counts.d
        )
"""


def acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUTOCORRELATION of the daily event-count series at lags
    1..ACF_MAX_LAG -- the seasonality detector behind 'is traffic
    weekly-periodic' (a spike at lag 7 is the weekly cycle
    ``seasonal_decompose_daily`` then extracts).

    Exact integer form: with N days and S = sum(x), the centered
    deviation N*x_t - S is a BIGINT, and the N^2 denominators of the
    classic estimator cancel in the ratio, so
    ``acf = sum(dev_t * dev_{t-lag}) / sum(dev_t^2)`` is a ratio of
    two exactly-computed BIGINTs (headroom: |dev| <= N*max(x), so the
    products stay under 2^63 up to ~3e9 daily events over a 10-year
    calendar; beyond that swap the two sums to DECIMAL(38,0)).

    Scale shape: one corpus shuffle to day grain; the lag self-join
    and both sums run over calendar x ACF_MAX_LAG rows."""
    daily = _daily_counts(spark, sf_dir)
    stats = daily.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_events").alias("s")
    )
    rn_w = Window.orderBy("d")
    dev = (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.row_number().over(rn_w).alias("rn"),
            (F.col("nd") * F.col("n_events") - F.col("s")).alias("dev"),
        )
    )
    den = dev.agg(F.sum(F.col("dev") * F.col("dev")).alias("acf_den"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = dev.alias("a")
    b = dev.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("a.rn") == F.col("b.rn") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.dev") * F.col("b.dev")).alias("acf_num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag", "n_pairs", "acf_num", "acf_den",
            (F.col("acf_num").cast("double")
             / F.col("acf_den").cast("double")).alias("acf"),
        )
    )


def _acf_oracle_sql() -> str:
    return f"""
        WITH {_DAILY_SQL},
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_events) AS BIGINT) AS s
            FROM daily
        ),
        dev AS (
            SELECT row_number() OVER (ORDER BY d) AS rn,
                   nd * n_events - s AS dev
            FROM daily, stats
        ),
        den AS (
            SELECT CAST(sum(dev * dev) AS BIGINT) AS acf_den FROM dev
        ),
        lags AS (
            SELECT unnest(generate_series(1, {ACF_MAX_LAG}))::INTEGER
                   AS lag
        )
        SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(a.dev * b.dev) AS BIGINT) AS acf_num,
               (SELECT acf_den FROM den) AS acf_den,
               CAST(sum(a.dev * b.dev) AS DOUBLE)
                   / CAST((SELECT acf_den FROM den) AS DOUBLE) AS acf
        FROM dev a JOIN lags ON true
        JOIN dev b ON a.rn = b.rn + lag
        GROUP BY lag
    """


def cusum_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABULAR CUSUM change detection on daily event counts: the chart
    that catches a SUSTAINED small shift the per-day z-score misses.
    Baseline mu0 = mean of the first CUSUM_BASELINE_DAYS days; both
    one-sided sums use allowance k = mu0/20 and alarm at C > 3.5*mu0.

    EXACT INTEGER FORM: everything is scaled by the baseline length B,
    so mu0 never becomes a fraction -- with M = sum of the first B
    days, the high-side increment is ``s_t = B*x_t - M - K_u``
    (K_u = M div 20, truncating division in both engines) and the
    recursive ``C_t = max(0, C_{t-1} + s_t)`` is replaced by its
    closed form ``C_t = S_t - min(0, running_min(S_t))`` over the
    running sum S -- two integer window passes, no recursive state, no
    float drift. Alarm threshold H_u = 7*M div 2 (= 3.5*mu0 in the
    same B-scaled units).

    Scale shape: one corpus shuffle to day grain; the two window
    passes run over the calendar."""
    daily = _daily_counts(spark, sf_dir)
    rn_w = Window.orderBy("d")
    seq = daily.select(
        "d", "n_events", F.row_number().over(rn_w).alias("rn")
    )
    base = seq.filter(F.col("rn") <= CUSUM_BASELINE_DAYS).agg(
        F.sum("n_events").alias("m")
    )
    b = F.lit(CUSUM_BASELINE_DAYS).cast("long")
    ku = F.expr("m div 20")
    hu = F.expr("(7 * m) div 2")
    scored = (
        seq.filter(F.col("rn") > CUSUM_BASELINE_DAYS)
        .crossJoin(F.broadcast(base))
        .select(
            "d", "n_events", "rn",
            (b * F.col("n_events") - F.col("m") - ku).alias("s_hi"),
            (F.col("m") - ku - b * F.col("n_events")).alias("s_lo"),
            hu.alias("h_u"),
        )
    )
    run_w = (
        Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = scored.select(
        "d", "n_events", "h_u", "rn",
        F.sum("s_hi").over(run_w).alias("ss_hi"),
        F.sum("s_lo").over(run_w).alias("ss_lo"),
    )
    cusum = summed.select(
        "d", "n_events", "h_u",
        (F.col("ss_hi")
         - F.least(F.lit(0).cast("long"), F.min("ss_hi").over(run_w))
         ).alias("cusum_hi_u"),
        (F.col("ss_lo")
         - F.least(F.lit(0).cast("long"), F.min("ss_lo").over(run_w))
         ).alias("cusum_lo_u"),
    )
    return cusum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events", "cusum_hi_u", "cusum_lo_u",
        (F.col("cusum_hi_u") > F.col("h_u")).alias("alarm_hi"),
        (F.col("cusum_lo_u") > F.col("h_u")).alias("alarm_lo"),
    )


def _cusum_oracle_sql() -> str:
    return f"""
        WITH {_DAILY_SQL},
        seq AS (
            SELECT d, n_events,
                   row_number() OVER (ORDER BY d) AS rn
            FROM daily
        ),
        base AS (
            SELECT CAST(sum(n_events) AS BIGINT) AS m FROM seq
            WHERE rn <= {CUSUM_BASELINE_DAYS}
        ),
        scored AS (
            SELECT d, n_events, rn,
                   {CUSUM_BASELINE_DAYS} * n_events - m - (m // 20)
                       AS s_hi,
                   m - (m // 20) - {CUSUM_BASELINE_DAYS} * n_events
                       AS s_lo,
                   (7 * m) // 2 AS h_u
            FROM seq, base WHERE rn > {CUSUM_BASELINE_DAYS}
        ),
        summed AS (
            SELECT d, n_events, h_u,
                   sum(s_hi) OVER w AS ss_hi,
                   sum(s_lo) OVER w AS ss_lo
            FROM scored
            WINDOW w AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        cusum AS (
            SELECT d, n_events, h_u,
                   ss_hi - least(CAST(0 AS BIGINT), min(ss_hi) OVER w)
                       AS cusum_hi_u,
                   ss_lo - least(CAST(0 AS BIGINT), min(ss_lo) OVER w)
                       AS cusum_lo_u
            FROM summed
            WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT strftime(d, '%Y-%m-%d') AS day, n_events,
               cusum_hi_u, cusum_lo_u,
               cusum_hi_u > h_u AS alarm_hi,
               cusum_lo_u > h_u AS alarm_lo
        FROM cusum
    """


def latency_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type value percentiles (p50/p90/p99) by the
    percentile_disc rank rule: the reported value is the k-th smallest
    with ``k = ceil(p*n/100)`` -- integer division, no interpolation,
    no float rank, so both engines pick the identical element (the
    reference's latency-distribution report, docs/analytics.md A2,
    upgraded from approx sketches to the exact contract). NULL values
    are excluded (percentile of nothing is no row); a NULL event_type
    is its own group.

    Scale shape (r8): the old shape partitioned the rank window by
    event_type alone -- ~5 partitions, so each reducer sorted a
    per-type FACT-scale run (the round-7 verdict's scale-killer
    list). Now ranks come from the shared two-phase
    :func:`distributed_rank` (quantile-bucketed, offsets broadcast),
    so the sort spreads across buckets x types; ``tie_split=False``
    because value_u is micro-quantized (near-unique). The three
    target ranks still resolve row-local via an array filter -- no
    second pass, no explode-then-filter row multiplication."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vu = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    ranked = distributed_rank(
        ev.select("event_type", "event_id", vu.alias("value_u")),
        [(F.col("value_u"), True), (F.col("event_id"), True)],
        part_cols=["event_type"], rn_col="rn", n_col="n",
        tie_split=False,
    ).drop("event_id")
    targets = F.array(*[
        F.struct(
            F.lit(p).cast("int").alias("p"),
            F.expr(f"({p} * n + 99) div 100").alias("k"),
        )
        for p in PCTS
    ])
    hits = ranked.select(
        "event_type", "value_u", "n",
        F.filter(targets, lambda t: t["k"] == F.col("rn")).alias("ts"),
    ).filter(F.size("ts") > 0)
    return (
        hits.select(
            "event_type", "n", "value_u",
            F.explode("ts").alias("t"),
        )
        .select(
            "event_type", F.col("t.p").alias("p"), "n", "value_u",
            (F.col("value_u").cast("double") / 1e6).alias("value"),
        )
    )


def _pct_oracle_sql() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT event_type, CAST({p} AS INTEGER) AS p, n,
               value_u,
               CAST(value_u AS DOUBLE) / 1e6 AS value
        FROM ranked WHERE rn = ({p} * n + 99) // 100"""
        for p in PCTS
    )
    return f"""
        WITH ranked AS (
            SELECT event_type,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                       AS value_u,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT) ASC, event_id ASC
                   ) AS rn,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM events WHERE value IS NOT NULL
        )
{legs}
    """


def mad_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN-ABSOLUTE-DEVIATION anomaly flags on the daily series --
    the robust twin of ``daily_anomaly_zscore``: a handful of outage
    days cannot drag the baseline the way they drag a mean/stddev.
    med = lower median (rank ceil(n/2)); mad = lower median of
    |x - med|; a day flags when ``|x - med| * 10000 > 44478 * mad``
    (i.e. |x-med| > 3 * 1.4826 * mad in exact fixed-point -- when the
    series is half-constant and mad = 0, ANY deviation flags, which is
    the correct degenerate contract).

    Scale shape: one corpus shuffle to day grain; the two exact-median
    rank passes and the flag projection run over the calendar."""
    daily = _daily_counts(spark, sf_dir)
    med_w = Window.orderBy(F.col("n_events").asc(), F.col("d").asc())
    n_w = Window.partitionBy()
    med = (
        daily.select(
            "n_events",
            F.row_number().over(med_w).alias("rn"),
            F.count(F.lit(1)).over(n_w).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("n_events").alias("med"))
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "d", "n_events", "med",
        F.abs(F.col("n_events") - F.col("med")).alias("abs_dev"),
    )
    mad_w = Window.orderBy(F.col("abs_dev").asc(), F.col("d").asc())
    mad = (
        dev.select(
            "abs_dev",
            F.row_number().over(mad_w).alias("rn"),
            F.count(F.lit(1)).over(n_w).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(F.col("abs_dev").alias("mad"))
    )
    return dev.crossJoin(F.broadcast(mad)).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_events", "med", "abs_dev", "mad",
        (F.col("abs_dev") * MAD_FLAG_DEN
         > F.lit(MAD_FLAG_NUM) * F.col("mad")).alias("is_anomaly"),
    )


def _mad_oracle_sql() -> str:
    return f"""
        WITH {_DAILY_SQL},
        med AS (
            SELECT n_events AS med FROM (
                SELECT n_events,
                       row_number() OVER (ORDER BY n_events ASC, d ASC)
                           AS rn,
                       count(*) OVER () AS n
                FROM daily
            ) WHERE rn = (n + 1) // 2
        ),
        dev AS (
            SELECT d, n_events, med,
                   abs(n_events - med) AS abs_dev
            FROM daily, med
        ),
        mad AS (
            SELECT abs_dev AS mad FROM (
                SELECT abs_dev,
                       row_number() OVER (ORDER BY abs_dev ASC, d ASC)
                           AS rn,
                       count(*) OVER () AS n
                FROM dev
            ) WHERE rn = (n + 1) // 2
        )
        SELECT strftime(d, '%Y-%m-%d') AS day, n_events, med, abs_dev,
               mad,
               abs_dev * {MAD_FLAG_DEN} > {MAD_FLAG_NUM} * mad
                   AS is_anomaly
        FROM dev, mad
    """


# watermark candidates judged by the lateness report (microseconds)
LATENESS_WATERMARKS = (
    ("1m", 60_000_000),
    ("1h", 3_600_000_000),
    ("6h", 21_600_000_000),
    ("24h", 86_400_000_000),
)


def arrival_lateness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME DISORDER accounting -- the report that picks a
    streaming watermark with data instead of folklore: per user stream
    (arrival order = event_id, the ingest sequence), each event's
    lateness is how far its event time sits behind the stream's
    running event-time max; for each candidate watermark the report
    counts the events a `withWatermark` of that delay would drop.
    NULL-ts/user rows carry no event time or stream and are excluded
    (both engines).

    Exactness: lateness is an integer microsecond difference; the
    candidate verdicts are conditional integer counts; late_frac is a
    ratio of identical integers.

    Scale shape: ONE shuffle on user_id, one ordered running-max pass
    per user, then a single map-side conditional aggregation emitting
    one row per candidate via an array unpivot -- the corpus is
    scanned once, never once-per-candidate."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        (F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
        .alias("lateness_us")
    )
    agg = late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.sum((F.col("lateness_us") > us).cast("long"))
            .alias(f"late_{name}")
            for name, us in LATENESS_WATERMARKS
        ],
    )
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("watermark"),
            F.lit(us).cast("long").alias("watermark_us"),
            F.col(f"late_{name}").alias("n_late"),
        )
        for name, us in LATENESS_WATERMARKS
    ])
    return (
        agg.select("n_events", F.explode(rows).alias("r"))
        .select(
            F.col("r.watermark").alias("watermark"),
            F.col("r.watermark_us").alias("watermark_us"),
            "n_events",
            F.col("r.n_late").alias("n_late"),
            (F.col("r.n_late").cast("double")
             / F.col("n_events").cast("double")).alias("late_frac"),
        )
    )


def _lateness_oracle_sql() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT '{name}' AS watermark,
               CAST({us} AS BIGINT) AS watermark_us, n_events,
               late_{name} AS n_late,
               CAST(late_{name} AS DOUBLE) / CAST(n_events AS DOUBLE)
                   AS late_frac
        FROM agg"""
        for name, us in LATENESS_WATERMARKS
    )
    conds = ",\n                   ".join(
        f"""CAST(sum(CASE WHEN lateness_us > {us}
                        THEN 1 ELSE 0 END) AS BIGINT) AS late_{name}"""
        for name, us in LATENESS_WATERMARKS
    )
    return f"""
        WITH late AS (
            SELECT max(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - epoch_us(ts) AS lateness_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_events,
                   {conds}
            FROM late
        )
{legs}
    """


def gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of per-user event volume -- the inequality
    dial behind 'is our traffic a few whales or a broad base' (and,
    on a training corpus, 'is one crawler dominating the data'). Uses
    the exact rank formula over the ASCENDING-sorted user counts:
    ``G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))`` --
    numerator and denominator are exactly-computed BIGINTs (headroom:
    rank * count summed over users needs n * n_events * max_count
    under 2^63 -- fine to ~1e6 users at 1e6 events each; beyond,
    DECIMAL(38,0)), emitted alongside the double ratio.

    Scale shape (r8): the corpus collapses to user grain in one
    partial-aggregated shuffle; the rank pass is the shared two-phase
    :func:`distributed_rank` over user-cardinality rows --
    ``tie_split=True`` matters here, because small activity counts
    (x = 1, 2, ...) are exactly the heavy-tie values that would
    otherwise pile one bucket onto one reducer."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    ranked = distributed_rank(
        per, [(F.col("x"), True), (F.col("user_id"), True)],
        rn_col="i",
    ).select("x", "i")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").alias("n_events"),
        (F.lit(2) * F.sum(F.col("i") * F.col("x"))
         - (F.count(F.lit(1)) + 1) * F.sum("x")).alias("gini_num"),
        (F.count(F.lit(1)) * F.sum("x")).alias("gini_den"),
    ).select(
        "n_users", "n_events", "gini_num", "gini_den",
        (F.col("gini_num").cast("double")
         / F.col("gini_den").cast("double")).alias("gini"),
    )


def _gini_oracle_sql() -> str:
    return """
        WITH per AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS x
            FROM events WHERE user_id IS NOT NULL GROUP BY user_id
        ),
        ranked AS (
            SELECT x, CAST(row_number() OVER (
                ORDER BY x ASC, user_id ASC) AS BIGINT) AS i
            FROM per
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(x) AS BIGINT) AS n_events,
               CAST(2 * sum(i * x) - (count(*) + 1) * sum(x)
                    AS BIGINT) AS gini_num,
               CAST(count(*) * sum(x) AS BIGINT) AS gini_den,
               CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
                   / CAST(count(*) * sum(x) AS DOUBLE) AS gini
        FROM ranked
    """


def hhi_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN concentration of the corpus over sources
    -- the 'one crawler owns the dataset' alarm a mixture curator
    watches (HHI > 0.25 is the classic concentrated-market line):
    ``HHI = sum(share_s^2)`` computed as the exact integer
    ``sum(n_s^2) * 1e6 div total^2`` in micro-units (headroom:
    sum(n_s^2) <= total^2 needs total under ~3e6 docs for the 1e6
    scaling under 2^63; beyond, divide counts by a common power of 10
    first or move to DECIMAL). Also emits the share of the single
    largest source.

    Scale shape: one partial-aggregated groupBy to source grain;
    everything after runs on source-cardinality rows."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("n").alias("n_docs"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.max("n").alias("max_n"),
    ).select(
        "n_sources", "n_docs",
        F.expr("(sum_sq * 1000000) div (n_docs * n_docs)")
        .alias("hhi_u"),
        F.expr("(max_n * 1000000) div n_docs").alias("top_share_u"),
    )


def _hhi_oracle_sql() -> str:
    return """
        WITH per AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY source
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sources,
               CAST(sum(n) AS BIGINT) AS n_docs,
               (CAST(sum(n * n) AS BIGINT) * 1000000)
                   // (CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT))
                   AS hhi_u,
               (CAST(max(n) AS BIGINT) * 1000000)
                   // CAST(sum(n) AS BIGINT) AS top_share_u
        FROM per
    """


WINSOR_LO = 1    # winsorize at p01
WINSOR_HI = 99   # ... and p99


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED per-type value statistics -- the robust mean an ops
    dashboard shows when a handful of extreme values would otherwise
    own the average: per event_type, the exact p01/p99 bounds (the
    same ceil(p*n/100) rank rule as latency_percentiles_exact), the
    plain truncated-division mean, and the winsorized mean after
    clamping every value into [p01, p99]. All in integer micro-units;
    means are truncating division.

    Scale shape (r8): ranks come from the shared two-phase
    :func:`distributed_rank` (quantile-bucketed, offsets broadcast;
    ``tie_split=False`` -- micro-quantized value_u is near-unique)
    instead of a per-type window whose ~5 partitions each sorted a
    fact-scale run on one reducer; the p01/p99 bounds then broadcast
    back onto the typed rows exactly as before."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vu = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
    ranked = distributed_rank(
        ev.select("event_type", "event_id", vu.alias("value_u")),
        [(F.col("value_u"), True), (F.col("event_id"), True)],
        part_cols=["event_type"], rn_col="rn", n_col="n",
        tie_split=False,
    ).drop("event_id")
    lo_k = F.expr(f"({WINSOR_LO} * n + 99) div 100")
    hi_k = F.expr(f"({WINSOR_HI} * n + 99) div 100")
    bounds = (
        ranked.filter((F.col("rn") == lo_k) | (F.col("rn") == hi_k))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == lo_k, F.col("value_u")))
            .alias("p01_u"),
            F.max(F.when(F.col("rn") == hi_k, F.col("value_u")))
            .alias("p99_u"),
        )
    )
    # null-safe key: a NULL event_type is a real group on both sides
    # (the plain equi-join would silently drop it). bounds derives
    # FROM ranked, so rename its key before the join -- referencing
    # bounds["event_type"] in a self-lineage join is ambiguous
    bounds = bounds.withColumnRenamed("event_type", "_bet")
    clamped = ranked.join(
        F.broadcast(bounds),
        F.col("event_type").eqNullSafe(F.col("_bet")),
    ).drop("_bet").select(
        "event_type", "value_u", "p01_u", "p99_u",
        F.greatest(F.col("p01_u"),
                   F.least(F.col("p99_u"), F.col("value_u")))
        .alias("wv"),
    )
    return (
        clamped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.first("p01_u").alias("p01_u"),
            F.first("p99_u").alias("p99_u"),
            F.expr("sum(value_u) div count(1)").alias("mean_u"),
            F.expr("sum(wv) div count(1)").alias("wmean_u"),
        )
    )


def _winsor_oracle_sql() -> str:
    return f"""
        WITH ranked AS (
            SELECT event_type,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)
                       AS value_u,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(floor(value * 1000000.0 + 0.5)
                                     AS BIGINT) ASC, event_id ASC
                   ) AS rn,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM events WHERE value IS NOT NULL
        ),
        bounds AS (
            SELECT event_type,
                   min(CASE WHEN rn = ({WINSOR_LO} * n + 99) // 100
                       THEN value_u END) AS p01_u,
                   max(CASE WHEN rn = ({WINSOR_HI} * n + 99) // 100
                       THEN value_u END) AS p99_u
            FROM ranked
            WHERE rn = ({WINSOR_LO} * n + 99) // 100
               OR rn = ({WINSOR_HI} * n + 99) // 100
            GROUP BY event_type
        )
        SELECT r.event_type AS event_type,
               CAST(count(*) AS BIGINT) AS n,
               b.p01_u AS p01_u, b.p99_u AS p99_u,
               CAST(sum(r.value_u) AS BIGINT) // count(*) AS mean_u,
               CAST(sum(greatest(b.p01_u, least(b.p99_u, r.value_u)))
                    AS BIGINT) // count(*) AS wmean_u
        FROM ranked r JOIN bounds b
            ON r.event_type IS NOT DISTINCT FROM b.event_type
        GROUP BY r.event_type, b.p01_u, b.p99_u
    """


PSI_PCT = 50        # first-half share of events at the PSI cutoff day
PSI_SCALE = 1_000_000


def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX of the event ``value`` distribution
    between the corpus's first and second time halves -- the
    monitoring number a serving/data team alarms on when the feature
    distribution moves (PSI > 0.1 "shifted", > 0.25 "major shift").
    The halves split at the first calendar day where the running event
    count reaches ``PSI_PCT``% (the temporal-split cutoff machinery);
    values bucket by integer floor; every bucket observed in either
    half contributes

        contrib = (p - q) * ln(p / q),

    with counts CLAMPED at one (the standard zero-bucket epsilon,
    deterministic instead of a float eps) and the log carried in
    once-rounded BIGINT 1e-6 units split as ln(cnt_p) + ln(n_q) -
    ln(cnt_q) - ln(n_p) (docs/ROUNDING.md rule 2) -- all combination
    is exact integer math, emitted in 1e-6 units.

    Scale shape: one day-grain shuffle for the cutoff (bounded
    calendar window, allowlisted family), broadcast back; one
    (bucket)-grain partial-aggregated shuffle builds both half counts
    in a single pass (conditional sums, no second scan); per-bucket
    math is map-side over bucket-cardinality rows with the two scalar
    totals broadcast."""
    from ..functions.text_quality import lnu

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor("value").cast("long").alias("bucket"),
    )
    daily = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    wd = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    totals = daily.agg(F.sum("n").alias("total"))
    cutoff = (
        daily.withColumn("run", F.sum("n").over(wd))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("run") * 100 >= F.col("total") * PSI_PCT)
        .agg(F.min("day").alias("cutoff_day"))
    )
    halves = (
        ev.crossJoin(F.broadcast(cutoff))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("day") <= F.col("cutoff_day"), 1)
                  .otherwise(0)).cast("long").alias("n_first"),
            F.sum(F.when(F.col("day") > F.col("cutoff_day"), 1)
                  .otherwise(0)).cast("long").alias("n_second"),
        )
    )
    tot2 = halves.agg(
        F.sum("n_first").alias("tp"), F.sum("n_second").alias("tq"))
    cp = F.greatest(F.col("n_first"), F.lit(1))
    cq = F.greatest(F.col("n_second"), F.lit(1))
    p_u = F.expr(f"greatest(n_first, 1) * {PSI_SCALE} div tp")
    q_u = F.expr(f"greatest(n_second, 1) * {PSI_SCALE} div tq")
    lr = lnu(cp) + lnu(F.col("tq")) - lnu(cq) - lnu(F.col("tp"))
    return (
        halves.crossJoin(F.broadcast(tot2))
        .select(
            "bucket", "n_first", "n_second",
            p_u.cast("long").alias("p_u"),
            q_u.cast("long").alias("q_u"),
            ((p_u - q_u) * lr).cast("long").alias("contrib_nano"),
        )
    )


def _psi_oracle_sql() -> str:
    from ..functions.text_quality import lnu_sql

    lr = (f"({lnu_sql('greatest(n_first, 1)')} + {lnu_sql('tq')}"
          f" - {lnu_sql('greatest(n_second, 1)')} - {lnu_sql('tp')})")
    return f"""
        WITH ev AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(floor(value) AS BIGINT) AS bucket
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        ),
        daily AS (SELECT day, count(*) AS n FROM ev GROUP BY day),
        cut AS (
            SELECT min(day) AS cutoff_day FROM (
                SELECT day,
                       sum(n) OVER (ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS run,
                       sum(n) OVER () AS total
                FROM daily)
            WHERE run * 100 >= total * {PSI_PCT}
        ),
        halves AS (
            SELECT bucket,
                   CAST(sum(CASE WHEN day <= c.cutoff_day
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
                   CAST(sum(CASE WHEN day > c.cutoff_day
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_second
            FROM ev CROSS JOIN cut c GROUP BY bucket
        ),
        tot2 AS (
            SELECT CAST(sum(n_first) AS BIGINT) AS tp,
                   CAST(sum(n_second) AS BIGINT) AS tq
            FROM halves
        )
        SELECT bucket, n_first, n_second,
               CAST(greatest(n_first, 1) * {PSI_SCALE} // tp AS BIGINT)
                   AS p_u,
               CAST(greatest(n_second, 1) * {PSI_SCALE} // tq AS BIGINT)
                   AS q_u,
               CAST((greatest(n_first, 1) * {PSI_SCALE} // tp
                     - greatest(n_second, 1) * {PSI_SCALE} // tq)
                    * {lr} AS BIGINT) AS contrib_nano
        FROM halves CROSS JOIN tot2
    """


TS_SCALE = 1_000_000  # Theil-Sen slopes in 1e-6 counts/day


def theilsen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend of the daily event count per event type:
    the median over all pairwise day-slopes -- the estimator that
    shrugs off the outlier days that wreck an OLS fit (up to ~29%
    contamination), i.e. the "is traffic actually growing" number an
    ops team trusts over a spiky week. Slopes are quantized ONCE to
    exact 1e-6 counts/day (truncating division of integer deltas;
    possibly negative, and Spark ``div`` / DuckDB ``//`` both truncate
    toward zero), and the median is the exact lower-median rank rule
    over those integers -- bit-identical across engines, no float
    regression anywhere.

    Scale shape: events collapse to (type, day) grain in ONE
    partial-aggregated shuffle; the pairwise self-join and median rank
    run over CALENDAR-squared cardinality per type (thousands of days
    -> millions of integer pairs, bounded by history length, never by
    data volume -- the module-docstring argument, one notch up)."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type"),
        F.to_date("ts").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    base = daily.groupBy("event_type").agg(F.min("d").alias("d0"))
    pts = daily.join(F.broadcast(base), "event_type").select(
        "event_type",
        F.datediff("d", "d0").cast("long").alias("x"),
        "cnt",
    )
    a = pts.select(
        "event_type", F.col("x").alias("x1"), F.col("cnt").alias("y1"))
    b = pts.select(
        F.col("event_type").alias("et2"),
        F.col("x").alias("x2"), F.col("cnt").alias("y2"))
    pairs = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("x1") < F.col("x2"))
    ).select(
        "event_type",
        F.expr(f"((y2 - y1) * {TS_SCALE}) div (x2 - x1)")
        .alias("slope_u"),
    )
    w = Window.partitionBy("event_type").orderBy("slope_u")
    ranked = pairs.select(
        "event_type", "slope_u",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        .alias("m"),
    )
    return (
        ranked.filter(F.expr("rk = (m + 1) div 2"))
        .select(
            "event_type",
            F.col("slope_u").alias("slope_med_u"),
            F.col("m").cast("long").alias("n_pairs"),
        )
    )


def _theilsen_oracle_sql() -> str:
    return f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events WHERE ts IS NOT NULL
            GROUP BY event_type, CAST(ts AS DATE)
        ),
        pts AS (
            SELECT event_type,
                   CAST(datediff('day', min(d) OVER (
                       PARTITION BY event_type), d) AS BIGINT) AS x,
                   cnt
            FROM daily
        ),
        pairs AS (
            SELECT a.event_type,
                   ((b.cnt - a.cnt) * {TS_SCALE}) // (b.x - a.x)
                       AS slope_u
            FROM pts a JOIN pts b
              ON a.event_type = b.event_type AND a.x < b.x
        ),
        ranked AS (
            SELECT event_type, slope_u,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY slope_u) AS rk,
                   count(*) OVER (PARTITION BY event_type) AS m
            FROM pairs
        )
        SELECT event_type,
               CAST(slope_u AS BIGINT) AS slope_med_u,
               CAST(m AS BIGINT) AS n_pairs
        FROM ranked WHERE rk = (m + 1) // 2
    """


# Benford expected first-digit shares log10(1 + 1/d) in exact 1e-6
# units, evaluated once here in Python (docs/ROUNDING.md:
# transcendentals are never computed inside either engine)
import math as _math

BENFORD_U = {
    d: round(_math.log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)
}


def benford_value_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD first-digit audit of the event ``value`` column -- the
    classic fabricated-/degenerate-data screen: naturally occurring
    multi-scale magnitudes follow P(d) = log10(1 + 1/d); flat or
    spiked digit histograms flag synthetic fills, unit bugs, or
    truncation. The first digit comes from the PINNED integer route:
    values quantize to exact cents (``floor(|v| * 100 + 0.5)``), and
    the leading digit is the first character of the INTEGER's decimal
    string -- integer-to-string is exact and identical in both
    engines, where float-to-string formatting is not. Zero-cent rows
    carry no leading digit and are excluded. Expected shares are
    precomputed 1e-6 literals; observed share and deviation are exact
    truncating divisions.

    Scale shape: map-only digit projection, ONE 9-bucket partial-
    aggregated shuffle, scalar total broadcast back."""
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.expr("CAST(floor(abs(value) * 100 + 0.5) AS BIGINT)")
    digits = (
        ev.select(cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(F.substring(F.col("cents").cast("string"), 1, 1)
                .cast("int").alias("digit"))
    )
    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"))
    total = obs.agg(F.sum("n_obs").alias("total"))
    exp_arms = " ".join(
        f"WHEN digit = {d} THEN {u}" for d, u in BENFORD_U.items())
    return (
        obs.crossJoin(F.broadcast(total))
        .select(
            "digit", "n_obs",
            F.expr("n_obs * 1000000 div total").cast("long")
            .alias("share_u"),
            F.expr(f"CASE {exp_arms} END").cast("long")
            .alias("expected_u"),
            F.expr(f"n_obs * 1000000 div total - CASE {exp_arms} END")
            .cast("long").alias("dev_u"),
        )
    )


def _benford_oracle_sql() -> str:
    exp_arms = " ".join(
        f"WHEN digit = {d} THEN {u}" for d, u in BENFORD_U.items())
    return f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(abs(value) * 100 + 0.5)
                       AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
            FROM events
            WHERE value IS NOT NULL
              AND CAST(floor(abs(value) * 100 + 0.5) AS BIGINT) > 0
        ),
        obs AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
            FROM digits GROUP BY digit
        ),
        tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM obs)
        SELECT digit, n_obs,
               CAST(n_obs * 1000000 // total AS BIGINT) AS share_u,
               CAST(CASE {exp_arms} END AS BIGINT) AS expected_u,
               CAST(n_obs * 1000000 // total
                    - CASE {exp_arms} END AS BIGINT) AS dev_u
        FROM obs CROSS JOIN tot
    """


# Poisson-bootstrap parameters: B replicates; per-(doc, replicate)
# weight drawn from Poisson(1) truncated at 4, via fixed integer
# cutoffs on a 32-bit md5 draw (floor(cumP * 2^32) literals -- the
# truncation moves ~0.4% of mass onto weight 4, an accepted bias far
# under the CI resolution). 95% interval = exact ceil-rank order
# statistics of the replicate means.
BOOT_B = 200
BOOT_CUTS = (1580030169, 3160060337, 3950075422, 4213413784)
BOOT_SCALE = 10_000  # replicate means in 1e-4 token fixed point
BOOT_LO_PCT, BOOT_HI_PCT = 25, 975  # 2.5% / 97.5% in per-mille


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP 95% confidence interval for the per-source
    mean tokens/document -- the uncertainty report a curation pipeline
    attaches to any corpus statistic before acting on a between-source
    difference. The classic n-out-of-n resample is undistributable
    (sampling WITH replacement needs global coordination); the Poisson
    bootstrap replaces it with an independent per-row replicate weight
    w ~ Poisson(1), which is embarrassingly parallel and the standard
    at-scale substitute (each replicate's total weight concentrates at
    n). Determinism: the weight is a fixed-cutoff lookup on the
    engine-stable md5 draw of (doc_id, replicate), so Spark and the
    oracle materialize the SAME resamples; replicate means are exact
    integers in 1e-4 fixed point, and the CI bounds are exact
    ceil-rank order statistics -- no float percentile interpolation.
    Replicates whose source drew total weight 0 (tiny sources) carry
    no estimate and are excluded from the rank; ``n_reps`` reports how
    many survived.

    Scale shape: one map pass explodes ``BOOT_B`` weighted copies of
    each row's (source, b) CONTRIBUTION -- map-side partial
    aggregation collapses them to (source x B) grain before the single
    shuffle, so the exchange is bounded by source-cardinality * B, not
    corpus size; the rank windows then partition by source over B-row
    groups, and the point estimate joins back at source grain."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    from ..functions import text_quality as tq

    x = F.size(tq.words(F.coalesce(F.col("text"), F.lit("")))).cast("long")
    # narrow (doc_id, source, x) rows: the lazy localCheckpoint runs
    # the regex word-split once instead of twice (the B-fold replicate
    # explode and the point estimate both consume base)
    base = (
        docs.select("doc_id", "source", x.alias("x"))
        .localCheckpoint(eager=False)
    )
    reps = base.select(
        "source", "x",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        F.col("doc_id"),
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("boot:"), F.col("doc_id").cast("string"),
                           F.lit(":"), F.col("b").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    c0, c1, c2, c3 = BOOT_CUTS
    w = (
        F.when(u < c0, 0).when(u < c1, 1).when(u < c2, 2)
        .when(u < c3, 3).otherwise(4).cast("long")
    )
    rep_means = (
        reps.select("source", "b", (w * F.col("x")).alias("wx"), w.alias("w"))
        .groupBy("source", "b")
        .agg(F.sum("wx").alias("sx"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select(
            "source", "b",
            F.expr(f"({BOOT_SCALE} * sx) DIV sw").alias("m"),
        )
    )
    wrank = Window.partitionBy("source").orderBy(F.asc("m"), F.asc("b"))
    ranked = rep_means.select(
        "source", "m",
        F.row_number().over(wrank).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("nr"),
    )
    lo_rk = F.expr(f"({BOOT_LO_PCT} * nr + 999) DIV 1000")
    hi_rk = F.expr(f"({BOOT_HI_PCT} * nr + 999) DIV 1000")
    ci = (
        ranked.select("source", "m", "rk", "nr",
                      lo_rk.alias("lo_rk"), hi_rk.alias("hi_rk"))
        .groupBy("source")
        .agg(
            F.max(F.when(F.col("rk") == F.col("lo_rk"), F.col("m")))
            .alias("ci_lo_scaled"),
            F.max(F.when(F.col("rk") == F.col("hi_rk"), F.col("m")))
            .alias("ci_hi_scaled"),
            F.max("nr").cast("int").alias("n_reps"),
        )
    )
    point = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"({BOOT_SCALE} * sum(x)) DIV count(*)")
        .alias("mean_scaled"),
    )
    return point.join(ci, "source").select(
        "source", "n_docs", "mean_scaled",
        "ci_lo_scaled", "ci_hi_scaled", "n_reps",
    )


def _boot_oracle_sql() -> str:
    from .textstats import _W0_SQL

    c0, c1, c2, c3 = BOOT_CUTS
    return f"""
        WITH base AS (
            SELECT doc_id, source,
                   CAST(len({_W0_SQL}) AS BIGINT) AS x
            FROM documents
        ),
        reps AS (
            SELECT source, x,
                   CASE WHEN u < {c0} THEN 0 WHEN u < {c1} THEN 1
                        WHEN u < {c2} THEN 2 WHEN u < {c3} THEN 3
                        ELSE 4 END AS w,
                   b
            FROM (
                SELECT source, x,
                       CAST('0x' || substr(md5('boot:' || doc_id
                            || ':' || r.b), 1, 8) AS BIGINT) AS u,
                       r.b
                FROM base, (SELECT unnest(range(0, {BOOT_B})) AS b) r
            )
        ),
        rep_means AS (
            SELECT source, b,
                   ({BOOT_SCALE} * sum(w * x)) // sum(w) AS m
            FROM reps GROUP BY source, b
            HAVING sum(w) > 0
        ),
        ranked AS (
            SELECT source, m,
                   row_number() OVER (PARTITION BY source
                       ORDER BY m ASC, b ASC) AS rk,
                   count(*) OVER (PARTITION BY source) AS nr
            FROM rep_means
        ),
        ci AS (
            SELECT source,
                   CAST(max(CASE WHEN rk = ({BOOT_LO_PCT} * nr + 999) // 1000
                            THEN m END) AS BIGINT) AS ci_lo_scaled,
                   CAST(max(CASE WHEN rk = ({BOOT_HI_PCT} * nr + 999) // 1000
                            THEN m END) AS BIGINT) AS ci_hi_scaled,
                   CAST(max(nr) AS INTEGER) AS n_reps
            FROM ranked GROUP BY source
        ),
        point AS (
            SELECT source, count(*) AS n_docs,
                   CAST(({BOOT_SCALE} * sum(x)) // count(*) AS BIGINT)
                       AS mean_scaled
            FROM base GROUP BY source
        )
        SELECT p.source, p.n_docs, p.mean_scaled,
               c.ci_lo_scaled, c.ci_hi_scaled, c.n_reps
        FROM point p JOIN ci c USING (source)
    """


QUERIES = {
    "bootstrap_mean_ci": bootstrap_mean_ci,
    "psi_value_drift": psi_value_drift,
    "theilsen_daily_trend": theilsen_daily_trend,
    "benford_value_audit": benford_value_audit,
    "arrival_lateness_report": arrival_lateness_report,
    "gini_user_activity": gini_user_activity,
    "hhi_source_concentration": hhi_source_concentration,
    "winsorized_value_stats": winsorized_value_stats,
    "acf_daily_counts": acf_daily_counts,
    "cusum_control_chart": cusum_control_chart,
    "latency_percentiles_exact": latency_percentiles_exact,
    "mad_robust_anomaly": mad_robust_anomaly,
}

ORACLE = {
    "bootstrap_mean_ci": _boot_oracle_sql(),
    "psi_value_drift": _psi_oracle_sql(),
    "theilsen_daily_trend": _theilsen_oracle_sql(),
    "benford_value_audit": _benford_oracle_sql(),
    "arrival_lateness_report": _lateness_oracle_sql(),
    "gini_user_activity": _gini_oracle_sql(),
    "hhi_source_concentration": _hhi_oracle_sql(),
    "winsorized_value_stats": _winsor_oracle_sql(),
    "acf_daily_counts": _acf_oracle_sql(),
    "cusum_control_chart": _cusum_oracle_sql(),
    "latency_percentiles_exact": _pct_oracle_sql(),
    "mad_robust_anomaly": _mad_oracle_sql(),
}
