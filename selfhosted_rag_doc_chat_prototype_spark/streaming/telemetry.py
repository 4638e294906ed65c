"""Streaming operators for the telemetry domain (SURVEY.md section 2.10).

The reference's MQTT hub keeps a per-agent last-100 ring buffer and
marks agents offline after a 60 s heartbeat gap
(``mqtt_agent_hub/mqtt/registry.py:30-36,82-95``). Here the ``events``
table doubles as the telemetry stream (TESTDATA/FIXTURES convention):

- ``stream_windowed_counts``: tumbling event-time window aggregation
  with watermark (ST5/ST10) -- runs identically over ``readStream`` or
  batch (same plan builder).
- ``sessionize_batch``: gap-based sessionization (60 s heartbeat
  staleness generalized to a gap threshold) as a *batch* window
  computation -- lag + cumulative-sum-of-new-session-flags, fully
  oracle-checkable.
- ``stateful_user_stats``: ``applyInPandasWithState`` keyed state
  (per-user running count/max, the ST10/ST11 state shape) for the
  streaming path.
- ``file_completion_sentinel``: ST3 semantics -- a file is complete
  when its observed chunk count reaches ``expected_chunks`` -- as a
  grouped aggregation emitting only completed groups.

Scale: all stateful ops are keyed by user/agent id, so state
partitions horizontally; watermarks bound state size; the batch
sessionization is a single window shuffle per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table

GAP_SECONDS = 3600  # session gap threshold (60 s heartbeat, scaled to
                    # the synthetic events cadence)


def windowed_counts_plan(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours",
                         slide: str | None = None) -> DataFrame:
    """Tumbling -- or, with ``slide``, HOPPING -- window per
    event_type; watermark only binds when the source is streaming
    (harmless on batch). With a slide every event expands map-side
    into window/slide overlapping windows before the one exchange."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_counts_plan(table(spark, sf_dir, "events"))


HOP_WINDOW_S = 3600   # hopping-window length (1 h)
HOP_SLIDE_S = 900     # slide (15 min): each event lands in 4 windows


def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING (hopping) window counts -- the window TVF shape the
    tumbling face can't express: 1-hour windows advancing every 15
    minutes, so each event contributes to HOP_WINDOW_S / HOP_SLIDE_S
    = 4 overlapping windows (Spark's ``window(ts, '1 hour',
    '15 minutes')``; on a stream the same plan runs under a watermark
    exactly like :func:`windowed_counts_plan`). A NULL ts carries no
    event time and is excluded on both sides.

    Scale shape: the 4x window expansion is map-side (the TVF
    replicates rows before the exchange); ONE partial-aggregated
    shuffle on (window, type) -- window cardinality is calendar x 4,
    not data-sized."""
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            F.window("ts", f"{HOP_WINDOW_S} seconds",
                     f"{HOP_SLIDE_S} seconds").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


def _hopping_oracle_sql() -> str:
    hops = HOP_WINDOW_S // HOP_SLIDE_S
    return f"""
        WITH ev AS (
            SELECT ts, event_type, value,
                   (epoch_us(ts) // ({HOP_SLIDE_S} * 1000000))
                       * {HOP_SLIDE_S} AS slide_slot_s
            FROM events WHERE ts IS NOT NULL
        ),
        hopped AS (
            SELECT to_timestamp(slide_slot_s - k.k * {HOP_SLIDE_S})
                       AS w_start,
                   event_type, value
            FROM ev, (SELECT unnest(range(0, {hops})) AS k) k
        )
        SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM hopped GROUP BY w_start, event_type
    """


def continuous_rollup_sink(
    stream_events: DataFrame, path: str, checkpoint_dir: str,
    window: str = "1 hour", watermark: str = "2 hours",
    slide: str | None = None,
):
    """The hypertable CONTINUOUS AGGREGATE pattern: the hourly rollup
    is maintained incrementally as events stream in, not recomputed.
    Each micro-batch re-emits only the windows it changed (update
    output mode); ``foreachBatch`` merges them into the rollup table
    through the same idempotent content-addressed upsert the chunk
    store uses, keyed on (window_start, event_type) -- so replays and
    late events within the watermark CONVERGE instead of duplicating.
    State holds only windows newer than the watermark; the rollup
    table holds all history.

    Returns the started StreamingQuery; read the rollup with
    ``sinks.read_table(spark, path)``."""
    from ..sinks import upsert_table

    agg = windowed_counts_plan(stream_events, window, watermark,
                               slide=slide)
    keyed = agg.select(
        F.concat_ws("|", "window_start", "event_type").alias("id"), "*"
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_table(batch_df.sparkSession, batch_df, path, id_col="id")

    return (
        keyed.writeStream
        .outputMode("update")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization: a new session starts when the inter-event
    gap exceeds GAP_SECONDS. Output: per-session stats per user."""
    # an event without an event time cannot be placed in a session
    # timeline: excluded on both sides (cross-engine NULL ordering
    # would otherwise open a phantom session vs absorb the row)
    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > GAP_SECONDS), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_seconds"
        ),
    )


def session_window_plan(events: DataFrame, gap_seconds: int = GAP_SECONDS,
                        watermark: str = "2 hours") -> DataFrame:
    """Gap sessionization via Spark's native ``session_window`` -- the
    streaming-idiomatic form of ``sessionize_batch`` (identical
    semantics: a new session starts when the inter-event gap exceeds
    the gap duration). On a stream the watermark closes sessions and
    bounds state; on batch the same plan runs as a one-shot agg."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(
            "user_id", F.session_window("ts", f"{gap_seconds} seconds").alias("sw")
        )
        .agg(F.count("*").alias("n_events"),
             F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
             F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"))
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_plan(table(spark, sf_dir, "events"))


def stateful_user_stats(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user keyed state via applyInPandasWithState: running count,
    running value sum, last-seen timestamp (the registry's per-agent
    state shape, ST10)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double, last_ts timestamp"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            m = pdf["ts"].max()
            last_ts = m if last_ts is None else max(last_ts, m)
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n],
             "total_value": [round(total, 2)], "last_ts": [last_ts]}
        )

    timeouts = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
    }[timeout]
    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", timeouts
    )


def _fold_funnel(t1, t2, t3, rows):
    """Advance the funnel (t1=first view, t2=first click after t1,
    t3=first purchase after t2) through (ts, event_type) rows that MUST
    already be in event-time order. NaT/NULL ts are skipped -- the
    batch twin's min(when(...)) ignores NULLs, and a NaT locked in as
    t1 would poison every later comparison (NaT > x is always False)."""
    import pandas as pd

    for ts, et in rows:
        if pd.isna(ts):
            continue
        if et == "view" and t1 is None:
            t1 = ts
        elif et == "click" and t1 is not None and t2 is None and ts > t1:
            t2 = ts
        elif et == "purchase" and t2 is not None and t3 is None and ts > t2:
            t3 = ts
    return t1, t2, t3


def _interval_ms(s: str) -> int:
    """Parse a simple ``"<n> <unit>"`` interval (seconds/minutes/hours/
    days) to milliseconds."""
    n, unit = s.split()
    mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000,
            "day": 86_400_000}[unit.rstrip("s")]
    return int(float(n) * mult)


def funnel_stateful(events: DataFrame, ordered: bool = True,
                    delay: str = "2 hours",
                    state_ttl: str | None = None) -> DataFrame:
    """Streaming twin of the batch conversion funnel
    (``analytics.funnel_view_click_purchase``): keyed state per user
    carries the first-touch step times; each update emits the user's
    current snapshot with the reached step.

    ``ordered=True`` (default): greedy in-event-time-order advancement
    -- equals the batch correlated-min semantics whenever a user's
    events arrive time-ordered ACROSS micro-batches (within a batch
    they are sorted here); late cross-batch arrivals follow standard
    streaming-funnel first-touch semantics (an earlier view surfacing
    after a later one was locked in does not rewrite history). State
    is three timestamps per user: bounded.

    ``ordered=False``: watermark-delayed -- per-user events BUFFER in
    state until the watermark (``delay`` behind max event time) passes
    them, and only then fold into the committed step times, in event-
    time order; each emission is the committed fold extended
    provisionally through the still-buffered tail. Stream-equals-batch
    then holds under ARBITRARY micro-batch reordering of events no
    later than ``delay`` (the normal out-of-order case), at the cost
    of state linear in each user's events inside the watermark window
    -- the standard completeness-vs-state trade, chosen per funnel.

    ``state_ttl`` (ordered=False, streaming only) bounds the keyed
    state on an unbounded user universe: a user idle past ``ttl`` of
    EVENT time (watermark-driven ``EventTimeTimeout``) folds any
    remaining buffer -- all ripe by then, since the watermark passed
    last_seen + ttl -- emits a final snapshot, and is EVICTED. The
    contract is sessionization's: post-TTL activity for that user
    begins a NEW funnel observation rather than resuming the evicted
    one (the reference's own stale-state purge, ST5/CHUNK_TIMEOUT,
    makes the same trade). ``None`` (default) keeps exact
    unbounded-horizon semantics; crawl-scale deployments should set a
    horizon matched to how long a funnel meaningfully stays open."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("user_id long, t1 timestamp, t2 timestamp, "
                  "t3 timestamp, step int")

    def snapshot(key, t1, t2, t3):
        step = 3 if t3 is not None else 2 if t2 is not None else (
            1 if t1 is not None else 0)
        return pd.DataFrame({
            "user_id": [key[0]], "t1": [t1], "t2": [t2], "t3": [t3],
            "step": [step],
        })

    if ordered:
        state_schema = "t1 timestamp, t2 timestamp, t3 timestamp"

        def update(key, pdfs, state: GroupState):
            t1, t2, t3 = state.get if state.exists else (None, None, None)
            parts = [pdf[["ts", "event_type"]] for pdf in pdfs]
            rows = (
                pd.concat(parts).sort_values("ts")
                if parts else pd.DataFrame(columns=["ts", "event_type"])
            )
            t1, t2, t3 = _fold_funnel(
                t1, t2, t3, zip(rows["ts"], rows["event_type"])
            )
            state.update((t1, t2, t3))
            yield snapshot(key, t1, t2, t3)

        return events.groupBy("user_id").applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )

    state_schema = ("t1 timestamp, t2 timestamp, t3 timestamp, "
                    "buf_ts array<timestamp>, buf_et array<string>, "
                    "last_ts timestamp")
    # the ripeness compare pairs SESSION-rendered naive event times
    # with the epoch-UTC watermark (getCurrentWatermarkMs); they only
    # measure the same clock under a UTC session -- fail loudly rather
    # than silently commit still-reorderable events hours early
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"funnel_stateful(ordered=False) requires a UTC session "
            f"timezone (got {tz!r}): buffered event times are "
            "session-naive while the watermark is epoch-UTC"
        )
    src = events.withWatermark("ts", delay) if events.isStreaming else events
    ttl_ms = (
        _interval_ms(state_ttl)
        if state_ttl is not None and events.isStreaming else None
    )

    def update_delayed(key, pdfs, state: GroupState):
        t1, t2, t3, buf_ts, buf_et, last_ts = (
            state.get if state.exists
            else (None, None, None, [], [], None)
        )
        buf = [
            (pd.Timestamp(ts), et)
            for ts, et in zip(buf_ts or [], buf_et or [])
        ]
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the event-time TTL: everything buffered is ripe
            # (watermark >= last_ts + ttl >= every buffered ts) -- fold,
            # emit the final snapshot, evict
            t1, t2, t3 = _fold_funnel(t1, t2, t3, buf)
            state.remove()
            yield snapshot(key, t1, t2, t3)
            return
        for pdf in pdfs:
            buf.extend(
                (ts, et) for ts, et in zip(pdf["ts"], pdf["event_type"])
                if not pd.isna(ts)
            )
        buf.sort(key=lambda r: r[0])
        if buf:
            last_ts = (
                buf[-1][0] if last_ts is None
                else max(pd.Timestamp(last_ts), buf[-1][0])
            )
        try:
            wm_ms = state.getCurrentWatermarkMs()
        except Exception:
            wm_ms = 0
        wm = pd.Timestamp(wm_ms, unit="ms") if wm_ms > 0 else None
        if wm is not None:
            ripe = [r for r in buf if r[0] <= wm]
            buf = [r for r in buf if r[0] > wm]
            t1, t2, t3 = _fold_funnel(t1, t2, t3, ripe)
        state.update((
            t1, t2, t3,
            [r[0] for r in buf], [r[1] for r in buf], last_ts,
        ))
        if ttl_ms is not None:
            # timeout timestamps must sit beyond the current watermark
            last_ms = (
                int(pd.Timestamp(last_ts).value // 1_000_000)
                if last_ts is not None else wm_ms
            )
            state.setTimeoutTimestamp(max(last_ms + ttl_ms, wm_ms + 1))
        # provisional fold through the buffered tail: the emission
        # reflects everything seen so far in event-time order, while
        # committed state stays replay-safe behind the watermark
        p1, p2, p3 = _fold_funnel(t1, t2, t3, buf)
        yield snapshot(key, p1, p2, p3)

    return src.groupBy("user_id").applyInPandasWithState(
        update_delayed, out_schema, state_schema, "update",
        GroupStateTimeout.EventTimeTimeout if ttl_ms is not None
        else GroupStateTimeout.NoTimeout,
    )


def agent_last_seen_plan(events: DataFrame) -> DataFrame:
    """The mqtt registry's ``_last_seen`` map (``mqtt/registry.py:82-95``)
    as a keyed max aggregation: per-agent newest heartbeat. The same
    builder serves batch and ``readStream`` (complete/update mode);
    ``operators/sessions.stale_agents`` derives the offline snapshot
    from it by comparing against a "now" anchor at 60 s."""
    return events.groupBy(F.col("user_id").alias("agent_id")).agg(
        F.max("ts").alias("last_seen_ts")
    )


def file_completion_sentinel(chunks: DataFrame) -> DataFrame:
    """ST3: per-file completion barrier. A file finalizes exactly when
    observed == expected (producer_utils.py:109-117 sentinel +
    consumer_worker.py:63-97 flush) -- here a grouped count emitting
    only completed files; in streaming this is the same plan under
    ``outputMode("update")`` or applyInPandasWithState keyed by file."""
    return (
        chunks.groupBy("source_file", "expected_chunks")
        .agg(F.count("*").alias("observed_chunks"))
        .filter(F.col("observed_chunks") >= F.col("expected_chunks"))
        .select("source_file", "expected_chunks", "observed_chunks")
    )


def request_reply_stream_join(
    requests: DataFrame, replies: DataFrame,
    watermark: str = "30 minutes", window_minutes: int = 10,
) -> DataFrame:
    """ST8/J7 as a watermarked stream-stream join: requests correlate
    to same-key replies arriving within ``window_minutes`` (the
    reference's OCR/Whisper reply keys with 300 s expiry,
    ``utils/ocr_utils.py:60-112``). Watermarks bound both join-state
    buffers, so state is O(in-flight requests), mirroring the
    reference's ephemeral reply-key TTL. Columns: requests(key,
    req_id, req_ts), replies(key, reply_id, reply_ts). Works on batch
    DataFrames too (watermark binds only when streaming).
    """
    req = requests.withWatermark("req_ts", watermark) if requests.isStreaming else requests
    rep = replies.withWatermark("reply_ts", watermark) if replies.isStreaming else replies
    cond = (
        (req["key"] == rep["key"])
        & (rep["reply_ts"] >= req["req_ts"])
        & (rep["reply_ts"]
           <= req["req_ts"] + F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return req.join(rep, cond).select(
        req["key"].alias("key"), "req_id", "reply_id",
        (F.unix_timestamp(rep["reply_ts"]) - F.unix_timestamp(req["req_ts"]))
        .alias("latency_seconds"),
    )


CHUNK_TTL_MS = 300_000  # reference CHUNK_TIMEOUT=300s (shared/defaults.py:59)


def file_sentinel_stateful(chunks: DataFrame, ttl_ms: int = CHUNK_TTL_MS) -> DataFrame:
    """ST3 + ST5 as keyed state: per-file chunk counting with a
    processing-time TTL. A file emits ``complete`` exactly when its
    observed count reaches the sentinel's ``expected_chunks``
    (producer_utils.py:109-117); state that idles past the TTL emits
    ``evicted`` and is dropped -- the reference's CHUNK_TIMEOUT stale-
    staging purge (consumer_worker.py:45-52, parquet_service.py:116-149).

    State is keyed by source_file, so it partitions horizontally and
    is bounded by (files in flight) x a few longs -- no payload is
    retained, matching the reference's count-only sentinel check.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "source_file string, expected_chunks long, observed_chunks long,"
        " status string"
    )
    state_schema = "observed long, expected long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            observed, expected = state.get if state.exists else (0, -1)
            state.remove()
            yield pd.DataFrame(
                {"source_file": [key[0]], "expected_chunks": [expected],
                 "observed_chunks": [observed], "status": ["evicted"]}
            )
            return
        observed, expected = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            observed += len(pdf)
            exp = pdf["expected_chunks"].dropna()
            if len(exp):
                expected = max(expected, int(exp.max()))
        if expected >= 0 and observed >= expected:
            state.remove()
            yield pd.DataFrame(
                {"source_file": [key[0]], "expected_chunks": [expected],
                 "observed_chunks": [observed], "status": ["complete"]}
            )
        else:
            state.update((observed, expected))
            state.setTimeoutDuration(ttl_ms)

    return chunks.groupBy("source_file").applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNCE RATE per day -- the engagement metric layered on the
    gap sessionization: of the sessions that START on each day, the
    fraction containing exactly one event. Reuses
    :func:`sessionize_batch`'s session relation verbatim (same gap
    contract, same NULL-ts exclusion); the rate is a ratio of
    exactly-counted integers.

    Scale shape: the sessionize window is the only corpus-sized pass;
    the rollup is a partial-aggregated groupBy over session-grain
    rows keyed by <= calendar-cardinality days."""
    sess = sessionize_batch(spark, sf_dir)
    return (
        sess.groupBy(
            F.substring("session_start", 1, 10).alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("long"))
            .alias("n_bounces"),
        )
        .select(
            "day", "n_sessions", "n_bounces",
            (F.col("n_bounces").cast("double")
             / F.col("n_sessions").cast("double")).alias("bounce_rate"),
        )
    )


SESS_PCTS = (50, 90, 99)


def session_duration_percentiles(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """EXACT session-duration percentiles -- the engagement
    distribution next to the bounce rate: p50/p90/p99 of gap-session
    durations by the percentile_disc rank rule (k = ceil(p*n/100),
    integer division; ties and the element choice identical in both
    engines). Built on the shared sessionize relation.

    Scale shape (r8): the sessionize window is the corpus-sized pass
    (partitioned by user); the rank pass is the shared two-phase
    :func:`distributed_rank` over SESSION-cardinality rows --
    previously a single-reducer global window, the round-7 verdict's
    scale-killer list. ``tie_split=True`` because short durations
    (0s bounces) are heavy-tie values."""
    from ..operators.rank import distributed_rank

    sess = sessionize_batch(spark, sf_dir).select(
        "user_id", "session_seq", "duration_seconds"
    )
    ranked = distributed_rank(
        sess,
        [(F.col("duration_seconds"), True), (F.col("user_id"), True),
         (F.col("session_seq"), True)],
        rn_col="rn", n_col="n",
    ).select("duration_seconds", "rn", "n")
    targets = F.array(*[
        F.struct(
            F.lit(p).cast("int").alias("p"),
            F.expr(f"({p} * n + 99) div 100").alias("k"),
        )
        for p in SESS_PCTS
    ])
    hits = ranked.select(
        "duration_seconds", "n",
        F.filter(targets, lambda t: t["k"] == F.col("rn")).alias("ts"),
    ).filter(F.size("ts") > 0)
    return (
        hits.select("n", "duration_seconds", F.explode("ts").alias("t"))
        .select(
            F.col("t.p").alias("p"), F.col("n").alias("n_sessions"),
            F.col("duration_seconds").alias("duration_s"),
        )
    )


def _sess_pct_oracle_sql() -> str:
    legs = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({p} AS INTEGER) AS p, n AS n_sessions,
               duration_seconds AS duration_s
        FROM ranked WHERE rn = ({p} * n + 99) // 100"""
        for p in SESS_PCTS
    )
    return f"""
        WITH sessions AS ({{sess}}),
        ranked AS (
            SELECT duration_seconds,
                   row_number() OVER (
                       ORDER BY duration_seconds ASC, user_id ASC,
                                session_seq ASC) AS rn,
                   CAST(count(*) OVER () AS BIGINT) AS n
            FROM sessions
        )
{legs}
    """


QUERIES = {
    "stream_windowed_counts": stream_windowed_counts,
    "sessionize_events": sessionize_batch,
    "sessionize_session_window": sessionize_session_window,
    "bounce_rate_daily": bounce_rate_daily,
    "hopping_window_counts": hopping_window_counts,
    "session_duration_percentiles": session_duration_percentiles,
}

ORACLE = {
    "stream_windowed_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2
    """,
    "sessionize_events": f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > {GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
                   AS duration_seconds
        FROM sess GROUP BY 1, 2
    """,
    # session_window boundary, verified EMPIRICALLY (round 5): Spark
    # MERGES an event arriving at exactly last_ts + gap (windows
    # [t, t+gap) and [t+gap, t+2gap) touch and Spark's merge rule is
    # start <= prev_end), so new-session is strict gap > GAP -- the
    # same formulation as sessionize_events. The previous ">=" read
    # the [start, last+gap) interval as exclusive and diverged on
    # exactly-gap-apart events (caught by a boundary row in the
    # null-robustness corpus).
    "sessionize_session_window": f"""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts)
                                > {GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WHERE ts IS NOT NULL  -- session_window drops null times
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_seq
    """,
}

ORACLE["hopping_window_counts"] = _hopping_oracle_sql()
ORACLE["session_duration_percentiles"] = _sess_pct_oracle_sql().format(
    sess=ORACLE["sessionize_events"]
)

ORACLE["bounce_rate_daily"] = f"""
    WITH sessions AS ({ORACLE["sessionize_events"]})
    SELECT substr(session_start, 1, 10) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM sessions GROUP BY substr(session_start, 1, 10)
"""
