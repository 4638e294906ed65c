"""Session-domain operators (SURVEY.md sections 2.1 S9, 2.7, 2.10
ST11, 2.5 J7):

- **chat_session_history**: the reference keeps chat sessions as Redis
  lists of ``{role, content}`` messages, trimmed to the last
  ``MAX_SESSION_TURNS*2 = 40`` entries
  (``services/chat_session_service.py:29-62``, default
  ``shared/defaults.py:102``). Here: per-session last-40 trim via a
  ranked window, then an ordered in-row history rendering.
- **interval_join_click_purchase**: the reference's request-reply
  correlation joins OCR/Whisper jobs to replies by id within a TTL
  (``utils/ocr_utils.py:60-112``, 300 s reply-key expiry). Re-expressed
  as an event-time INTERVAL JOIN: each click joined to the same user's
  purchases within the following 10 minutes -- the batch face of the
  watermarked stream-stream join in ``streaming/telemetry.py``.
- **set_click_and_purchase_users**: INTERSECT over user sets (the
  set-operation face of the dup-check semi-joins J3).

Scale shape: the session trim shuffles once on session key and state
per key is bounded (40 rows); the interval join is an equi-join on
user_id with a range predicate -- co-partitioned by key, never a cross
join; INTERSECT is two pruned distinct scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import table

MAX_SESSION_MSGS = 40  # MAX_SESSION_TURNS*2 (shared/defaults.py:102)
REPLY_WINDOW_MIN = 10
SESSION_TTL_HOURS = 24  # DEFAULT_SESSION_TTL_HOURS (shared/defaults.py:103)
AGENT_HEARTBEAT_TIMEOUT_S = 60  # shared/defaults.py:9


def _history(ev: DataFrame) -> DataFrame:
    """Per-session last-``MAX_SESSION_MSGS`` trim + ordered render."""
    role = F.when(F.col("event_id") % 2 == 0, "user").otherwise("assistant")
    # NULL-safe rendering: a typeless message renders as "role:" (a
    # NULL inside concat would null the whole msg), and a message
    # without a timestamp cannot be recency-ordered -- excluded on
    # both sides (array_sort's null-field placement differs from the
    # oracle's ORDER BY null ordering)
    msg = F.concat(role, F.lit(":"),
                   F.coalesce(F.col("event_type"), F.lit("")))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", msg.alias("msg"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MAX_SESSION_MSGS)
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "msg"))),
        lambda x: x["msg"],
    )
    return recent.groupBy(F.col("user_id").alias("session_id")).agg(
        F.count("*").alias("n_messages"),
        F.array_join(ordered, " | ").alias("history"),
    )


def chat_session_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions = users; messages = events ordered by time with a
    deterministic role assignment; history trimmed to the newest
    MAX_SESSION_MSGS then rendered oldest-first."""
    return _history(table(spark, sf_dir, "events"))


def chat_session_history_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST11 with the reference's TTL: a session expires
    ``SESSION_TTL_HOURS`` after its LAST activity
    (``chat_session_service.py:14-27`` re-arms ``client.expire(key,
    SESSION_TTL_HOURS*3600)`` on every touch). Batch face: evict
    sessions whose newest message is older than 24 h relative to the
    stream's max ts (the deterministic "now" anchor), then trim+render
    as usual. The eviction is a broadcast semi-join on session key --
    same shape as the anti-join cleanup J2."""
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    live = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(anchor))
        .filter(
            F.col("last_ts")
            >= F.col("now_ts") - F.expr(f"INTERVAL {SESSION_TTL_HOURS} HOURS")
        )
        .select("user_id")
    )
    return _history(ev.join(F.broadcast(live), "user_id", "left_semi"))


def stale_agents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mqtt hub's stale-agent snapshot (``mqtt/registry.py:82-95``
    ``prune_stale``: agents with no heartbeat for
    ``AGENT_HEARTBEAT_TIMEOUT`` seconds flip to offline). Agents =
    per-user event streams; "now" anchors at the stream max ts. One
    groupBy(max) + broadcast anchor -- map-side partial agg, no
    second shuffle."""
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    gap = F.unix_timestamp("now_ts") - F.unix_timestamp("last_seen_ts")
    return (
        ev.groupBy(F.col("user_id").alias("agent_id"))
        .agg(F.max("ts").alias("last_seen_ts"))
        .crossJoin(F.broadcast(anchor))
        .select(
            "agent_id",
            F.date_format("last_seen_ts", "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            gap.alias("seconds_since_seen"),
            (gap > AGENT_HEARTBEAT_TIMEOUT_S).alias("offline"),
        )
    )


def interval_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("buyer_id"),
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts"),
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("buyer_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts")
           <= F.col("click_ts") + F.expr(f"INTERVAL {REPLY_WINDOW_MIN} MINUTES")),
    )
    return joined.select(
        "user_id", "click_id", "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts"))
        .alias("reply_seconds"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """AS-OF join: each ``left`` row picks up the MOST RECENT ``right``
    row with the same key and ``right.ts <= left.ts`` -- the operator
    Spark's join zoo lacks (and the classic time-series/point-in-time
    lookup). Implemented as the scale-safe UNION + WINDOW form: tag
    both sides, union, one per-key window ordered by (ts, side) with
    ``last(..., ignorenulls)`` carrying right-side values forward onto
    left rows.

    Why not a range join: `l.ts >= r.ts` without an upper bound makes
    every range/theta join quadratic per key (each left row matches ALL
    earlier right rows, then a max-reduction throws the work away). The
    union form is ONE shuffle on the key and a single ordered pass per
    partition -- O(n log n) in the key's rows, no pair blow-up, and
    exactly how the streaming forward-fill variant behaves under
    watermarks. Ties (equal ts): the right row sorts BEFORE the left
    row at the same instant, so a same-timestamp right row is visible
    (ASOF >= semantics, matching DuckDB's ASOF JOIN).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    allc = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = allc.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    keep = [c for c in left.columns] + [
        F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols
    ]
    return filled.filter(F.col("_side") == 1).select(*keep)


def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face: every click annotated with the user's most recent
    purchase value at-or-before the click instant (NULL when none yet)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    # one row per (user, instant): equal-timestamp purchases collapse to
    # max(value) so the as-of pick is deterministic in both engines
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, buys, on="user_id", ts_col="ts",
                    value_cols=["purchase_value"])
    return out.select(
        "user_id", "click_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("asof_purchase_value", 2).alias("last_purchase_value"),
    )


ATTR_WINDOW_S = 7 * 24 * 3600  # last-touch attribution lookback


def funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION: every purchase credits the most recent
    preceding marketing touch (view or click) by the same user within
    ``ATTR_WINDOW_S``; purchases whose nearest touch is older than the
    window (or who have none) report under the ``unattributed``
    channel -- the standard marketing-funnel rollup a product
    warehouse serves, built on the same as-of machinery as
    :func:`asof_join_last_purchase`.

    Determinism: equal-instant touches collapse by ``max_by(type,
    event_id)`` (one row per (user, ts), both engines); revenue
    accumulates in exact BIGINT micro-units and divides ONCE on emit.
    NULL-user purchases are excluded on both sides (an identity-less
    row cannot be attributed; NULL keys would also group in Spark
    windows but never equi-match in an ASOF join -- the one NULL
    convention the two forms disagree on).

    Scale shape: the as-of pick is the union + per-user window form
    (ONE shuffle, no unbounded range join -- see :func:`asof_join`);
    the channel rollup is a partial-agg groupBy emitting
    channel-cardinality rows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch_type"))
        .withColumn("touch_ts", F.col("ts"))
    )
    j = asof_join(purchases, touches, on="user_id", ts_col="ts",
                  value_cols=["touch_type", "touch_ts"])
    in_window = (
        F.col("asof_touch_ts").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("asof_touch_ts")
           <= ATTR_WINDOW_S * 1_000_000)
    )
    channel = F.when(in_window, F.col("asof_touch_type")).otherwise(
        F.lit("unattributed")
    )
    rev_u = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)) \
        .cast("long")
    return (
        j.select(channel.alias("channel"), rev_u.alias("rev_u"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("rev_u").cast("long").alias("revenue_u"),
        )
        .select(
            "channel", "n_purchases", "revenue_u",
            (F.col("revenue_u").cast("double") / 1e6).alias("revenue"),
        )
    )


def set_click_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


QUERIES = {
    "chat_session_history": chat_session_history,
    "chat_session_history_ttl": chat_session_history_ttl,
    "stale_agents": stale_agents,
    "interval_join_click_purchase": interval_join_click_purchase,
    "asof_join_last_purchase": asof_join_last_purchase,
    "funnel_attribution": funnel_attribution,
    "set_click_and_purchase_users": set_click_and_purchase_users,
}

ORACLE = {
    "funnel_attribution": f"""
        WITH p AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE event_type = 'purchase'
              AND ts IS NOT NULL AND user_id IS NOT NULL
        ),
        t AS (
            SELECT user_id, ts, max_by(event_type, event_id) AS touch_type
            FROM events
            WHERE event_type IN ('view', 'click')
              AND ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY 1, 2
        ),
        j AS (
            SELECT p.value, t.touch_type, t.ts AS touch_ts, p.ts AS pts
            FROM p ASOF LEFT JOIN t
              ON p.user_id = t.user_id AND p.ts >= t.ts
        ),
        ch AS (
            SELECT CASE WHEN touch_ts IS NOT NULL
                         AND epoch_us(pts) - epoch_us(touch_ts)
                             <= {ATTR_WINDOW_S * 1_000_000}
                        THEN touch_type ELSE 'unattributed' END AS channel,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS rev_u
            FROM j
        )
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(rev_u) AS BIGINT) AS revenue_u,
               CAST(sum(rev_u) AS DOUBLE) / 1e6 AS revenue
        FROM ch GROUP BY channel
    """,
    "asof_join_last_purchase": """
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts FROM events
            WHERE event_type = 'click'
        ),
        buys AS (
            SELECT user_id, ts, max(value) AS purchase_value FROM events
            WHERE event_type = 'purchase' GROUP BY 1, 2
        )
        SELECT c.user_id, c.click_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               round(b.purchase_value, 2) AS last_purchase_value
        FROM clicks c
        ASOF LEFT JOIN buys b
            ON c.user_id = b.user_id AND c.ts >= b.ts
    """,
    "chat_session_history": f"""
        WITH recent AS (
            SELECT user_id, ts, event_id,
                   (CASE WHEN event_id % 2 = 0 THEN 'user'
                         ELSE 'assistant' END) || ':'
                       || coalesce(event_type, '') AS msg
            FROM events
            WHERE ts IS NOT NULL
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) <= {MAX_SESSION_MSGS}
        )
        SELECT user_id AS session_id,
               CAST(count(*) AS BIGINT) AS n_messages,
               string_agg(msg, ' | ' ORDER BY ts, event_id) AS history
        FROM recent GROUP BY user_id
    """,
    "chat_session_history_ttl": f"""
        WITH anchor AS (SELECT max(ts) AS now_ts FROM events),
        live AS (
            SELECT user_id FROM events, anchor
            GROUP BY user_id, now_ts
            HAVING max(ts) >= now_ts - INTERVAL {SESSION_TTL_HOURS} HOURS
        ),
        recent AS (
            SELECT e.user_id, e.ts, e.event_id,
                   (CASE WHEN e.event_id % 2 = 0 THEN 'user'
                         ELSE 'assistant' END) || ':'
                       || coalesce(e.event_type, '') AS msg
            FROM events e JOIN live USING (user_id)
            WHERE e.ts IS NOT NULL
            QUALIFY row_number() OVER (
                PARTITION BY e.user_id ORDER BY e.ts DESC, e.event_id DESC
            ) <= {MAX_SESSION_MSGS}
        )
        SELECT user_id AS session_id,
               CAST(count(*) AS BIGINT) AS n_messages,
               string_agg(msg, ' | ' ORDER BY ts, event_id) AS history
        FROM recent GROUP BY user_id
    """,
    "stale_agents": f"""
        WITH anchor AS (SELECT max(ts) AS now_ts FROM events)
        SELECT user_id AS agent_id,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
               CAST(date_diff('second', max(ts), now_ts) AS BIGINT)
                   AS seconds_since_seen,
               date_diff('second', max(ts), now_ts)
                   > {AGENT_HEARTBEAT_TIMEOUT_S} AS offline
        FROM events, anchor
        GROUP BY user_id, now_ts
    """,
    "interval_join_click_purchase": f"""
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
               CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS reply_seconds
        FROM events c
        JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL {REPLY_WINDOW_MIN} MINUTES
    """,
    "set_click_and_purchase_users": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
}
