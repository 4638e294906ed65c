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


def chat_session_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions = users; messages = events ordered by time with a
    deterministic role assignment; history trimmed to the newest
    MAX_SESSION_MSGS then rendered oldest-first."""
    ev = table(spark, sf_dir, "events")
    role = F.when(F.col("event_id") % 2 == 0, "user").otherwise("assistant")
    msg = F.concat(role, F.lit(":"), F.col("event_type"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    recent = (
        ev.select("user_id", "ts", "event_id", msg.alias("msg"))
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


def set_click_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clickers.intersect(buyers)


QUERIES = {
    "chat_session_history": chat_session_history,
    "interval_join_click_purchase": interval_join_click_purchase,
    "set_click_and_purchase_users": set_click_and_purchase_users,
}

ORACLE = {
    "chat_session_history": f"""
        WITH recent AS (
            SELECT user_id, ts, event_id,
                   (CASE WHEN event_id % 2 = 0 THEN 'user'
                         ELSE 'assistant' END) || ':' || event_type AS msg
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) <= {MAX_SESSION_MSGS}
        )
        SELECT user_id AS session_id,
               CAST(count(*) AS BIGINT) AS n_messages,
               string_agg(msg, ' | ' ORDER BY ts, event_id) AS history
        FROM recent GROUP BY user_id
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
