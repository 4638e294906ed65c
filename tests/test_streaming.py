"""Structured Streaming tests: real readStream runs (file source +
availableNow trigger), stateful ops, sentinel semantics, plus oracle
parity for the batch-expressible streaming queries."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from selfhosted_rag_doc_chat_prototype_spark.streaming import telemetry

from .helpers import assert_matches_oracle, await_sink_rows, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-materialize events as a parquet directory a file stream can
    watch (micro-timestamped ts, so rewrite through the loader)."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    d = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(d, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(4).write.parquet(d)
    return d


@pytest.mark.parametrize("name", sorted(telemetry.ORACLE))
def test_streaming_batch_queries_match_oracle(name, spark, sf_dir, con):
    sdf = telemetry.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, telemetry.ORACLE[name], name)


def test_windowed_agg_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """The same plan builder over readStream (availableNow, complete
    mode) must produce the batch answer."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    batch_df = table(spark, sf_dir, "events")
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        telemetry.windowed_counts_plan(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in telemetry.windowed_counts_plan(batch_df).collect()
    }
    assert got == want


def test_session_window_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """Native session_window over readStream (availableNow, complete
    mode) must produce the batch sessionization."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    batch_df = table(spark, sf_dir, "events")
    stream = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    q = (
        telemetry.session_window_plan(stream)
        .writeStream.format("memory")
        .queryName("sess_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_win").collect()
    )
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in telemetry.session_window_plan(batch_df).collect()
    )
    assert got == want


def test_stateful_user_stats_stream(spark, sf_dir, events_stream_dir):
    """applyInPandasWithState over a real stream: final per-user state
    must equal the batch aggregation."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    batch_df = table(spark, sf_dir, "events")
    stream = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    q = (
        telemetry.stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user is the final state
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM user_stats"
    ).collect()
    final = {}
    for r in rows:  # update mode re-emits; keep max-count row per user
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    want = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in batch_df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert {u: v[0] for u, v in final.items()} == {u: v[0] for u, v in want.items()}
    for u in want:
        assert abs(final[u][1] - want[u][1]) < 0.05


def test_file_completion_sentinel(spark):
    """ST3: only files whose observed chunk count reaches the sentinel's
    expected_chunks finalize."""
    rows = [("f1", 3, i) for i in range(3)] + [("f2", 5, i) for i in range(4)]
    df = spark.createDataFrame(
        rows, "source_file string, expected_chunks int, chunk_index int"
    )
    done = telemetry.file_completion_sentinel(df).collect()
    assert [(r.source_file, r.observed_chunks) for r in done] == [("f1", 3)]


def test_sessionize_gap_semantics(spark):
    """Synthetic per-user gaps: events 30 min apart stay in one
    session; a >1 h gap opens a new one."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (1, 2, base + dt.timedelta(minutes=30)),
        (1, 3, base + dt.timedelta(hours=3)),   # gap > 1 h -> new session
        (2, 4, base),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    df.createOrReplaceTempView("_sess_input")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        df.withColumn("new_session",
                      F.when(gap.isNull() | (gap > telemetry.GAP_SECONDS), 1)
                      .otherwise(0))
        .withColumn("session_seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    got = {(r.user_id, r.event_id): r.session_seq for r in sess.collect()}
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_file_sentinel_stateful_stream(spark, tmp_path):
    """ST3 over a real stream: only the file whose count reaches its
    sentinel emits 'complete'; the straggler stays in state."""
    rows = [("f1", 3, i) for i in range(3)] + [("f2", 5, i) for i in range(4)]
    src = str(tmp_path / "chunks")
    spark.createDataFrame(
        rows, "source_file string, expected_chunks long, chunk_index long"
    ).repartition(2).write.parquet(src)
    stream = spark.readStream.schema(
        "source_file string, expected_chunks long, chunk_index long"
    ).parquet(src)
    q = (
        telemetry.file_sentinel_stateful(stream)
        .writeStream.format("memory")
        .queryName("sentinel_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    # the straggler f2 holds a PENDING processing-time timeout, so the
    # availableNow query never self-terminates -- poll the sink for the
    # complete row instead of burning the full awaitTermination budget
    got = await_sink_rows(
        spark, q, "sentinel_out",
        lambda rows: any(r.status == "complete" for r in rows))
    assert [(r.source_file, r.observed_chunks, r.status) for r in got] == [
        ("f1", 3, "complete")
    ]


def test_file_sentinel_ttl_eviction_branch():
    """ST5: a timed-out key emits 'evicted' and clears its state
    (update fn driven directly with a fake GroupState)."""

    class FakeState:
        def __init__(self, value):
            self._v, self.removed = value, False
            self.hasTimedOut, self.exists = True, value is not None

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    # drive the inner update through the public builder's closure
    captured = {}

    class Capture:
        def groupBy(self, *a):
            return self

        def applyInPandasWithState(self, fn, *a, **k):
            captured["fn"] = fn
            return None

    telemetry.file_sentinel_stateful(Capture())
    state = FakeState((4, 5))
    out = list(captured["fn"](("f2",), iter([]), state))
    assert state.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["status"], row["observed_chunks"], row["expected_chunks"]) == (
        "evicted", 4, 5,
    )


def test_request_reply_stream_join(spark, sf_dir, tmp_path):
    """J7/ST8: the watermarked stream-stream join must produce exactly
    the batch interval-join pairs."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events")
    req_b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("key"), F.col("event_id").alias("req_id"),
        F.col("ts").alias("req_ts"))
    rep_b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("key"), F.col("event_id").alias("reply_id"),
        F.col("ts").alias("reply_ts"))
    d_req, d_rep = str(tmp_path / "req"), str(tmp_path / "rep")
    req_b.write.parquet(d_req)
    rep_b.write.parquet(d_rep)
    req_s = spark.readStream.schema(req_b.schema).parquet(d_req)
    rep_s = spark.readStream.schema(rep_b.schema).parquet(d_rep)
    q = (
        telemetry.request_reply_stream_join(req_s, rep_s)
        .writeStream.format("memory")
        .queryName("rr_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.key, r.req_id, r.reply_id, r.latency_seconds)
        for r in spark.sql("SELECT * FROM rr_join").collect()
    }
    want = {
        (r.key, r.req_id, r.reply_id, r.latency_seconds)
        for r in telemetry.request_reply_stream_join(req_b, rep_b).collect()
    }
    assert got == want and len(want) > 0


def test_binaryfile_stream_discovery(spark, tmp_path):
    """S1 streaming face: a staging directory watched as a file stream,
    with ST2 backpressure (maxFilesPerTrigger) splitting discovery into
    multiple micro-batches."""
    d = tmp_path / "staging"
    d.mkdir()
    for i in range(6):
        (d / f"doc{i}.txt").write_text(f"document number {i} body text")
    stream = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .option("maxFilesPerTrigger", 2)  # ST2: bounded per micro-batch
        .load(str(d))
        .selectExpr("path", "length")
    )
    batches = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: batches.append(df.count())
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batches) == 6
    assert len(batches) == 3 and all(b == 2 for b in batches)


def test_agent_last_seen_stream_matches_batch_stale_agents(
    spark, sf_dir, events_stream_dir
):
    """Streaming twin of the stale-agent snapshot: the per-agent
    last-heartbeat aggregation over readStream must yield the same
    offline set the batch stale_agents query reports."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.sessions import (
        AGENT_HEARTBEAT_TIMEOUT_S,
        stale_agents,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    batch_df = table(spark, sf_dir, "events")
    stream = spark.readStream.schema(batch_df.schema).parquet(events_stream_dir)
    q = (
        telemetry.agent_last_seen_plan(stream)
        .writeStream.format("memory")
        .queryName("agent_seen")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = {
        r.agent_id: r.last_seen_ts
        for r in spark.sql("SELECT * FROM agent_seen").collect()
    }
    now_ts = max(seen.values())
    stream_offline = {
        a for a, t in seen.items()
        if (now_ts - t).total_seconds() > AGENT_HEARTBEAT_TIMEOUT_S
    }
    batch_offline = {
        r.agent_id for r in stale_agents(spark, sf_dir).collect() if r.offline
    }
    assert stream_offline == batch_offline
    assert len(seen) == len(stale_agents(spark, sf_dir).collect())


def test_streaming_exact_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark admits each content hash once:
    a planted duplicate burst collapses to one row per distinct text,
    matching the batch dedup over the same data."""
    from pyspark.sql import Row

    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        streaming_exact_dedup_plan,
    )

    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        Row(doc_id=i, text=f"doc body {i % 4}",
            ingest_ts=base + dt.timedelta(seconds=i))
        for i in range(12)
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows).repartition(3).write.parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(src)
    q = (
        streaming_exact_dedup_plan(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_stream").collect()
    assert len(got) == 4                       # one per distinct body
    assert {r.text for r in got} == {f"doc body {i}" for i in range(4)}


def test_continuous_rollup_equals_batch(spark, sf_dir, events_stream_dir, tmp_path):
    """The incrementally maintained hourly rollup converges to the
    batch rollup over the same events, across TWO separate stream
    runs (late-arriving second half updates existing windows)."""
    from selfhosted_rag_doc_chat_prototype_spark import sinks
    from selfhosted_rag_doc_chat_prototype_spark.streaming.telemetry import (
        continuous_rollup_sink,
        windowed_counts_plan,
    )

    target = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(events_stream_dir)
        )
        q = continuous_rollup_sink(stream, target, ckpt)
        q.awaitTermination(240)

    run_stream()   # first pass consumes all current files
    run_stream()   # idempotent restart: checkpoint skips processed files

    got = sinks.read_table(spark, target).select(
        "window_start", "event_type", "n", "total_value"
    )
    expected = windowed_counts_plan(
        spark.read.schema(schema).parquet(events_stream_dir)
    )
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e


def test_funnel_stateful_equals_batch(spark, sf_dir, tmp_path):
    """Streaming funnel state equals the batch funnel's per-user step
    times when a user's events arrive time-ordered across micro-batches
    (fixture splits the stream at the median day)."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG)) AS c"
    ).collect()[0].c
    d = str(tmp_path / "funnel_stream")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        telemetry.funnel_stateful(stream)
        .writeStream.format("memory")
        .queryName("funnel_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, t1, t2, t3, step FROM funnel_state"
    ).collect()
    final = {}
    for r in rows:  # update mode re-emits; the highest step (then
        # latest emission order) is the final state snapshot
        if r.user_id not in final or r.step >= final[r.user_id].step:
            final[r.user_id] = r

    # batch twin: the analytics funnel's per-user correlated mins
    w1 = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    per = ev.groupBy("user_id").agg(w1.alias("t1"))
    ev2 = ev.join(per, "user_id")
    t2 = ev2.filter((F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))).groupBy("user_id").agg(
        F.min("ts").alias("t2"))
    ev3 = ev2.join(t2, "user_id", "left")
    t3 = ev3.filter((F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))).groupBy("user_id").agg(
        F.min("ts").alias("t3"))
    want = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in per.join(t2, "user_id", "left")
        .join(t3, "user_id", "left").collect()
    }
    assert set(final) == set(want)
    for u, (b1, b2, b3) in want.items():
        s = final[u]
        assert (s.t1, s.t2, s.t3) == (b1, b2, b3), f"user {u} diverges"


def test_funnel_delayed_equals_batch_under_reordering(spark, sf_dir, tmp_path):
    """The watermark-delayed funnel must equal the batch correlated-min
    funnel under ARBITRARY micro-batch reordering: events are split
    into files by hash parity (each user's events scattered across
    batches out of time order), where the ordered variant's first-touch
    greedy lock-in would diverge."""
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    d = str(tmp_path / "funnel_shuffled")
    # deterministic scatter: parity of md5(ts) splits each user's
    # timeline across the two micro-batches
    parts = ev.withColumn(
        "bucket", F.conv(F.substring(F.md5(F.col("ts").cast("string")), 1, 2),
                         16, 10).cast("int") % 2
    )
    parts.filter("bucket = 0").drop("bucket").coalesce(1).write.mode(
        "append").parquet(d)
    parts.filter("bucket = 1").drop("bucket").coalesce(1).write.mode(
        "append").parquet(d)

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        telemetry.funnel_stateful(stream, ordered=False, delay="365 days")
        .writeStream.format("memory")
        .queryName("funnel_delayed")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT user_id, t1, t2, t3, step FROM funnel_delayed"
    ).collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.step >= final[r.user_id].step:
            final[r.user_id] = r

    w1 = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    per = ev.groupBy("user_id").agg(w1.alias("t1"))
    ev2 = ev.join(per, "user_id")
    t2 = ev2.filter((F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))).groupBy("user_id").agg(
        F.min("ts").alias("t2"))
    ev3 = ev2.join(t2, "user_id", "left")
    t3 = ev3.filter((F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))).groupBy("user_id").agg(
        F.min("ts").alias("t3"))
    want = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in per.join(t2, "user_id", "left")
        .join(t3, "user_id", "left").collect()
    }
    assert set(final) == set(want)
    for u, (b1, b2, b3) in want.items():
        s = final[u]
        assert (s.t1, s.t2, s.t3) == (b1, b2, b3), f"user {u} diverges"


def test_funnel_delayed_ttl_bounds_state(spark, tmp_path):
    """With an event-time state TTL, a long replay over a growing user
    universe must NOT accumulate keyed state for every user ever seen:
    users idle past the TTL fold their buffer, emit a final snapshot,
    and evict. Asserts the state-store row count across the replay
    stays bounded by the active window, not the universe, while every
    user still got a correct final emission."""
    import datetime

    d = str(tmp_path / "funnel_ttl")
    base = datetime.datetime(2025, 1, 1)
    users_per_day, days = 30, 6
    rows = []
    for day in range(days):
        for i in range(users_per_day):
            uid = day * users_per_day + i
            t0 = base + datetime.timedelta(days=day, minutes=i)
            rows.append((uid, "view", t0))
            rows.append((uid, "click", t0 + datetime.timedelta(seconds=60)))
            rows.append((uid, "purchase",
                         t0 + datetime.timedelta(seconds=120)))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    for day in range(days):
        lo = base + datetime.timedelta(days=day)
        hi = base + datetime.timedelta(days=day + 1)
        (df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
         .coalesce(1).write.mode("append").parquet(d))

    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        telemetry.funnel_stateful(stream, ordered=False, delay="5 minutes",
                                  state_ttl="2 hours")
        .writeStream.format("memory")
        .queryName("funnel_ttl")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    assert state_rows, "no state metrics captured"
    total_users = users_per_day * days
    # bounded: never holds more than ~two day-slices of users at once
    assert max(state_rows) <= 2 * users_per_day + 5 < total_users
    # and eviction did not lose correctness: every user's final
    # emission reached step 3 with its own timestamps
    final = {}
    for r in spark.sql(
        "SELECT user_id, t1, t2, t3, step FROM funnel_ttl"
    ).collect():
        if r.user_id not in final or r.step >= final[r.user_id].step:
            final[r.user_id] = r
    assert len(final) == total_users
    assert all(r.step == 3 for r in final.values())


def test_scd2_stream_equals_batch_and_replay_converges(spark, sf_dir, tmp_path):
    """The incrementally merged SCD2 dimension equals the batch build
    over the same events when micro-batches are per-user time-ordered
    (fixture splits at the median ts), and re-running the whole stream
    against the already-built table (fresh checkpoint = full replay)
    converges to the identical table."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        SCD2_COLS,
        scd2_streaming_sink,
        scd2_user_segments,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("ts").isNotNull())
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG)) AS c"
    ).collect()[0].c
    d = str(tmp_path / "scd2_stream")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    target = str(tmp_path / "scd2_dim")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = scd2_streaming_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("ckpt1")
    expected = {tuple(r) for r in
                scd2_user_segments(spark, sf_dir).collect()}
    got = {tuple(r) for r in
           spark.read.parquet(target).select(*SCD2_COLS).collect()}
    assert got == expected

    # full replay with a fresh checkpoint: every event redelivered
    # against the existing table; at-least-once must converge
    run("ckpt2")
    got2 = {tuple(r) for r in
            spark.read.parquet(target).select(*SCD2_COLS).collect()}
    assert got2 == expected


def test_hll_stream_equals_batch_and_replay_converges(spark, sf_dir, tmp_path):
    """The streamed register table is IDENTICAL to the batch sketch
    (register-wise max merge == sketch of the union), the read-back
    estimates match the batch report exactly, and a full replay
    against the already-built table is a no-op."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        hll_registers_estimate,
        hll_streaming_sink,
        sketch_hll_distinct_users,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("ts").isNotNull())
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG))"
        " AS c"
    ).collect()[0].c
    d = str(tmp_path / "hll_stream")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    target = str(tmp_path / "hll_regs")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = hll_streaming_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("ckpt1")
    batch_est = {
        r.event_type: r.est_distinct
        for r in sketch_hll_distinct_users(spark, sf_dir).collect()
    }
    streamed = {
        r.event_type: r.est_distinct
        for r in hll_registers_estimate(
            spark.read.parquet(target)).collect()
    }
    assert streamed == batch_est
    regs1 = sorted(map(tuple, spark.read.parquet(target).collect()))
    run("ckpt2")  # fresh checkpoint: full replay over the same files
    regs2 = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert regs1 == regs2


def test_debounce_stream_equals_batch_operator(spark, sf_dir,
                                               events_stream_dir):
    """Round-6 verdict task #5a: event_debounce documents that its
    lag/running-sum merge rule equals session_window's -- assert it
    three ways: the session_window plan's BATCH face equals the
    operator row-for-row on the real corpus, and its STREAMING face
    (readStream, availableNow, complete mode) equals both."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        debounce_plan,
        event_debounce,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    batch_events = table(spark, sf_dir, "events")
    want = {tuple(r) for r in event_debounce(spark, sf_dir).collect()}
    got_batch = {tuple(r) for r in debounce_plan(batch_events).collect()}
    assert got_batch == want

    stream = (
        spark.readStream.schema(batch_events.schema)
        .parquet(events_stream_dir)
    )
    q = (
        debounce_plan(stream)
        .writeStream.format("memory").queryName("debounced")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_stream = {
        tuple(r) for r in spark.sql("SELECT * FROM debounced").collect()
    }
    assert got_stream == want


def test_debounce_boundary_row_merges_on_both_paths(spark, tmp_path):
    """A pair EXACTLY DEBOUNCE_SECONDS apart must merge into one burst
    on the batch operator AND through session_window streaming (the
    merge rule both sides pin: gap <= D merges, strict > splits)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        DEBOUNCE_SECONDS,
        debounce_plan,
    )

    rows = [
        (1, 1, "a", "2024-03-01 10:00:00", 1.0),
        (1, 2, "a", "2024-03-01 10:30:00", 1.0),   # exactly D after
        (1, 3, "a", "2024-03-01 11:00:01", 1.0),   # D+1 after: splits
        (2, 4, "a", "2024-03-01 10:00:00", 1.0),
        (2, 5, "a", "2024-03-01 10:00:01", 1.0),
    ]
    assert DEBOUNCE_SECONDS == 1800
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, "
              "ts_s string, value double"
    ).select("user_id", "event_id", "event_type",
             F.to_timestamp("ts_s").alias("ts"), "value")
    d = str(tmp_path / "boundary_events")
    ev.coalesce(1).write.parquet(d)

    want = {
        (1, "a", 1, "2024-03-01 10:00:00", 1, 1800),
        (1, "a", 3, "2024-03-01 11:00:01", 0, 0),
        (2, "a", 4, "2024-03-01 10:00:00", 1, 1),
    }
    got_batch = {tuple(r) for r in debounce_plan(
        spark.read.parquet(d)).collect()}
    assert got_batch == want

    stream = spark.readStream.schema(ev.schema).parquet(d)
    q = (
        debounce_plan(stream)
        .writeStream.format("memory").queryName("debounce_edge")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got_stream = {
        tuple(r)
        for r in spark.sql("SELECT * FROM debounce_edge").collect()
    }
    assert got_stream == want


def test_ohlc_stream_equals_batch_and_replay_converges(spark, sf_dir,
                                                       tmp_path):
    """Round-6 verdict task #5b: the incrementally maintained daily
    OHLC bars equal the batch query over the same events, and a full
    replay with a fresh checkpoint (every event redelivered against
    the existing table) converges to the identical table -- the
    continuous-rollup/scd2 sink methodology applied to OHLC."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        ohlc_daily_by_type,
        ohlc_rollup_sink,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG))"
        " AS c"
    ).collect()[0].c
    d = str(tmp_path / "ohlc_stream")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)

    target = str(tmp_path / "ohlc_bars")
    cols = ["event_type", "day", "open", "high", "low", "close",
            "n_events", "total_value"]

    def run(ckpt):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = ohlc_rollup_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("ckpt1")
    want = {tuple(r) for r in
            ohlc_daily_by_type(spark, sf_dir).collect()}
    got = {tuple(r) for r in
           spark.read.parquet(target).select(*cols).collect()}
    assert got == want

    run("ckpt2")
    got2 = {tuple(r) for r in
            spark.read.parquet(target).select(*cols).collect()}
    assert got2 == want


def test_minhash_dedup_stream_equals_batch_out_of_order_and_replay(
        spark, sf_dir, tmp_path):
    """The incrementally maintained dedup verdicts equal the batch
    first-seen flags (1) when files arrive in doc_id order, (2) when a
    later file carries LOWER doc_ids than an earlier one (the
    retro-flag path: previously-clean docs in touched buckets must
    flip to duplicate), and (3) after a full at-least-once replay
    (fresh checkpoint against the already-built index)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.dedup import (
        _near_corpus,
        dedup_lsh_firstseen,
        minhash_dedup_streaming_sink,
    )

    corpus = _near_corpus(spark, sf_dir)
    cut = corpus.selectExpr(
        "CAST(percentile(doc_id, 0.5) AS LONG) AS c").collect()[0].c

    expected = {tuple(r) for r in
                dedup_lsh_firstseen(spark, sf_dir).collect()}

    def run_case(tag, first, second):
        d = str(tmp_path / f"docs_{tag}")
        first.coalesce(1).write.mode("append").parquet(d)
        second.coalesce(1).write.mode("append").parquet(d)
        target = str(tmp_path / f"dedup_{tag}")

        def run(ckpt):
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1).parquet(d)
            )
            q = minhash_dedup_streaming_sink(
                stream, target, str(tmp_path / f"{tag}_{ckpt}"))
            q.awaitTermination(240)

        run("ckpt1")
        got = {tuple(r) for r in
               spark.read.parquet(target + "/verdicts").collect()}
        assert got == expected, f"case {tag}: stream != batch"
        run("ckpt2")
        got2 = {tuple(r) for r in
                spark.read.parquet(target + "/verdicts").collect()}
        assert got2 == expected, f"case {tag}: replay diverged"

    lo = corpus.filter(F.col("doc_id") <= cut).select("doc_id", "text")
    hi = corpus.filter(F.col("doc_id") > cut).select("doc_id", "text")
    run_case("inorder", lo, hi)
    # out-of-order: the HIGH half arrives first; every near-dup copy
    # (doc_id + 1000000) precedes its original, so the originals'
    # arrival must retro-flag the copies
    run_case("reversed", hi, lo)


def test_hopping_rollup_stream_equals_batch(spark, sf_dir,
                                            events_stream_dir, tmp_path):
    """The continuous rollup with a 15-minute slide converges to the
    batch hopping aggregation over the same events, including across
    an idempotent restart (checkpoint skips processed files)."""
    from selfhosted_rag_doc_chat_prototype_spark import sinks
    from selfhosted_rag_doc_chat_prototype_spark.streaming.telemetry import (
        continuous_rollup_sink,
        windowed_counts_plan,
    )

    target = str(tmp_path / "hoprollup")
    ckpt = str(tmp_path / "hopckpt")
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")

    def run_stream():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "2")
            .parquet(events_stream_dir)
        )
        q = continuous_rollup_sink(stream, target, ckpt,
                                   slide="15 minutes")
        q.awaitTermination(240)

    run_stream()
    run_stream()  # restart: must be a no-op

    got = {tuple(r) for r in sinks.read_table(spark, target).select(
        "window_start", "event_type", "n", "total_value").collect()}
    expected = {tuple(r) for r in windowed_counts_plan(
        spark.read.schema(schema).parquet(events_stream_dir),
        slide="15 minutes").collect()}
    assert got == expected


def test_hll_sink_replay_after_mid_flip_crash(spark, sf_dir, tmp_path):
    """ADVICE r7 scenario end-to-end: the process dies between
    _replace_dir's delete and rename (simulated by moving the target
    to its staging name), and the checkpoint then delivers only the
    NEXT batch -- the dangerous case, because without healing the
    merge sees "no table", treats history as empty, and commits a
    one-batch register table. With recover_replace_dir in the merge
    path the rebuilt table must equal the crash-free run."""
    import os

    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        hll_streaming_sink,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).filter(F.col("ts").isNotNull())
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG))"
        " AS c"
    ).collect()[0].c
    first = ev.filter(F.col("ts") <= F.lit(cut))
    second = ev.filter(F.col("ts") > F.lit(cut))
    d = str(tmp_path / "ev_files")
    first.coalesce(1).write.mode("append").parquet(d)

    schema = "user_id long, ts timestamp, event_id long, event_type string"
    target = str(tmp_path / "hll_regs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = hll_streaming_sink(stream, target, ckpt)
        q.awaitTermination(240)

    run()  # batch 1 committed to the checkpoint

    # crash window: a flip's staging was fully written, the target was
    # deleted, the rename never happened; the NEXT run's checkpoint
    # will deliver only the new file, never re-merging history
    shutil.move(target, target + "__hllstaging")
    assert not os.path.exists(target)
    second.coalesce(1).write.mode("append").parquet(d)

    run()  # same checkpoint: only the second file is delivered
    got = sorted(map(tuple, spark.read.parquet(target).collect()))

    # crash-free reference over the full corpus
    ref_target = str(tmp_path / "hll_regs_ref")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = hll_streaming_sink(stream, ref_target, str(tmp_path / "ckpt_ref"))
    q.awaitTermination(240)
    want = sorted(map(tuple, spark.read.parquet(ref_target).collect()))
    assert got == want


def test_cdc_stream_equals_batch_and_replay_converges(spark, sf_dir, tmp_path):
    """The incrementally folded CDC state equals the batch
    last-writer-wins apply over the same change feed REGARDLESS of
    delivery order (max_by over unique seq is order-free -- the feed
    is split by ORDER PARITY, not time, so cross-batch disorder is
    maximal), and a full fresh-checkpoint replay against the built
    table is a no-op. Tombstoned keys stay hidden by the read face but
    survive in stored state."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        cdc_apply_orders,
        cdc_state_read,
        cdc_streaming_sink,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ch = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    ).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("seq"),
        F.expr(
            "CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0 "
            "THEN 'D' WHEN o_orderkey % 3 = 0 THEN 'I' ELSE 'U' END"
        ).alias("op"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .alias("value_cents"),
    )
    d = str(tmp_path / "cdc_stream")
    # maximal disorder: even seqs first, odd seqs second
    ch.filter(F.col("seq") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(d)
    ch.filter(F.col("seq") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(d)

    schema = "key long, seq long, op string, value_cents long"
    target = str(tmp_path / "cdc_state")

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = cdc_streaming_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("ckpt1")
    expected = {
        (r.key, r.last_seq, r.last_op, r.value_cents)
        for r in cdc_apply_orders(spark, sf_dir).collect()
    }
    got = {
        (r.key, r.last_seq, r.last_op, r.value_cents)
        for r in cdc_state_read(spark, target).collect()
    }
    assert got == expected and got

    # tombstone winners are stored (replay safety), hidden on read
    stored = spark.read.parquet(target)
    n_tomb = stored.filter(F.col("op") == "D").count()
    assert stored.count() == len(got) + n_tomb

    # full replay with a fresh checkpoint converges (no resurrection,
    # no winner moving backwards)
    run("ckpt2")
    got2 = {
        (r.key, r.last_seq, r.last_op, r.value_cents)
        for r in cdc_state_read(spark, target).collect()
    }
    assert got2 == expected


def test_skyline_stream_equals_batch_and_replay_converges(
        spark, sf_dir, tmp_path):
    """The incrementally folded Pareto frontier equals the batch
    skyline regardless of arrival order (insert-only fold identity:
    skyline(skyline(S) u B) = skyline(S u B); the feed splits by
    doc_id parity = maximal disorder), and a full fresh-checkpoint
    replay against the built frontier is a no-op."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        skyline_quality_docs,
        skyline_streaming_sink,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    d = str(tmp_path / "sky_stream")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(d)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(d)

    target = str(tmp_path / "sky_frontier")

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = skyline_streaming_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("ckpt1")
    expected = {tuple(r) for r in
                skyline_quality_docs(spark, sf_dir).collect()}
    got = {tuple(r) for r in spark.read.parquet(target)
           .select("doc_id", "tok", "uniq_u").collect()}
    assert got == expected and got

    run("ckpt2")  # full replay: every doc redelivered
    got2 = {tuple(r) for r in spark.read.parquet(target)
            .select("doc_id", "tok", "uniq_u").collect()}
    assert got2 == expected


def test_m4_stream_equals_batch_and_replay_converges(spark, sf_dir,
                                                     tmp_path):
    """r11: the incrementally maintained fixed-window M4 points equal
    a batch pass with the same windows, and a full replay against the
    existing table converges -- the ohlc_rollup_sink methodology
    applied to the M4 downsample (the batch query's global-range
    buckets are data-dependent and deliberately NOT the streaming
    rule; see m4_rollup_sink's docstring)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.analytics import (
        m4_rollup_sink,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    cut = ev.selectExpr(
        "timestamp_micros(CAST(percentile(unix_micros(ts), 0.5) AS LONG))"
        " AS c"
    ).collect()[0].c
    d = str(tmp_path / "m4_stream")
    ev.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)
    ev.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(d)

    target = str(tmp_path / "m4_points")
    cols = ["event_type", "bucket_start", "n_points",
            "v_first", "ts_first_s", "v_min", "ts_min_s",
            "v_max", "ts_max_s", "v_last", "ts_last_s"]

    def run(ckpt):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(d)
        )
        q = m4_rollup_sink(stream, target, str(tmp_path / ckpt))
        q.awaitTermination(240)

    run("m4ckpt1")
    src = (
        ev.filter(F.col("value").isNotNull())
        .withColumn("s", F.expr("unix_micros(ts) div 1000000"))
    )
    tkey = F.struct(F.col("s"), F.col("event_id"), F.col("value"))
    vkey = F.struct(F.col("value"), F.col("s"), F.col("event_id"))
    want = {
        tuple(r) for r in (
            src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_points"),
                 F.min(tkey).alias("fst"), F.max(tkey).alias("lst"),
                 F.min(vkey).alias("lo"), F.max(vkey).alias("hi"))
            .select(
                "event_type",
                F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                .alias("bucket_start"),
                "n_points",
                F.col("fst").getField("value").alias("v_first"),
                F.col("fst").getField("s").cast("long").alias("ts_first_s"),
                F.col("lo").getField("value").alias("v_min"),
                F.col("lo").getField("s").cast("long").alias("ts_min_s"),
                F.col("hi").getField("value").alias("v_max"),
                F.col("hi").getField("s").cast("long").alias("ts_max_s"),
                F.col("lst").getField("value").alias("v_last"),
                F.col("lst").getField("s").cast("long").alias("ts_last_s"),
            ).collect()
        )
    }
    got = {tuple(r) for r in
           spark.read.parquet(target).select(*cols).collect()}
    assert got == want

    run("m4ckpt2")
    got2 = {tuple(r) for r in
            spark.read.parquet(target).select(*cols).collect()}
    assert got2 == want
