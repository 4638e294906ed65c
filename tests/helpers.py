"""Shared oracle-compare helper mirroring the driver's correctness gate:
columns sorted by name, rows stringified (floats to 6 significant
digits), order-insensitive."""

from __future__ import annotations

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            elif v is None:
                v = "<null>"
            else:
                v = str(v)
            vals.append(v)
        out.append("|".join(vals))
    out.sort()
    return out


def assert_matches_oracle(sdf, con, sql: str, name: str = "query"):
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: schema mismatch {sorted(scols)} vs {sorted(ocols)}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sn, on = normalize(srows, scols), normalize(orows, ocols)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"{name}: value mismatch, first: {mismatches[:3]}"


def await_sink_rows(spark, query, table: str, predicate,
                    timeout: float = 120.0, grace: float = 2.0,
                    poll: float = 0.5):
    """Wait until the memory-sink ``table`` satisfies ``predicate`` (a
    callable over the collected rows), let one ``grace`` window pass so
    a buggy extra emission would still land, then stop the query.

    For availableNow queries whose stateful operator holds PENDING
    processing-time timeouts, Spark keeps the query alive waiting for
    the timeout trigger -- ``awaitTermination(t)`` burns its full
    budget (measured: 120 s in test_file_sentinel_stateful_stream for
    a stream whose output is complete after ~5 s). Polling the sink for
    the expected condition and stopping is the correct wait for those.
    Returns the final collected rows."""
    import time as _time

    deadline = _time.time() + timeout
    rows = []
    while _time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if predicate(rows):
            break
        if not query.isActive:
            break
        _time.sleep(poll)
    else:
        query.stop()
        raise AssertionError(
            f"sink {table} never satisfied predicate within {timeout}s; "
            f"last rows: {rows[:5]}")
    if query.isActive:
        _time.sleep(grace)
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        query.stop()
    return rows
