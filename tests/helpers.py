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
