"""Scale-step-up gate (r9 at 3x; r10 raises to 10x, r9-VERDICT item
3): run the frozen 30-query HEADLINE_CORE -- correctness gate AND
timed pass -- at a synthetic multiple of sf0.1 (10x ~= sf1), to
expose hidden sf0.1 assumptions (memory pressure, partition counts,
matview rebuild cost) the three-scale close gate (max sf0.1) cannot
see.

    python tools/scale_step_gate.py [--reps 10] [--keep]

The corpus is built from sf0.1 with the bench scale_evidence recipes
(every replica decorrelated so near-dup/shingle paths measure the
algorithm, not planted cross-replica duplicates):

- documents: replica r >= 1 applies a SEEDED HASH-SORT WORD
  PERMUTATION (positions ordered by md5(position # rep)), doc_id
  offset. Permutation -- not the bench's word-suffix trick -- because
  the suffix trick creates out-of-vocabulary pre-tokens that break
  the pinned BPE tokenizer's documented coverage precondition AND new
  character streams that can land float metrics on rounding
  boundaries; permuting keeps the exact word multiset (BPE coverage
  and every order-insensitive metric carry over) while scrambling the
  word k-grams the shingle/minhash/substring paths key on, for ANY
  replica count;
- embeddings: deterministic per-replica sign flips (mask distinct per
  rep <= 10), vec_id offset;
- events: event_id/user_id offsets (timestamps unchanged, so windowed
  plans see 3x density per window -- the harder case);
- orders/lineitem/customer/supplier/part: every key offset
  CONSISTENTLY across fact and dimension sides (foreign keys stay
  valid inside each replica); nation/region stay as-is (bounded
  dimensions).

Both engines read the SAME generated files, so the DuckDB oracle
compare is exact at the new scale. Results land in
``CORRECTNESS_scale_step.txt`` (gate lines) and
``BENCH_scale_step.json`` (per-query walls + total); close_round
merges the JSON into BENCH_local.json under ``scale_step``.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"


def build_corpus(spark, out_dir: str, reps: int) -> None:
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rep_df = spark.range(reps).select(F.col("id").alias("rep"))

    docs = table(spark, BASE_SF, "documents")
    w = r"filter(split(trim(text), '[ \\t\\n\\x0B\\f\\r]+'), x -> x <> '')"
    n = f"size({w})"

    # r10 (reps up to 10x): replica r >= 1 applies a SEEDED HASH-SORT
    # permutation -- word positions re-ordered by md5(position # rep).
    # Same exact word multiset as the original (BPE coverage and every
    # order-insensitive metric carry over, like the r9 hand permutations)
    # but valid for ANY rep count, and two replicas share word k-grams
    # only by md5 coincidence, so the shingle/minhash/substring paths
    # never see planted cross-replica near-dups.
    def perm_sql(rep: int) -> str:
        if rep == 0:
            return "text"
        order = (
            f"array_sort(transform(sequence(0, {n} - 1), "
            f"i -> struct(md5(concat(cast(i AS string), '#{rep}')) AS h, "
            "i AS i)))"
        )
        return f"array_join(transform({order}, s -> {w}[s.i]), ' ')"

    parts = []
    for rep in range(reps):
        t = F.expr(
            f"CASE WHEN text IS NULL OR {n} = 0 THEN text "
            f"ELSE {perm_sql(rep)} END")
        parts.append(docs.select(
            (F.col("doc_id") + rep * 10_000_000).alias("doc_id"),
            t.alias("text"), "lang", "source", "n_chars",
        ))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = table(spark, BASE_SF, "embeddings")
    # r10: flip mask (i+1)(rep+1) mod 11 < 4 -- distinct for every
    # rep <= 10 (rep+1 all distinct mod 11), so no two replicas are
    # sign-identical; the r9 period-3 mask made replicas r and r+3
    # EXACT vector duplicates, planting cross-replica dup clusters at
    # reps > 3
    emb.crossJoin(rep_df).select(
        (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(
                (F.col("rep") > 0)
                & (F.pmod((i + 1) * (F.col("rep") + 1), F.lit(11)) < 4),
                -x,
            ).otherwise(x),
        ).alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev = table(spark, BASE_SF, "events")
    ev.crossJoin(rep_df).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    key_shift = {
        "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 100_000_000},
        "lineitem": {"l_orderkey": 1_000_000_000, "l_partkey": 10_000_000,
                     "l_suppkey": 1_000_000},
        "customer": {"c_custkey": 100_000_000},
        "supplier": {"s_suppkey": 1_000_000},
        "part": {"p_partkey": 10_000_000},
    }
    for name, shifts in key_shift.items():
        t = table(spark, BASE_SF, name)
        cols = [
            ((F.col(c) + F.col("rep") * shifts[c]).alias(c)
             if c in shifts else F.col(c))
            for c in t.columns
        ]
        t.crossJoin(rep_df).select(*cols).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet")
    for name in ("nation", "region"):
        table(spark, BASE_SF, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated corpus dir")
    args = ap.parse_args()

    import bench
    from selfhosted_rag_doc_chat_prototype_spark.session import get_spark

    core = list(bench.HEADLINE_CORE)
    d = tempfile.mkdtemp(prefix=f"sparkgraft_sf0{args.reps}x_")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        print(f"== scale_step: building {args.reps}x sf0.1 corpus at {d} ==",
              flush=True)
        t0 = time.time()
        build_corpus(spark, d, args.reps)
        print(f"corpus built in {time.time() - t0:.1f}s", flush=True)

        # correctness gate: fresh subprocess/JVM, DuckDB oracle compare
        artifact = os.path.join(REPO, "CORRECTNESS_scale_step.txt")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/check_correctness.py"),
             "--out", artifact, d] + core,
            cwd=REPO,
        )
        if r.returncode != 0:
            raise SystemExit(f"scale_step gate FAILED (see {artifact})")
        with open(artifact) as f:
            oks = [ln for ln in f if ln.startswith("ok   ")]
        if len(oks) != len(core):
            raise SystemExit(
                f"scale_step artifact has {len(oks)} ok-lines, "
                f"expected {len(core)}")

        # timed pass: warm session, best-of-1 per query (the gate
        # already ran everything once in its own JVM; this measures
        # the core wall at the stepped scale)
        import __spark_entry__ as entry
        qs = entry.queries()
        timings = {}
        t0 = time.time()
        for name in core:
            tq = time.time()
            qs[name](spark, d).write.format("noop").mode(
                "overwrite").save()
            timings[name] = round(time.time() - tq, 3)
        wall = round(sum(timings.values()), 3)
        # r12 (r11-VERDICT item 5): stamp the live registry count so
        # close_round can verify the committed step artifact was struck
        # at the CLOSING registry, not an earlier intra-round state
        # (the r11 close carried a "261 registered" artifact at a 264
        # HEAD and nothing noticed)
        from selfhosted_rag_doc_chat_prototype_spark.plans.registry import (
            all_queries)

        out = {
            "metric": "headline_core_wall_seconds_scale_step",
            "value": wall,
            "unit": "sec",
            "reps_of_sf0.1": args.reps,
            "queries": timings,
            "gate": f"{len(oks)}/{len(core)} oracle-green",
            "registry_count": len(all_queries()),
        }
        with open(os.path.join(REPO, "BENCH_scale_step.json"), "w") as f:
            json.dump(out, f, sort_keys=True)
            f.write("\n")
        print(json.dumps(out, sort_keys=True))
        print(f"scale_step: ALL GREEN ({len(oks)}/{len(core)} at "
              f"{args.reps}x sf0.1, core wall {wall}s)")
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(d, ignore_errors=True)
        tag = hashlib.md5(d.encode()).hexdigest()[:8]
        for p in glob.glob(os.path.join(
                REPO, "spark-warehouse", "matview", f"*_{tag}")):
            shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
