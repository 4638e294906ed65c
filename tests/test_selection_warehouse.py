"""Invariants for the selection / warehouse / sentence operators
beyond the oracle gate: the gate proves cross-engine parity; these
prove the MATH and the contracts (budget reached, envelope tile
bounds, SCD2 interval algebra, lossless sentence reassembly)."""

from __future__ import annotations

import re
from collections import defaultdict

from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
    TOKEN_BUDGET,
    quality_classifier_hashed,
    token_budget_sample,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.textstats import (
    text_sentence_split,
)
from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
    Z_BUCKET_SHIFT,
    scd2_user_segments,
    zorder_layout,
)

SF = "/root/testdata/sf0.001"


def test_classifier_feature_count_is_unigrams_plus_bigrams(spark):
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    scores = {
        r.doc_id: r for r in quality_classifier_hashed(spark, SF).collect()
    }
    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    assert len(scores) == len(docs)
    for d in docs:
        n_words = len(d.text.split()) if d.text else 0
        expect = n_words + max(0, n_words - 1)
        assert scores[d.doc_id].n_feats == expect, d.doc_id
        assert scores[d.doc_id].keep == (scores[d.doc_id].score_u > 0)


def test_classifier_is_content_keyed(spark):
    # identical text => identical score, regardless of doc_id
    a = sorted(
        (r.n_feats, r.score_u)
        for r in quality_classifier_hashed(spark, SF).collect()
    )
    b = sorted(
        (r.n_feats, r.score_u)
        for r in quality_classifier_hashed(spark, SF).collect()
    )
    assert a == b


def test_budget_sample_reaches_budget_per_source(spark):
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    picks = token_budget_sample(spark, SF).collect()
    by_source = defaultdict(list)
    for r in picks:
        by_source[r.source].append(r)
    totals = {
        r["source"]: r["t"]
        for r in table(spark, SF, "documents")
        .groupBy("source")
        .agg(
            F.sum(
                F.coalesce(
                    F.size(F.split(F.trim("text"), r"[ \t\n\x0B\f\r]+")),
                    F.lit(0),
                )
            ).alias("t")
        )
        .collect()
    }
    for source, rows in by_source.items():
        rows.sort(key=lambda r: r.pick_rank)
        cum = 0
        for r in rows:
            assert cum < TOKEN_BUDGET  # budget not yet exhausted before it
            cum += r.n_tokens
            assert r.cum_tokens == cum
        # the source either reached its budget or ran out of documents
        assert cum >= TOKEN_BUDGET or cum <= totals[source]


def test_budget_sample_stable_under_other_source_changes(spark, tmp_path):
    import duckdb

    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    sources = [
        r.source
        for r in table(spark, SF, "documents").select("source").distinct().collect()
    ]
    assert len(sources) >= 2
    keep_src = sorted(sources)[0]
    d = str(tmp_path)
    duckdb.sql(
        f"COPY (SELECT * FROM '{SF}/documents.parquet' WHERE source = "
        f"'{keep_src}') TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    full = {
        (r.doc_id, r.pick_rank)
        for r in token_budget_sample(spark, SF).collect()
        if r.source == keep_src
    }
    only = {
        (r.doc_id, r.pick_rank)
        for r in token_budget_sample(spark, d).collect()
    }
    assert full == only


def test_zorder_buckets_tile_both_dimensions(spark):
    rows = zorder_layout(spark, SF).collect()
    assert rows
    tile = 1 << (Z_BUCKET_SHIFT // 2)  # 64: each bucket is a 64x64 tile
    for r in rows:
        assert r.zkey_min >> Z_BUCKET_SHIFT == r.zbucket
        assert r.zkey_max >> Z_BUCKET_SHIFT == r.zbucket
        # the pruning property: one bucket bounds BOTH dimensions
        assert r.u16_max - r.u16_min < tile
        assert r.v16_max - r.v16_min < tile


def test_zorder_key_is_morton_interleave():
    def morton(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    # mirror of the generated SQL on a few probes
    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        _z_duck,
    )

    import duckdb

    for a, b in [(0, 0), (1, 0), (0, 1), (65535, 65535), (1234, 4321)]:
        got = duckdb.sql(
            f"SELECT {_z_duck()} FROM (SELECT {a}::BIGINT AS za, "
            f"{b}::BIGINT AS zb)"
        ).fetchone()[0]
        assert got == morton(a, b), (a, b)


def test_scd2_intervals_are_well_formed(spark):
    rows = scd2_user_segments(spark, SF).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, segs in by_user.items():
        segs.sort(key=lambda r: r.version)
        assert [s.version for s in segs] == list(range(1, len(segs) + 1))
        assert sum(1 for s in segs if s.is_current) == 1
        assert segs[-1].is_current and segs[-1].valid_to is None
        for prev, nxt in zip(segs, segs[1:]):
            # contiguous: each interval closes exactly where the next opens
            assert prev.valid_to == nxt.valid_from
            # compacted: consecutive segments always differ (null-safe)
            assert prev.segment != nxt.segment or (
                prev.segment is None) != (nxt.segment is None)


def test_sentence_split_reassembles_exactly(spark):
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    sents = defaultdict(list)
    for r in text_sentence_split(spark, SF).collect():
        sents[r.doc_id].append(r)
        assert r.n_chars == len(r.sentence)
        assert r.n_words == len(r.sentence.split())
    pat = re.compile(r"([.!?])[ \t\n\x0B\f\r]+")
    for d in table(spark, SF, "documents").select("doc_id", "text").collect():
        if d.text is None or d.text == "":
            assert d.doc_id not in sents
            continue
        got = sents[d.doc_id]
        got.sort(key=lambda r: r.sent_idx)
        assert [r.sent_idx for r in got] == list(range(len(got)))
        # marker consumed exactly the inter-sentence whitespace
        assert "".join(r.sentence for r in got) == pat.sub(r"\1", d.text)


def test_budget_sample_ansi_invariant(spark):
    """NULL-text token cost must be 0 under BOTH ANSI and legacy
    sizeOfNull semantics (legacy size(null) = -1 would silently
    corrupt the running budget)."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        budget_sample,
    )

    docs = spark.createDataFrame(
        [(1, "s0", "three words here"), (2, "s0", None), (3, "s0", "")],
        "doc_id int, source string, text string",
    )
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    try:
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            rows = {r.doc_id: r for r in budget_sample(docs).collect()}
            assert rows[2].n_tokens == 0 and rows[3].n_tokens == 0, ansi
            assert rows[1].n_tokens == 3, ansi
            # every doc fits the budget => all picked, cum is a prefix sum
            assert sorted(rows) == [1, 2, 3], ansi
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
        else:
            spark.conf.unset("spark.sql.ansi.enabled")


def test_zorder_write_prunes_files_end_to_end(spark, tmp_path):
    """The claim zorder_layout exists to make, proven on real files:
    write events z-ordered vs shuffled, then apply a two-dimensional
    box predicate the way a footer-reading scanner does (parquet
    row-group min/max stats on the RAW columns). The z-ordered layout
    must let the scanner skip most files; the shuffled layout skips
    none. Results stay identical on both layouts."""
    import glob

    import pyarrow.parquet as papq
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        zorder_write,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    ev = table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "events_z")
    spath = str(tmp_path / "events_shuffled")
    zorder_write(ev, zpath, n_files=32)
    # adversarial baseline: round-robin shuffle spreads every key
    # range over every file
    ev.repartition(32).write.parquet(spath)

    ULO, UHI, VLO, VHI = 10, 19, 100.0, 150.0

    def candidate_fraction(path):
        n_rg = n_cand = 0
        for fp in sorted(glob.glob(f"{path}/*.parquet")):
            md = papq.ParquetFile(fp).metadata
            names = [md.schema.column(i).name
                     for i in range(md.num_columns)]
            ui, vi = names.index("user_id"), names.index("value")
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                n_rg += 1
                us, vs = rg.column(ui).statistics, rg.column(vi).statistics
                if (us.min > UHI or us.max < ULO
                        or vs.min > VHI or vs.max < VLO):
                    continue  # a footer reader skips this row group
                n_cand += 1
        return n_cand, n_rg

    zc, zt = candidate_fraction(zpath)
    sc, st = candidate_fraction(spath)
    assert sc == st, "shuffled layout must have nothing to skip"
    assert zc / zt <= 0.25, (zc, zt)  # z-order: most row groups skipped

    pred = (
        (F.col("user_id").between(ULO, UHI))
        & (F.col("value").between(VLO, VHI))
    )
    a = {r.event_id for r in
         spark.read.parquet(zpath).filter(pred).collect()}
    b = {r.event_id for r in
         spark.read.parquet(spath).filter(pred).collect()}
    c = {r.event_id for r in ev.filter(pred).collect()}
    assert a == b == c and len(c) > 0


def test_table_profile_metrics_exact(spark):
    """Profile metrics recomputed directly must match the one-pass
    stack output (null fraction truncation included)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        PROFILE_SCALE,
        table_profile_documents,
    )

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "doc_id": [1, 2, 3],
            "text": ["ab", None, "wxyz"],
            "lang": ["en", "en", "de"],
            "source": ["s", "s", "s"],
            "n_chars": [2, 0, 4],
        }), f"{d}/documents.parquet")
        rows = {r.column: r
                for r in table_profile_documents(spark, d).collect()}
    t = rows["text"]
    assert (t.n_rows, t.n_null, t.n_distinct) == (3, 1, 2)
    assert t.null_frac_u == PROFILE_SCALE // 3
    assert t.avg_len_u == (2 + 4) * PROFILE_SCALE // 2
    assert (t.min_s, t.max_s) == ("ab", "wxyz")
    assert rows["doc_id"].n_null == 0
    assert rows["lang"].n_distinct == 2


def test_dsir_tilts_toward_target_language(spark):
    """DSIR's defining property: documents drawn from the target
    slice score a higher MEAN log-importance weight than the rest
    (their unigrams are exactly what the target bag model upweights),
    and weights are content-keyed integers (zero terms => zero
    weight)."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        dsir_importance_weights,
    )

    rows = dsir_importance_weights(spark, SF).collect()
    tgt = [r.weight_u for r in rows if r.is_target == 1 and r.n_terms]
    rest = [r.weight_u for r in rows if r.is_target == 0 and r.n_terms]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    for r in rows:
        if r.n_terms == 0:
            assert r.weight_u == 0 and r.log_weight == 0.0


def test_stratified_split_exact_allocation(spark):
    """Hamilton allocation: the holdout is EXACTLY floor(N/10) docs
    globally, every source's quota differs from n_s/10 by < 1 seat,
    and the assignment is deterministic."""
    from collections import Counter

    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        STRAT_DEN,
        STRAT_NUM,
        stratified_holdout_split,
    )

    rows = stratified_holdout_split(spark, SF).collect()
    n = len(rows)
    val = [r for r in rows if r.split == "val"]
    assert len(val) == n * STRAT_NUM // STRAT_DEN
    per_n = Counter(r.source for r in rows)
    per_v = Counter(r.source for r in val)
    for s, ns in per_n.items():
        exact = ns * STRAT_NUM / STRAT_DEN
        assert abs(per_v.get(s, 0) - exact) < 1.0, s
    again = {
        r.doc_id: r.split
        for r in stratified_holdout_split(spark, SF).collect()
    }
    assert all(again[r.doc_id] == r.split for r in rows)


def test_weighted_sample_tilts_toward_heavy_docs(spark):
    """ES sampling: exactly K rows, ranks are 1..K in key order, and
    the sampled docs' mean weight exceeds the corpus mean (the
    defining bias of weighted sampling)."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.selection import (
        ES_K,
        weighted_sample_es,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    rows = sorted(weighted_sample_es(spark, SF).collect(),
                  key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, ES_K + 1))
    keys = [r.key_u for r in rows]
    assert keys == sorted(keys, reverse=True)
    corpus_mean = (
        table(spark, SF, "documents")
        .agg(F.avg(F.greatest(F.col("n_chars"), F.lit(1))))
        .collect()[0][0]
    )
    sample_mean = sum(r.w for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_compaction_plan_sizing_identities(spark):
    """Ceiling-division identities: files cover the bytes, rows-per-
    file covers the rows, shares sum to 1."""
    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        COMPACT_TARGET_BYTES,
        compaction_plan,
    )

    rows = compaction_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_files >= 1
        assert r.n_files * COMPACT_TARGET_BYTES >= r.est_bytes
        assert (r.n_files - 1) * COMPACT_TARGET_BYTES < r.est_bytes
        assert r.rows_per_file * r.n_files >= r.n_rows
        assert r.merge_candidate == (1 if r.est_bytes * 2 < COMPACT_TARGET_BYTES else 0)
    assert abs(sum(r.bytes_share for r in rows) - 1.0) < 1e-9


def test_compaction_plan_executes_on_disk(spark, tmp_path):
    """Round-6 verdict task #4: the zorder_write methodology applied
    to the other warehouse-maintenance operator. Fragment the
    documents table on disk (many files per source), run the planner
    against the FRAGMENTED copy, execute it via
    apply_compaction_plan, and assert the post-state matches the
    plan's predicted bins exactly: files-per-source ==
    ceil(n_rows / rows_per_file), no file over rows_per_file rows,
    per-source fragmentation strictly reduced, content identical."""
    import glob as g

    import pyarrow.parquet as papq

    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        apply_compaction_plan,
        compaction_plan,
    )
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table

    # fragmented input: partitionBy(source) with a 16-way row shuffle
    # puts up to 16 small files in every source directory
    frag_sf = str(tmp_path / "frag_sf")
    docs = table(spark, SF, "documents")
    (docs.repartition(16, "doc_id").write
     .partitionBy("source").parquet(f"{frag_sf}/documents.parquet"))
    frag_counts = {
        s.split("source=")[-1]: len(g.glob(f"{s}/*.parquet"))
        for s in g.glob(f"{frag_sf}/documents.parquet/source=*")
    }
    assert frag_counts and max(frag_counts.values()) >= 8, frag_counts

    target = 2048  # bytes: forces multi-file plans per source at SF
    plan = compaction_plan(spark, frag_sf, target=target)
    plan_rows = {r.source: r for r in plan.collect()}
    assert plan_rows
    assert any(r.n_files > 1 for r in plan_rows.values())

    out = str(tmp_path / "compacted")
    frag_docs = spark.read.parquet(f"{frag_sf}/documents.parquet")
    apply_compaction_plan(frag_docs, plan, out)

    for source, r in plan_rows.items():
        expected_files = -(-r.n_rows // r.rows_per_file)  # ceil
        files = sorted(
            g.glob(f"{out}/source={source}/file_idx=*/*.parquet"))
        assert len(files) == expected_files, (source, r)
        # plan/actual bin parity: every bin within its row budget,
        # bins disjoint and exhaustive
        n_total = 0
        for fp in files:
            n = papq.ParquetFile(fp).metadata.num_rows
            assert 0 < n <= r.rows_per_file, (source, fp, n)
            n_total += n
        assert n_total == r.n_rows, source
        # compaction strictly reduced fragmentation for planned
        # sources whose file budget is below the fragment count
        if r.n_files < frag_counts[source]:
            assert len(files) < frag_counts[source], source

    # content round-trips (partition columns come back as strings/ints;
    # compare on the data columns)
    back = spark.read.parquet(out).select(*frag_docs.columns)
    assert back.count() == frag_docs.count()
    assert back.exceptAll(frag_docs).count() == 0
    assert frag_docs.exceptAll(back).count() == 0


def test_erase_customers_executes_the_impact_report(spark, sf_dir, tmp_path):
    """The cascade eraser's on-disk post-state matches the dry-run
    impact report exactly: per table, rows deleted == report's
    n_delete, and NO doomed key survives in any erased copy."""
    from pyspark.sql import functions as F

    from selfhosted_rag_doc_chat_prototype_spark.operators.warehouse import (
        ERASE_MOD,
        erase_customers,
        erasure_impact_report,
    )

    report = {r.table_name: r for r in
              erasure_impact_report(spark, sf_dir).collect()}
    dst = str(tmp_path / "erased")
    audit = {r.table_name: r for r in
             erase_customers(spark, sf_dir, dst).collect()}
    for t in ("customer", "orders", "lineitem"):
        assert audit[t].n_before == report[t].n_rows
        assert audit[t].n_deleted == report[t].n_delete
        assert audit[t].n_after == report[t].n_rows - report[t].n_delete
    # no doomed key survives the cascade
    c = spark.read.parquet(f"{dst}/customer.parquet")
    assert c.filter(F.col("c_custkey") % ERASE_MOD == 0).count() == 0
    o = spark.read.parquet(f"{dst}/orders.parquet")
    assert o.filter(F.col("o_custkey") % ERASE_MOD == 0).count() == 0
    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    from selfhosted_rag_doc_chat_prototype_spark.sources.tables import table
    all_doomed = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % ERASE_MOD == 0).select("o_orderkey")
    assert li.join(
        all_doomed, li["l_orderkey"] == all_doomed["o_orderkey"], "left_semi"
    ).count() == 0
