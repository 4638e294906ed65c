"""Poisson-bootstrap CI: oracle parity plus the statistical sanity
invariants (interval brackets are ordered, the point estimate lies in
or near the interval, replicate survival is near-complete for
non-trivial sources)."""

from __future__ import annotations

from selfhosted_rag_doc_chat_prototype_spark.operators import statistics as st

from .helpers import assert_matches_oracle, duck_con


def test_bootstrap_matches_oracle(spark, sf_dir):
    con = duck_con(sf_dir)
    try:
        assert_matches_oracle(
            st.bootstrap_mean_ci(spark, sf_dir), con,
            st.ORACLE["bootstrap_mean_ci"], "bootstrap_mean_ci",
        )
    finally:
        con.close()


def test_bootstrap_invariants(spark, sf_dir):
    rows = st.bootstrap_mean_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.ci_lo_scaled <= r.ci_hi_scaled
        assert 0 < r.n_reps <= st.BOOT_B
        # a 95% interval from B resamples should bracket the point
        # estimate for any non-degenerate source; allow the exact
        # boundary for single-doc sources (interval may be one point)
        assert r.ci_lo_scaled <= r.mean_scaled <= r.ci_hi_scaled or (
            r.n_docs == 1
        )
        if r.n_docs >= 5:
            # weight-0 wipeout probability ~ e^-n; for n >= 5 a dead
            # replicate is < 1%, so survival must be near-complete
            assert r.n_reps >= st.BOOT_B - 10
