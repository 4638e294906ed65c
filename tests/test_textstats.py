"""Oracle-parity for the text-analysis surface (textstats)."""

from __future__ import annotations

import pytest

from selfhosted_rag_doc_chat_prototype_spark.operators import textstats

from .helpers import assert_matches_oracle, duck_con


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(textstats.ORACLE))
def test_textstats_matches_oracle(name, spark, sf_dir, con):
    sdf = textstats.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(sdf, con, textstats.ORACLE[name], name)
