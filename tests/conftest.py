from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from selfhosted_rag_doc_chat_prototype_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
