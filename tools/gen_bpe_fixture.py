"""Train and commit the pinned BPE tokenizer fixture for the T5
budget-guarantee test (packaged at
``selfhosted_rag_doc_chat_prototype_spark/functions/bpe_merges.json`` so product code
never reads from tests/).

Trains on the pre-token frequency map of ALL testdata corpora (the
tokenizer-trained-on-the-serving-corpus scenario), to convergence --
every corpus pre-token becomes a single token, which is exactly the
condition under which the chunkers' pre-tokenizer budget bounds the
real-token budget (see functions/bpe.py). No network, pure Python.

Usage: python tools/gen_bpe_fixture.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from selfhosted_rag_doc_chat_prototype_spark.functions.bpe import (  # noqa: E402
    BPETokenizer,
    train_bpe,
)

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
OUT = ("/root/repo/selfhosted_rag_doc_chat_prototype_spark/functions/"
       "bpe_merges.json")


def main() -> int:
    import re

    import duckdb

    freqs: dict[str, int] = {}
    for d in SF_DIRS:
        rows = duckdb.sql(
            f"SELECT text FROM '{d}/documents.parquet'"
        ).fetchall()
        for (text,) in rows:
            for w in re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", text or ""):
                freqs[w] = freqs.get(w, 0) + 1

    merges = train_bpe(freqs)
    tok = BPETokenizer(merges)
    uncovered = [w for w in freqs if not tok.covers(w)]
    assert not uncovered, f"training did not converge: {uncovered[:10]}"
    tok.save(OUT)
    print(
        f"wrote {OUT}: {len(merges)} merges over {len(freqs)} pre-tokens, "
        f"full corpus coverage"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
