"""Fresh-JVM isolate for the STREAMING retrieval serve path (r12-VERDICT
item 3/6): the suite measures `retrieval_serve_p50_ms` at the END of a
190-query bench JVM, so its number carries whatever block-manager and
GC state the suite built up. This tool times the identical
`streaming_retrieval_evidence` probe in a fresh JVM, honoring
``SPARK_GRAFT_CPUS``/``SPARK_GRAFT_SF_DIR``, and prints one JSON line.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/serve_isolate.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench
    from selfhosted_rag_doc_chat_prototype_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="serve-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    out = dict(bench.streaming_retrieval_evidence(spark, sf_dir))
    out["cpus"] = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out["sf_dir"] = sf_dir
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
