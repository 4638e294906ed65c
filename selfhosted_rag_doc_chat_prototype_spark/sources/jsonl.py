"""JSONL corpus source/sink -- the de-facto interchange format for
pretraining corpora (one JSON document per line, optionally
gzip-compressed, sharded across many files).

The reference stores documents in DuckDB/parquet only; this source is
part of the engine's training-data-pipeline surface: a user pointing
the curation operators (dedup / quality / packing) at a raw JSONL dump
needs a scan that

- takes an EXPLICIT schema (never ``inferSchema``: inference is a
  full extra pass over 100 TB and can widen types differently between
  dumps);
- is malformed-line tolerant (``PERMISSIVE`` with a
  ``_corrupt_record`` column) so one bad line in a billion doesn't
  kill the job, while still making the bad lines countable;
- parallelizes by file AND by byte range (uncompressed JSONL splits
  at line boundaries for free; gzip members are file-granular, which
  is why dumps ship as many ~100 MB shards -- document both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the common-crawl-style document record: the minimal contract the
# curation operators need. Extra keys in the input are simply ignored
# by the explicit schema (no inference pass).
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Scan a JSONL file/directory/glob with an explicit schema.

    PERMISSIVE mode: malformed lines produce a row with every schema
    field null and the raw line in ``_corrupt_record``; by default the
    corrupt rows are dropped (after being countable via
    ``keep_corrupt=True``)."""
    # StructType.add mutates in place -- build a fresh struct so the
    # caller's (often module-level) schema object is never widened
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_line_count(spark: SparkSession, path: str) -> int:
    """Count malformed lines as (non-blank lines) - (parsed rows).

    Spark refuses plans that read ONLY ``_corrupt_record`` from a raw
    JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    the documented workaround is caching the parsed frame, which is
    the wrong tool for a 100 TB dump. Two cheap counting scans (text
    line count and parsed-row count, both column-pruned, no data
    movement) give the same number."""
    non_blank = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .count()
    )
    parsed = (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .json(path)
        .count()
    )
    return non_blank - parsed


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write a corpus as sharded JSONL (one part file per partition --
    on a cluster, size shards so each lands ~100 MB compressed)."""
    if shards:
        df = df.repartition(shards)
    df.write.mode("overwrite").json(path)
