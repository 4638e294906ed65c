"""Binary-file source + format dispatch (S1/S6).

The reference polls a staging directory and routes each file through a
chain-of-responsibility handler (PDF -> MP4 -> MP3 -> Text,
``handlers/base_handler.py:38-46``, ``workers/gatekeeper_logic.py:31-38``).
Here discovery is a ``binaryFile`` scan (batch) or file-source stream,
and dispatch is a ``when`` chain producing a ``file_type`` column --
Catalyst prunes the unused branches per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# chain order matters and mirrors the reference handler chain
_DISPATCH = [
    ("pdf", ["pdf"]),
    ("video", ["mp4", "mkv", "mov"]),
    ("audio", ["mp3", "wav", "m4a"]),
    ("text", ["txt", "md", "markdown"]),
    ("html", ["html", "htm"]),
]


def scan_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def with_file_type(df: DataFrame, path_col: str = "path") -> DataFrame:
    ext = F.lower(F.element_at(F.split(F.col(path_col), r"\."), -1))
    col = None
    for ftype, exts in _DISPATCH:
        cond = ext.isin(exts)
        col = F.when(cond, ftype) if col is None else col.when(cond, ftype)
    return df.withColumn("file_type", col.otherwise("unknown"))
