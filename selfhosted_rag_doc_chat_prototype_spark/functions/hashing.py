"""Deterministic ID/hash generation (T8).

The reference content-addresses everything with murmur3:
``document_id = "DOC_" + hex(mmh3(file_bytes) & 0xFFFFFFFF)`` and
``chunk_id = f"{document_id}_{hex(mmh3(chunk_text))}"``
(``processors/text_processor.py:150-185``). Those ids are the dedup /
idempotency key, so exact parity matters. The ``mmh3`` package is not
in-container, so ``murmur3_32`` below is a self-contained implementation
of the public MurmurHash3 x86 32-bit algorithm (Austin Appleby, public
domain), validated against published test vectors in the test suite.

For the oracle-checked SQL surface we expose an md5-based variant
(``content_doc_id_col``) computable identically in Spark and DuckDB;
the mmh3 path is used by the ingest DAG where reference-id parity is
the goal.
"""

from __future__ import annotations

import struct as _struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def murmur3_32(data: bytes | str, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit, unsigned result."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~0x3
    # one struct.unpack replaces a bytes-slice + int.from_bytes per
    # 4-byte word (~2x on the pure-Python body; same words, same math)
    words = _struct.unpack(f"<{rounded >> 2}I", data[:rounded])
    for k in words:
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[rounded:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def mmh3_doc_id(content: bytes | str) -> str:
    """Reference document id, byte-exact (text_processor.py:175-178):
    ``"DOC_" + hex(mmh3.hash(file_bytes) & 0xFFFFFFFF)[2:].upper().zfill(8)``
    -- UPPERCASE, zero-padded to 8, hashed over the ORIGINAL file bytes."""
    return "DOC_" + format(murmur3_32(content) & 0xFFFFFFFF, "08X")


def mmh3_chunk_id(doc_id: str, chunk_text: str) -> str:
    """Reference chunk id, byte-exact (text_processor.py:180-185):
    ``f"{context}_{hex(mmh3.hash(chunk.encode()) & 0xFFFFFFFF)[2:].lower().zfill(8)}"``
    -- lowercase, zero-padded to 8 (an unpadded format drops leading
    zeros for ~1/16 of chunks and breaks cross-system id joins)."""
    return f"{doc_id}_{format(murmur3_32(chunk_text) & 0xFFFFFFFF, '08x')}"


def mmh3_content_hash(text: bytes | str) -> str:
    """Reference chunk content hash (text_processor.py:154):
    ``hex(mmh3.hash(text) & 0xFFFFFFFF)[2:].upper().zfill(8)``."""
    return format(murmur3_32(text) & 0xFFFFFFFF, "08X")


def doc_id_udf():
    """Lazy factory: pandas_udf return types parse against the active
    session, so build at call time, not import time."""

    @pandas_udf("string")
    def _doc_id(content: pd.Series) -> pd.Series:
        return content.map(mmh3_doc_id)

    return _doc_id


def chunk_id_udf():
    @pandas_udf("string")
    def _chunk_id(doc_id: pd.Series, chunk: pd.Series) -> pd.Series:
        return pd.Series([mmh3_chunk_id(d, c) for d, c in zip(doc_id, chunk)])

    return _chunk_id


# ---- murmur3_32 as inline DuckDB SQL (oracle twin of the mmh3 ids) -------
#
# The ingest DAG's ids are reference-parity mmh3 (above); DuckDB has no
# murmur3 builtin and the driver's oracle connection cannot register
# Python UDFs, so the oracle computes the hash IN SQL: bytes via
# hex(encode(..)), 4-byte little-endian blocks, and the block mixer as
# a list_reduce fold -- exact 32-bit arithmetic (HUGEINT products
# masked mod 2^32), validated in tests against :func:`murmur3_32` and
# its published vectors. Cost is O(len) lambda evaluations per row:
# fine for an oracle twin, never used on the Spark serving path.

def _let(name: str, val: str, body: str) -> str:
    """SQL let-binding: evaluate ``val`` once, reference it as ``name``
    in ``body`` (single-element list_transform)."""
    return f"list_transform([{val}], {name} -> {body})[1]"


def _mul32(e: str, c: int) -> str:
    # k*c overflows BIGINT for k near 2^32; widen, mask, narrow
    return f"CAST((CAST({e} AS HUGEINT) * {c}) % 4294967296 AS BIGINT)"


def _rotl32(name: str, r: int) -> str:
    # name must be a let-bound var (referenced twice); the two parts
    # are bit-disjoint so | == +
    return (f"(({name} * {1 << r}) % 4294967296"
            f" + {name} // {1 << (32 - r)})")


def murmur3_32_sql(expr: str) -> str:
    """Inline DuckDB expression computing ``murmur3_32(utf8(expr))``
    (unsigned, seed 0) -- the exact twin of :func:`murmur3_32`."""
    block_body = _let(
        "mk1", _mul32("mk", 0xCC9E2D51),
        _let("mk2", _rotl32("mk1", 15),
             _let("mk3", _mul32("mk2", 0x1B873593),
                  _let("mh1", "xor(mh, mk3)",
                       _let("mh2", _rotl32("mh1", 13),
                            "(mh2 * 5 + 3864292196) % 4294967296")))))
    tail_mix = _let(
        "mt1", _mul32("mtk", 0xCC9E2D51),
        _let("mt2", _rotl32("mt1", 15), _mul32("mt2", 0x1B873593)))
    fmix = _let(
        "mf1", "xor(mhh, mn)",
        _let("mf2", "xor(mf1, mf1 // 65536)",
             _let("mf3", _mul32("mf2", 0x85EBCA6B),
                  _let("mf4", "xor(mf3, mf3 // 8192)",
                       _let("mf5", _mul32("mf4", 0xC2B2AE35),
                            "xor(mf5, mf5 // 65536)")))))
    hexv = "strpos('0123456789ABCDEF', mhx[mp]) - 1"
    hexv2 = "strpos('0123456789ABCDEF', mhx[mp + 1]) - 1"
    return _let(
        "mhx", f"hex(encode({expr}))",
        _let(
            "mb",
            f"list_transform(range(1, length(mhx) + 1, 2),"
            f" mp -> ({hexv}) * 16 + ({hexv2}))",
            _let(
                "mn", "len(mb)",
                _let(
                    "mh0",
                    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
                    " list_transform(range(mn // 4), mj ->"
                    " mb[4*mj + 1] + mb[4*mj + 2] * 256"
                    " + mb[4*mj + 3] * 65536 + mb[4*mj + 4] * 16777216)),"
                    f" (mh, mk) -> {block_body})",
                    _let(
                        "mtk",
                        "CASE WHEN mn % 4 >= 1 THEN mb[(mn // 4)*4 + 1]"
                        " ELSE 0 END"
                        " + CASE WHEN mn % 4 >= 2 THEN"
                        " mb[(mn // 4)*4 + 2] * 256 ELSE 0 END"
                        " + CASE WHEN mn % 4 = 3 THEN"
                        " mb[(mn // 4)*4 + 3] * 65536 ELSE 0 END",
                        _let(
                            "mhh",
                            "CASE WHEN mn % 4 = 0 THEN mh0"
                            f" ELSE xor(mh0, {tail_mix}) END",
                            fmix))))))


def mmh3_doc_id_sql(expr: str) -> str:
    """SQL twin of :func:`mmh3_doc_id` over the utf8 bytes of expr."""
    return f"('DOC_' || printf('%08X', {murmur3_32_sql(expr)}))"


def mmh3_chunk_id_sql(doc_id_expr: str, chunk_expr: str) -> str:
    """SQL twin of :func:`mmh3_chunk_id`."""
    return (f"({doc_id_expr} || '_'"
            f" || printf('%08x', {murmur3_32_sql(chunk_expr)}))")


# ---- uuid point ids (K1 idempotency) -------------------------------------
# The reference converts string chunk ids to deterministic UUIDs for the
# vector store: ``uuid.uuid5(uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8"),
# str(id_))`` (services/database.py:260-268; the namespace is RFC 4122
# NAMESPACE_DNS). uuid5 is sha1-based: Spark has sha1 (so the distributed
# column below is byte-exact with uuid.uuid5) but DuckDB does not, so the
# oracle-checked query surface uses the md5-based uuid3 twin (identical
# construction, version nibble 3) computable in both engines.

UUID_NAMESPACE = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"
_NS_BYTES = bytes.fromhex(UUID_NAMESPACE.replace("-", ""))


def uuid5_point_id(id_: str) -> str:
    import uuid

    return str(uuid.uuid5(uuid.UUID(UUID_NAMESPACE), str(id_)))


def _rfc4122_col(hex32: Column, version: str) -> Column:
    """Format the first 32 hex chars of a digest as an RFC 4122 UUID:
    patch the version nibble (13th hex char) and the variant nibble
    (17th -> one of 89ab, keeping its low 2 bits)."""
    h = F.lower(hex32)
    variant = F.substring(
        F.lit("89ab"),
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1,
        1,
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit(version), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def uuid5_col(name: Column) -> Column:
    """Distributed ``uuid.uuid5(NAMESPACE_DNS, name)`` -- byte-exact
    (golden-tested against the stdlib), pure codegen expressions."""
    digest = F.sha1(F.concat(F.lit(_NS_BYTES), F.encode(name, "utf-8")))
    return _rfc4122_col(F.substring(digest, 1, 32), "5")


def uuid3_col(name: Column) -> Column:
    """md5-based uuid3 twin of :func:`uuid5_col` -- byte-exact with
    ``uuid.uuid3(NAMESPACE_DNS, name)`` (golden-tested)."""
    digest = F.md5(F.concat(F.lit(_NS_BYTES), F.encode(name, "utf-8")))
    return _rfc4122_col(digest, "3")


def uuid_md5_col(name: Column) -> Column:
    """Namespace-free md5 uuid (version nibble 3): the ORACLE-checkable
    point-id variant -- DuckDB's md5 only accepts VARCHAR, so the
    RFC 4122 namespace bytes (not valid UTF-8) cannot cross its string
    boundary; exact ``uuid.uuid5`` parity is covered by
    :func:`uuid5_col`'s golden tests instead."""
    return _rfc4122_col(F.md5(name), "3")


# ---- oracle-parity (md5) variants: identical in Spark and DuckDB ---------

def content_doc_id_col(text: Column) -> Column:
    """md5-based content-addressed doc id (oracle-checkable stand-in
    for the mmh3 id; same dedup semantics)."""
    return F.concat(F.lit("DOC_"), F.substring(F.md5(text), 1, 8))


def content_chunk_id_col(doc_id: Column, chunk: Column) -> Column:
    return F.concat(doc_id, F.lit("_"), F.substring(F.md5(chunk), 1, 8))


def passage_prefix_col(doc_id: Column, chunk: Column) -> Column:
    """T7 prefix enrichment (producer_graph.py:91-99):
    ``passage: [DOC_xxxxxxxx] <chunk>``."""
    return F.concat(F.lit("passage: ["), doc_id, F.lit("] "), chunk)
