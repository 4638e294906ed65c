"""Reference-parity hierarchical Markdown splitter (T4).

The reference's ``split_markdown_doc`` (``processors/text_processor.py:
23-147``) is YAML front matter -> langchain ``MarkdownHeaderTextSplitter``
-> langchain ``RecursiveCharacterTextSplitter`` (token-length function,
dynamic 85% safety budget) -> non-destructive oversize sub-split, with
mmh3 chunk ids. This module re-implements that pipeline as ONE pure
deterministic function so chunk text and indices are byte-comparable
against the reference -- the chunk id is the reference's dedup key, so
boundary parity is the whole point.

The two langchain splitters are PUBLIC, MIT-licensed algorithms
(``langchain-text-splitters>=0.3.0`` per the reference's pyproject);
they are re-implemented here from their documented 0.3.x behavior --
including the easily-missed details that change boundaries:

- header lines are ``strip()``-ed and non-printable-filtered before
  matching; header patterns sorted longest-first with a
  "followed-by-space-or-EOL" guard (so ``### [INTERNAL_PAGE_1]``
  matches the ``###`` rule with the anchor as DATA -- the reference's
  page extraction scans metadata VALUES, so it works either way);
- fenced code blocks (``` / ~~~) are never header-matched;
- blank lines split paragraphs; contiguous same-metadata paragraphs
  re-aggregate joined by ``"  \\n"`` (markdown line break);
- ``RecursiveCharacterTextSplitter`` defaults ``keep_separator=True``:
  each split piece carries its separator PREFIX, and the greedy merge
  then joins with the EMPTY separator (whose token length still
  includes the enrichment-prefix cost -- the reference's
  ``token_len`` is ``prefix_len + len(encode(text))`` for every call,
  separators included);
- the merge window pops from the FRONT while ``total > overlap`` (the
  second clause of langchain's while), subtracting the separator cost
  only when more than one piece remains.

Tokenizer: pluggable. The default :class:`CharTokenizer` is the
invertible twin of the reference's own test mock (1 char == 1 token,
``tests/test_no_loss_splitting.py:7-15``) -- identical counts, but
``decode`` reconstructs the exact slice instead of ``"x" * n``, so
oversize sub-splits remain byte-faithful. A real HF tokenizer drops
into the same slot unchanged.

Goldens: ``tests/fixtures/markdown_goldens.json`` (written by
``tools/gen_markdown_goldens.py``) pins chunk text + indices + ids for
varied docs (front matter, page anchors, nested headers, code fences,
oversize sections). EVIDENCE STATUS (be precise about what is proven):
the fixture records ``generator: "replica"`` -- langchain is not
importable in this container (re-verified round 6: pip exists but the
container has no network route to PyPI, and the build contract forbids
installing packages), so the cross-check hook in the generator has
never executed against the real library, and the goldens pin THIS
implementation's output (regression protection, not external
validation). External evidence is (a) the copied published langchain
test vectors in ``tests/test_mdsplit.py`` for the header splitter and
(b) hand-computed merge-window cases; true byte-parity of the
RecursiveCharacterTextSplitter merge window against langchain 0.3.x
remains UNVERIFIED until someone runs the generator with the package
installed (it then asserts byte-identity and flips the ``generator``
tag).

Scale: the splitter is a per-document pure function fanned out with
Arrow ``mapInPandas`` -- map-only, no shuffle, no driver loop.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import table

# --------------------------------------------------------------------------
# tokenizer slot
# --------------------------------------------------------------------------


class CharTokenizer:
    """1 char == 1 token, invertible. Count-identical to the reference
    test mock (which ignores ``add_special_tokens``); ``decode``
    returns the exact text slice."""

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        return [ord(c) for c in text]

    def encode_len(self, text: str, add_special_tokens: bool = False) -> int:
        # len(encode(text)) without materializing the token list --
        # 1 char == 1 token by definition, so this is exact
        return len(text)

    def decode(self, tokens: list[int], skip_special_tokens: bool = True) -> str:
        return "".join(chr(t) for t in tokens)


# --------------------------------------------------------------------------
# langchain MarkdownHeaderTextSplitter (0.3.x semantics, strip_headers)
# --------------------------------------------------------------------------

HEADERS_TO_SPLIT_ON = [
    ("#", "Header_1"),
    ("##", "Header_2"),
    ("### [INTERNAL_PAGE_", "Internal_Page"),
    ("###", "Header_3"),
]


def markdown_header_split(
    text: str,
    headers_to_split_on: list[tuple[str, str]] = HEADERS_TO_SPLIT_ON,
) -> list[tuple[str, dict[str, str]]]:
    """(content, metadata) sections -- the 0.3.x ``split_text`` +
    ``aggregate_lines_to_chunks`` behavior with ``strip_headers=True``
    (the reference uses the default)."""
    headers = sorted(headers_to_split_on, key=lambda h: len(h[0]), reverse=True)

    lines_with_meta: list[tuple[str, dict[str, str]]] = []
    current_content: list[str] = []
    current_meta: dict[str, str] = {}
    header_stack: list[tuple[int, str]] = []  # (level, name)
    initial_meta: dict[str, str] = {}
    in_code_block = False
    opening_fence = ""

    for line in text.split("\n"):
        stripped = "".join(filter(str.isprintable, line.strip()))
        if not in_code_block:
            if stripped.startswith("```") and stripped.count("```") == 1:
                in_code_block, opening_fence = True, "```"
            elif stripped.startswith("~~~"):
                in_code_block, opening_fence = True, "~~~"
        else:
            if stripped.startswith(opening_fence):
                in_code_block, opening_fence = False, ""
        if in_code_block:
            current_content.append(stripped)
            continue

        for sep, name in headers:
            # header iff the pattern is the whole line or is followed
            # by a space -- this is why "### [INTERNAL_PAGE_1]" binds
            # to "###" (next char after the long pattern is a digit)
            if stripped.startswith(sep) and (
                len(stripped) == len(sep) or stripped[len(sep)] == " "
            ):
                level = sep.count("#")
                while header_stack and header_stack[-1][0] >= level:
                    popped = header_stack.pop()
                    initial_meta.pop(popped[1], None)
                header_stack.append((level, name))
                initial_meta[name] = stripped[len(sep):].strip()
                if current_content:
                    lines_with_meta.append(
                        ("\n".join(current_content), dict(current_meta))
                    )
                    current_content = []
                break
        else:
            if stripped:
                current_content.append(stripped)
            elif current_content:
                lines_with_meta.append(
                    ("\n".join(current_content), dict(current_meta))
                )
                current_content = []
        current_meta = dict(initial_meta)

    if current_content:
        lines_with_meta.append(("\n".join(current_content), dict(current_meta)))

    # aggregate contiguous same-metadata paragraphs ("  \n" join)
    out: list[tuple[str, dict[str, str]]] = []
    for content, meta in lines_with_meta:
        if out and out[-1][1] == meta:
            out[-1] = (out[-1][0] + "  \n" + content, out[-1][1])
        else:
            out.append((content, meta))
    return out


# --------------------------------------------------------------------------
# langchain RecursiveCharacterTextSplitter (0.3.x, keep_separator=True)
# --------------------------------------------------------------------------


def _split_keep_separator(text: str, separator: str) -> list[str]:
    """``re.split`` with the separator re-attached to the FRONT of the
    following piece (``keep_separator=True`` / "start"); empty pieces
    dropped. Empty separator -> per-character."""
    if separator == "":
        return list(text)
    parts = re.split(f"({re.escape(separator)})", text)
    pieces = [parts[i] + parts[i + 1] for i in range(1, len(parts) - 1, 2)]
    pieces = [parts[0]] + pieces
    return [p for p in pieces if p != ""]


def recursive_char_split(
    text: str,
    chunk_size: int,
    chunk_overlap: int,
    length_function,
    separators: list[str] = ("\n\n", "\n", " ", ""),
) -> list[str]:
    """``RecursiveCharacterTextSplitter._split_text`` with the exact
    0.3.x merge window (see module docstring for the boundary-changing
    details)."""
    separators = list(separators)

    def merge(splits: list[str], separator: str) -> list[str]:
        separator_len = length_function(separator)
        docs: list[str] = []
        current: list[str] = []
        total = 0
        for d in splits:
            dlen = length_function(d)
            if total + dlen + (separator_len if current else 0) > chunk_size:
                if current:
                    joined = separator.join(current).strip()
                    if joined:
                        docs.append(joined)
                    while total > chunk_overlap or (
                        total + dlen + (separator_len if current else 0)
                        > chunk_size
                        and total > 0
                    ):
                        total -= length_function(current[0]) + (
                            separator_len if len(current) > 1 else 0
                        )
                        current = current[1:]
            current.append(d)
            total += dlen + (separator_len if len(current) > 1 else 0)
        joined = separator.join(current).strip()
        if joined:
            docs.append(joined)
        return docs

    def split(text: str, seps: list[str]) -> list[str]:
        final: list[str] = []
        separator = seps[-1]
        new_seps: list[str] = []
        for i, s in enumerate(seps):
            if s == "":
                separator = s
                break
            if re.search(re.escape(s), text):
                separator = s
                new_seps = seps[i + 1:]
                break
        pieces = _split_keep_separator(text, separator)
        merge_sep = ""  # keep_separator=True: pieces carry their own
        good: list[str] = []
        for p in pieces:
            if length_function(p) < chunk_size:
                good.append(p)
            else:
                if good:
                    final.extend(merge(good, merge_sep))
                    good = []
                if not new_seps:
                    final.append(p)
                else:
                    final.extend(split(p, new_seps))
        if good:
            final.extend(merge(good, merge_sep))
        return final

    return split(text, separators)


# --------------------------------------------------------------------------
# the reference pipeline (text_processor.py:23-147)
# --------------------------------------------------------------------------

_FRONT_MATTER_RE = re.compile(r"^---\s*\n(.*?)\n---\s*\n", re.DOTALL)
_PAGE_ANCHOR_INLINE_RE = re.compile(r"(### \[INTERNAL_PAGE_\d+\])\s+(.+)")
_PAGE_NUM_RE = re.compile(r"(\d+)")

DEFAULT_BUDGET = 512      # the reference test env's MAX_TOKENS
                          # (shared/defaults.py:61 defaults 256; both
                          # are env-tunable -- parameter here)
SUBSPLIT_SAFETY = 2       # "-2 for [CLS]/[SEP] safety"


def parse_front_matter_yamlish(text: str) -> tuple[dict, str]:
    """Front matter via the reference regex; keys lowercased
    (text_processor.py:33-45). Values parsed as plain ``k: v`` lines --
    the documents this engine feeds it never carry nested YAML, and a
    malformed header degrades to {} exactly like the reference's
    ``except`` arm.

    DOCUMENTED DEVIATION: the reference runs ``yaml.safe_load``, so
    typed scalars come back typed (``count: 3`` -> int 3, ``tags:
    [a, b]`` -> list); this parser yields the raw STRING for every
    value. Chunk *metadata* for typed front matter therefore differs
    (``"3"`` vs ``3``) while chunk text and boundaries are unaffected
    -- the same caveat family as the nested-YAML note above. Callers
    comparing metadata byte-for-byte against the reference should
    plug a YAML parser here."""
    m = _FRONT_MATTER_RE.search(text)
    if not m:
        return {}, text
    meta: dict = {}
    try:
        for line in m.group(1).splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                meta[k.strip().lower()] = v.strip()
    except Exception:
        meta = {}
    return meta, text[m.end():]


def split_markdown_doc_parity(
    text: str,
    rel_path: str,
    tokenizer=None,
    budget: int | None = None,
    prefix: str = "passage: ",
    document_id: str | None = None,
    max_tokens: int | None = None,
) -> tuple[list[str], list[dict]]:
    """The reference's ``split_markdown_doc`` end to end: returns
    (chunks, metadata) with the same chunk boundaries, indices, pages,
    and id/hash scheme (mmh3 via ``functions.hashing.murmur3_32``).
    The id/hash arithmetic is byte-parity-tested against published
    murmur vectors; the CHUNK BOUNDARIES are replica-golden-pinned plus
    published-vector-tested for the header splitter -- see the module
    docstring's evidence-status note for what remains unverified.

    ``budget`` sizes the merge window (``chunk_size = 0.85*budget -
    prefix``); ``max_tokens`` gates the oversize overflow check and the
    sub-split window, mirroring the reference's GLOBAL ``MAX_TOKENS``
    (text_processor.py:115,126), which it applies regardless of the
    requested chunk size. Byte-parity with the reference requires
    ``budget == max_tokens == MAX_TOKENS`` -- the reference never
    varies them independently -- so ``max_tokens`` defaults to
    ``budget`` and exists for callers reproducing a deployment where
    the env-tuned global differs from the split budget."""
    from ..functions.hashing import murmur3_32

    tokenizer = tokenizer or CharTokenizer()
    if budget is None:
        budget = DEFAULT_BUDGET
    if max_tokens is None:
        max_tokens = budget

    # count-only fast path: token_len is called per candidate piece
    # inside the merge window (hundreds of times per document), and
    # len(encode(t)) built a throwaway token list each call -- the
    # kernel's top profile line. A tokenizer exposing encode_len
    # answers the count directly (CharTokenizer: len(t), exact by
    # definition); foreign tokenizers fall back to len(encode(...)).
    enc_len = getattr(tokenizer, "encode_len", None) or (
        lambda t, add_special_tokens=False: len(
            tokenizer.encode(t, add_special_tokens=add_special_tokens)
        )
    )

    file_meta, body = parse_front_matter_yamlish(text)
    body = _PAGE_ANCHOR_INLINE_RE.sub(r"\1\n\2", body)

    meta_id = document_id if document_id else "DOC_UNKNOWN"
    enrichment_prefix = f"{prefix}[{meta_id}] "
    prefix_len = enc_len(enrichment_prefix, add_special_tokens=True)

    def token_len(t: str) -> int:
        return prefix_len + enc_len(t)

    safe_budget = int(budget * 0.85) - prefix_len

    sections = markdown_header_split(body)

    chunks: list[str] = []
    metadata: list[dict] = []

    def emit(chunk_text: str, sect_meta: dict, page: int) -> None:
        idx = len(chunks)
        chunks.append(chunk_text)
        mm = murmur3_32(chunk_text) & 0xFFFFFFFF  # one hash, two casings
        c_hash = format(mm, "08X")
        c_id = f"{meta_id}_{format(mm, '08x')}"
        meta = {
            **file_meta, **sect_meta,
            "id": c_id, "hash": c_hash, "page": page,
            "chunk_index": idx, "source_file": rel_path,
        }
        if "document_id" not in meta:
            meta["document_id"] = meta_id
        for k in list(meta):
            if "Internal_Page" in k or (
                isinstance(meta[k], str) and "[INTERNAL_PAGE_" in meta[k]
            ):
                meta.pop(k, None)
        metadata.append(meta)

    for content, sect_meta in sections:
        for piece in recursive_char_split(
            content, safe_budget, 50, token_len
        ):
            page = 1
            for value in sect_meta.values():
                pm = _PAGE_NUM_RE.search(str(value)) if (
                    "[INTERNAL_PAGE_" in str(value)
                ) else None
                if pm:
                    page = int(pm.group(1))
                    break
            n_full = enc_len(
                f"{enrichment_prefix}{piece}", add_special_tokens=True
            )
            # the overflow gate and sub-split window use max_tokens
            # (the reference's global MAX_TOKENS), not the merge budget
            if n_full <= max_tokens:
                emit(piece, sect_meta, page)
            else:
                # non-destructive oversize sub-split (T6): token-window
                # slices, never truncation (text_processor.py:120-139)
                content_tokens = tokenizer.encode(
                    piece, add_special_tokens=False
                )
                available = max_tokens - prefix_len - SUBSPLIT_SAFETY
                start = 0
                while start < len(content_tokens):
                    end = min(start + available, len(content_tokens))
                    sub = tokenizer.decode(
                        content_tokens[start:end], skip_special_tokens=True
                    ).strip()
                    if sub:
                        emit(sub, sect_meta, page)
                    start = end

    total = len(chunks)
    for m in metadata:
        m["total_chunks"] = total
    return chunks, metadata


# --------------------------------------------------------------------------
# Spark fan-out + registry entry
# --------------------------------------------------------------------------

MD_REF_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("chunk_index", IntegerType()),
    StructField("chunk", StringType()),
    StructField("page", IntegerType()),
    StructField("chunk_id", StringType()),
    StructField("total_chunks", IntegerType()),
    StructField("n_tokens", IntegerType()),
])


def chunk_markdown_reference_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    budget: int = DEFAULT_BUDGET,
) -> DataFrame:
    """Reference-boundary chunking over a document DataFrame. The
    oracle-checkable ``chunk_id`` uses the md5 variant of the id scheme
    (the repo convention: md5 twins for oracle columns, exact-mmh3
    parity golden-tested in tests); ``n_tokens`` is the reference's
    ``token_len`` of the chunk."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = CharTokenizer()
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                doc_key = "DOC_" + hashlib.md5(
                    text.encode()
                ).hexdigest()[:8]
                prefix_len = len(f"passage: [{doc_key}] ")
                chunks, metas = split_markdown_doc_parity(
                    text, rel_path=f"doc_{did}.md",
                    budget=budget, document_id=doc_key,
                )
                for c, m in zip(chunks, metas):
                    rows.append((
                        did, m["chunk_index"], c, m["page"],
                        f"{doc_key}_"
                        + hashlib.md5(c.encode()).hexdigest()[:8],
                        m["total_chunks"], prefix_len + len(c),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "chunk_index", "chunk", "page", "chunk_id",
                "total_chunks", "n_tokens",
            ])

    return df.select(id_col, text_col).mapInPandas(gen, MD_REF_SCHEMA)


def chunk_markdown_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered T4 parity query over the documents corpus. The corpus
    is single-line prose, so the pipeline reduces to: one section, the
    space-separator recursive split, and the greedy token-window merge
    -- which the DuckDB oracle replays exactly as a small-step
    recursive CTE (one pack-or-pop transition per step; the same
    relationalization as the first-fit packing oracle). Markdown
    structure (headers, fences, front matter, oversize sub-split) is
    exercised byte-exactly by the committed goldens instead."""
    docs = table(spark, sf_dir, "documents")
    return chunk_markdown_reference_df(docs)


QUERIES = {
    "chunk_markdown_reference": chunk_markdown_reference,
}


def _md_ref_oracle_sql() -> str:
    """Small-step recursive-CTE twin of the 0.3.x merge window for the
    corpus shape (single-spaced prose, no headers): state =
    (next piece i, window start lo, window token total, popping?),
    one transition per recursion round; chunk (s, e) word-index spans
    accumulate in a list and unnest at the end.

    Costs under the char tokenizer with the md5-doc-key prefix
    ("passage: [DOC_xxxxxxxx] " == 24 chars): piece i carries its
    leading-space separator (keep_separator=True), so
    cost(i) = 24 + len(word_i) + (i > 1); the merge separator is the
    EMPTY string whose token_len is still the 24-char prefix."""
    budget = DEFAULT_BUDGET
    prefix_len = 24
    chunk_size = int(budget * 0.85) - prefix_len
    overlap = 50
    sep_len = prefix_len  # token_len("") = prefix_len + 0
    return f"""
        WITH RECURSIVE docs AS (
            -- doc_key hashes the RAW text column (the Python side
            -- hashes the unmodified document; a same-SELECT alias
            -- would lateral-capture and hash the trimmed value).
            -- w mirrors the parity splitter's line handling: ASCII
            -- control characters are REMOVED (langchain 0.3.x strips
            -- non-printables per line, text_processor.py:60-75), then
            -- space-split -- so a \\x0B/\\t-bearing document cleans
            -- identically on both engines.
            SELECT doc_id,
                   'DOC_' || substr(md5(text), 1, 8) AS doc_key,
                   list_filter(string_split(trim(regexp_replace(
                       text, '[\\x00-\\x1f\\x7f]', '', 'g')), ' '),
                               x -> x <> '') AS w
            FROM documents
            WHERE length(trim(regexp_replace(
                      text, '[\\x00-\\x1f\\x7f]', '', 'g'))) > 0
        ),
        st AS (
                SELECT doc_id, w, len(w) AS n,
                       1 AS i, 1 AS lo, 0 AS total, false AS popping,
                       CAST([] AS STRUCT(s INT, e INT)[]) AS chunks
                FROM docs
                UNION ALL
                SELECT doc_id, w, n,
                    CASE WHEN NOT popping
                              AND NOT (lo < i AND total + c_i + {sep_len}
                                       > {chunk_size})
                         THEN i + 1 ELSE i END AS i,
                    CASE WHEN popping AND pop_more THEN lo + 1
                         ELSE lo END AS lo,
                    CASE WHEN NOT popping
                              AND NOT (lo < i AND total + c_i + {sep_len}
                                       > {chunk_size})
                         THEN total + c_i
                              + (CASE WHEN i > lo THEN {sep_len} ELSE 0 END)
                         WHEN popping AND pop_more
                         THEN total - ({prefix_len} + len(w[lo])
                                       + (CASE WHEN lo = 1 THEN 0 ELSE 1 END))
                              - (CASE WHEN i - lo > 1 THEN {sep_len}
                                 ELSE 0 END)
                         ELSE total END AS total,
                    CASE WHEN NOT popping
                         THEN (lo < i AND total + c_i + {sep_len}
                               > {chunk_size})
                         ELSE pop_more END AS popping,
                    CASE WHEN NOT popping
                              AND (lo < i AND total + c_i + {sep_len}
                                   > {chunk_size})
                         THEN list_append(chunks, {{'s': lo, 'e': i - 1}})
                         ELSE chunks END AS chunks
                FROM (
                    SELECT *,
                        {prefix_len} + len(w[i])
                            + (CASE WHEN i = 1 THEN 0 ELSE 1 END) AS c_i,
                        (total > {overlap} OR
                         (total + ({prefix_len} + len(w[i])
                                   + (CASE WHEN i = 1 THEN 0 ELSE 1 END))
                          + (CASE WHEN lo < i THEN {sep_len} ELSE 0 END)
                          > {chunk_size} AND total > 0)) AS pop_more
                    FROM st WHERE i <= n
                )
        ),
        steps AS (
            SELECT doc_id, w, n, lo, chunks FROM st WHERE i = n + 1
        ),
        final AS (
            SELECT doc_id, w,
                   list_append(chunks, {{'s': lo, 'e': n}}) AS chunks
            FROM steps
        ),
        expanded AS (
            SELECT doc_id, w, len(chunks) AS total_chunks,
                   unnest(chunks) AS c,
                   generate_subscripts(chunks, 1) AS ord
            FROM final
        )
        SELECT e.doc_id,
               CAST(e.ord - 1 AS INTEGER) AS chunk_index,
               array_to_string(list_slice(e.w, e.c.s, e.c.e), ' ') AS chunk,
               1 AS page,
               d.doc_key || '_' || substr(md5(
                   array_to_string(list_slice(e.w, e.c.s, e.c.e), ' ')
               ), 1, 8) AS chunk_id,
               CAST(e.total_chunks AS INTEGER) AS total_chunks,
               CAST({prefix_len} + length(
                   array_to_string(list_slice(e.w, e.c.s, e.c.e), ' ')
               ) AS INTEGER) AS n_tokens
        FROM expanded e
        JOIN docs d USING (doc_id)
    """


ORACLE = {
    "chunk_markdown_reference": _md_ref_oracle_sql(),
}
