"""Text-quality predicates F1-F11 (reference: ``utils/text_utils.py``,
surveyed in SURVEY.md section 2.3) as JVM-side Column expressions.

These are the reference's "WHERE clauses": per-page/per-chunk scalar
predicates gating OCR retry and LLM normalization. Everything here is
built-in ``pyspark.sql.functions`` (regex + higher-order functions) so
the hot path stays inside whole-stage codegen -- no Python UDFs.

Deviation from the reference, by design: ``latin_script_ratio``
(text_utils.py:74-79) uses ``\\p{Latin}`` which differs between Java
regex and RE2; we use the ASCII-letter ratio so the DuckDB oracle and
Spark agree bit-for-bit. Mojibake detection (F3) uses the same
character class the reference greps for (text_utils.py:82-89);
``fix_mojibake`` repairs the deterministic UTF-8-as-latin1 subset of
what ftfy fixes (text_utils.py:66-71).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOJIBAKE_CLASS = "[âã¢£™žœÂÃ]"

# the classic UTF-8-read-as-wrong-charset sequences the reference's
# ftfy pass repairs (T13/F10, text_utils.py:66-71): for each true
# character, the mojibake forms are its UTF-8 bytes mis-decoded as (a)
# windows-1252 -- the common real-world case, e.g. \u2019 -> "\u00e2\u20ac\u2122" --
# and (b) latin-1. Built programmatically so every sequence is exact;
# cp1252 first since its 3-char forms are never substrings of the
# latin-1 forms' outputs.
_MOJI_CHARS = (
    "\u2018\u2019\u201a\u201c\u201d\u201e\u2013\u2014\u2026\u2022"  # punct
    "\u20ac\u2122\u00b0\u00a9\u00ae\u00a0"                          # symbols
    "\u00e0\u00e1\u00e2\u00e4\u00e7\u00e8\u00e9\u00ea\u00eb"       # accents
    "\u00ed\u00ee\u00ef\u00f3\u00f4\u00f6\u00fa\u00fb\u00fc\u00f1\u00df"
)


def _moji_forms():
    fixes = []
    for good in _MOJI_CHARS:
        raw = good.encode("utf-8")
        for enc in ("cp1252", "latin-1"):
            try:
                bad = raw.decode(enc)
            except UnicodeDecodeError:
                continue  # bytes undefined in cp1252 (0x81, 0x8D, ...)
            if bad != good and (bad, good) not in fixes:
                fixes.append((bad, good))
    return fixes


MOJIBAKE_FIXES = _moji_forms()


def fix_mojibake(c: Column) -> Column:
    """T13/F10: repair the common mojibake sequences (the reference
    runs ftfy ``fix_text``; this is the deterministic declarative
    subset -- UTF-8 mis-decoded as cp1252 or latin-1 -- applied as
    chained JVM-side replaces)."""
    out = c
    for bad, good in MOJIBAKE_FIXES:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def words(c: Column) -> Column:
    """Whitespace tokens, empties dropped (the reference's
    ``len(text.split())`` convention, text_utils.py:141-147)."""
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != F.lit(""))


def n_tokens(c: Column) -> Column:
    return F.size(words(c))


def nonalpha_ratio(c: Column) -> Column:
    """Noise ratio: fraction of chars outside [A-Za-z ] (is_gibberish
    core, text_utils.py:92-127)."""
    stripped = F.regexp_replace(c, "[A-Za-z ]", "")
    return F.length(stripped).cast("double") / F.nullif(
        F.length(c).cast("double"), F.lit(0.0)
    )


def printable_ascii_ratio(c: Column) -> Column:
    """Fraction of printable-ASCII chars (text_utils.py:130-139)."""
    kept = F.regexp_replace(c, "[^ -~]", "")
    return F.length(kept).cast("double") / F.nullif(
        F.length(c).cast("double"), F.lit(0.0)
    )


def ascii_letter_ratio(c: Column) -> Column:
    kept = F.regexp_replace(c, "[^A-Za-z]", "")
    return F.length(kept).cast("double") / F.nullif(
        F.length(c).cast("double"), F.lit(0.0)
    )


def unique_word_ratio(c: Column) -> Column:
    w = words(c)
    return F.size(F.array_distinct(w)).cast("double") / F.nullif(
        F.size(w).cast("double"), F.lit(0.0)
    )


def unique_line_ratio(c: Column) -> Column:
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != F.lit(""))
    return F.size(F.array_distinct(lines)).cast("double") / F.nullif(
        F.size(lines).cast("double"), F.lit(0.0)
    )


def mean_word_len(c: Column) -> Column:
    w = words(c)
    total = F.aggregate(F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x)
    return total.cast("double") / F.nullif(F.size(w).cast("double"), F.lit(0.0))


def long_word_ratio(c: Column, threshold: int = 30) -> Column:
    w = words(c)
    longs = F.filter(w, lambda x: F.length(x) > threshold)
    return F.size(longs).cast("double") / F.nullif(
        F.size(w).cast("double"), F.lit(0.0)
    )


# ---- boolean predicates (F2-F9) ------------------------------------------

def is_visibly_corrupt(c: Column) -> Column:
    """F3: mojibake character scan (text_utils.py:82-89)."""
    return c.rlike(MOJIBAKE_CLASS)


def is_gibberish(c: Column, threshold: float = 0.6) -> Column:
    """F2: non-alpha noise ratio above threshold (text_utils.py:92-127)."""
    return F.coalesce(nonalpha_ratio(c) > threshold, F.lit(False))


def is_low_quality(c: Column, min_tokens: int = 5) -> Column:
    """F4: token count below floor (text_utils.py:141-147)."""
    return n_tokens(c) < min_tokens


def is_repetitive(
    c: Column, line_ratio: float = 0.3, word_ratio: float = 0.2
) -> Column:
    """F5: unique-line ratio < 0.3 or unique-word ratio < 0.2
    (text_utils.py:150-168)."""
    return F.coalesce(
        (unique_line_ratio(c) < line_ratio) | (unique_word_ratio(c) < word_ratio),
        F.lit(False),
    )


def has_abnormal_word_lengths(c: Column) -> Column:
    """F6: mean word length outside [2, 20] or >10% of words >30 chars
    (text_utils.py:170-183)."""
    mean = mean_word_len(c)
    return F.coalesce(
        (mean < 2.0) | (mean > 20.0) | (long_word_ratio(c) > 0.1), F.lit(False)
    )


def is_mostly_printable_ascii(c: Column, threshold: float = 0.75) -> Column:
    """F8 (text_utils.py:130-139)."""
    return F.coalesce(printable_ascii_ratio(c) >= threshold, F.lit(False))


def is_invalid_text(c: Column, min_len: int = 20, min_letter: float = 0.7) -> Column:
    """F9: too short, unprintable, or low letter ratio
    (text_utils.py:205-224, with the ASCII-letter deviation noted above)."""
    return (
        (F.length(c) < min_len)
        | (printable_ascii_ratio(c) < 0.6)
        | (ascii_letter_ratio(c) < F.lit(min_letter) * 0.5)
    )


def is_bad_ocr(c: Column) -> Column:
    """F1: the composite gate deciding OCR-retry / LLM-normalize
    (text_utils.py:186-203) -- OR of F2/F3/F5/F6 plus the F4 floor."""
    return (
        is_gibberish(c)
        | is_visibly_corrupt(c)
        | is_low_quality(c)
        | is_repetitive(c)
        | has_abnormal_word_lengths(c)
    )


def quality_score(c: Column) -> Column:
    """Continuous [0,1] corpus-quality score built from the same
    signals (training-data pipeline scoring surface)."""
    score = (
        F.lit(1.0)
        - F.lit(0.3) * F.coalesce(nonalpha_ratio(c), F.lit(1.0))
        - F.lit(0.2) * (F.lit(1.0) - F.coalesce(unique_word_ratio(c), F.lit(0.0)))
        - F.lit(0.2) * F.when(is_low_quality(c), 1.0).otherwise(0.0)
        - F.lit(0.3) * (F.lit(1.0) - F.coalesce(printable_ascii_ratio(c), F.lit(0.0)))
    )
    return F.greatest(score, F.lit(0.0))
