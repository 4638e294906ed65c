"""Text-quality predicates F1-F11 (reference: ``utils/text_utils.py``,
surveyed in SURVEY.md section 2.3) as JVM-side Column expressions.

These are the reference's "WHERE clauses": per-page/per-chunk scalar
predicates gating OCR retry and LLM normalization. Everything here is
built-in ``pyspark.sql.functions`` (regex + higher-order functions) so
the hot path stays inside whole-stage codegen -- no Python UDFs.

``latin_script_ratio`` (text_utils.py:74-79) counts the reference's
``\\p{Latin}|\\p{M}`` classes with Java's ``\\p{IsLatin}`` script
property -- accented European text (e, n, u with diacritics) scores as
Latin exactly as the reference's ``regex`` module scores it; the DuckDB
oracle twin uses RE2's ``\\p{Latin}``, identical for every assigned
character both engines know. Mojibake detection (F3) uses the same
character class the reference greps for (text_utils.py:82-89);
``fix_mojibake`` repairs the deterministic UTF-8-as-latin1/cp1252
subset of what ftfy fixes (text_utils.py:66-71).
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
    # ftfy long-tail forms the reference corpus hits (r8, VERDICT
    # "What's missing" 4): uppercase accents, the cp1252-only Latin
    # extras (oe ligatures, s/z-caron, y-diaeresis, florin), Nordic
    # letters, the remaining Latin-1 vowels, guillemets, per-mille,
    # single angle quotes, and the spacing circumflex/tilde
    "\u00c0\u00c1\u00c2\u00c4\u00c7\u00c8\u00c9\u00ca\u00cb"       # A-E caps
    "\u00cd\u00ce\u00cf\u00d3\u00d4\u00d6\u00da\u00db\u00dc\u00d1"  # I-U caps
    "\u0152\u0153\u0160\u0161\u017d\u017e\u0178\u0192"             # OE/carons
    "\u00e5\u00e6\u00f8\u00ec\u00f2\u00f9\u00e3\u00f5"             # nordic+
    "\u00ab\u00bb\u2030\u2039\u203a\u02c6\u02dc"                   # quotes etc
)


# HTML-entity remnants ftfy also unescapes (fix_text's
# unescape_html='auto' path) -- the forms that survive a bad
# HTML-to-text pass; applied after the encoding repairs.
_HTML_ENTITY_FIXES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", "\xa0"),  # html.unescape maps to U+00A0, as ftfy does
    # &amp; LAST: "&amp;lt;" must unescape exactly once (to "&lt;"),
    # matching ftfy -- running &amp; earlier would cascade to "<"
    ("&amp;", "&"),
]


def _sloppy_cp1252(raw: bytes) -> str:
    """ftfy's sloppy-windows-1252: cp1252 with the five undefined
    bytes (0x81 0x8D 0x8F 0x90 0x9D) passing through as their C1
    controls -- the decode real pipelines actually perform, so e.g.
    U+201D (bytes e2 80 9d) mis-decodes to 'â€\\x9d', not a decode
    error."""
    return "".join(
        bytes([b]).decode("cp1252", errors="strict")
        if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
        else chr(b)
        for b in raw
    )


def _moji_forms():
    fixes = []
    for good in _MOJI_CHARS:
        raw = good.encode("utf-8")
        for dec in (_sloppy_cp1252,
                    lambda r: r.decode("latin-1")):
            bad = dec(raw)
            if bad != good and (bad, good) not in fixes:
                fixes.append((bad, good))
                # DOUBLE-encoded form (ftfy's multi-pass repair): the
                # gen-1 mojibake string itself re-encoded as UTF-8 and
                # mis-decoded again -- e.g. ’ -> "â€™" ->
                # "Ã¢â‚¬â„¢"
                bad2 = dec(bad.encode("utf-8"))
                if bad2 != bad and (bad2, good) not in fixes:
                    fixes.append((bad2, good))
    # longest mis-decoded form first: a double-encoded sequence must
    # repair in ONE replace to the true character, never partially via
    # a shorter gen-1 rule that matches a substring of it
    fixes.sort(key=lambda f: len(f[0]), reverse=True)
    return fixes + _HTML_ENTITY_FIXES


MOJIBAKE_FIXES = _moji_forms()


def fix_mojibake(c: Column) -> Column:
    """T13/F10: repair the common mojibake sequences (the reference
    runs ftfy ``fix_text``; this is the deterministic declarative
    subset -- UTF-8 mis-decoded as cp1252 or latin-1, the
    DOUBLE-encoded second-generation forms of each, and the common
    HTML-entity remnants -- applied as chained JVM-side replaces,
    longest form first)."""
    out = c
    for bad, good in MOJIBAKE_FIXES:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def words(c: Column) -> Column:
    """Whitespace tokens, empties dropped (the reference's
    ``len(text.split())`` convention, text_utils.py:141-147)."""
    return F.filter(F.split(F.trim(c), r"[ \t\n\x0B\f\r]+"), lambda x: x != F.lit(""))


LN_UNIT_SCALE = 1_000_000  # exact BIGINT 1e-6 units for once-rounded ln


def lnu(x) -> Column:
    """ln(x) rounded ONCE at 6 decimals, lifted to exact BIGINT 1e-6
    units -- ln() is not correctly-rounded across libm/JVM, so every
    log in a cross-engine-checked score is rounded exactly once and
    all later combination is integer arithmetic (docs/ROUNDING.md
    rule 2, the BM25 convention). Shared by the DSIR / PMI /
    weighted-sampling family."""
    return F.rint(F.round(F.log(x), 6) * LN_UNIT_SCALE).cast("long")


def lnu_sql(x: str) -> str:
    """The DuckDB twin of :func:`lnu` (identical rounding ladder)."""
    return f"CAST(round(round(ln({x}), 6) * {LN_UNIT_SCALE}) AS BIGINT)"


def let(expr: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``expr`` ONCE per
    row and bind it as a lambda variable inside ``body``.

    Interpreted higher-order-function lambdas re-evaluate their
    free-variable subtrees on EVERY element (there is no common
    subexpression elimination outside whole-stage codegen), so any HOF
    whose lambda references an expensive outer array expression -- a
    regex split, a per-element hash transform -- silently goes
    quadratic in the array length. Wrapping the expensive expression
    in a single-element array and ``transform``-ing over it turns it
    into a BOUND VARIABLE, evaluated once per row regardless of how
    many inner lambda evaluations read it (measured 6x on the 3-word
    shingle builder at sf0.1; 39x on the winnowing windows before its
    kernel moved to Arrow)."""
    return F.transform(F.array(expr), body)[0]


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


# NON-printable per Python's str.isprintable (the reference's
# ALLOW_LATIN_EXTENDED validity gate counts c.isprintable(),
# text_utils.py:216-218): the Other categories (\p{C} = Cc Cf Cs Co Cn)
# plus every Separator except the ASCII space -- Zl, Zp, and the Zs
# members other than U+0020, enumerated because neither Java regex
# (without intersection syntax RE2 lacks) nor RE2 can express
# "Z minus space" portably.
_NONPRINTABLE_CLASS = (
    "[\\p{C}\\p{Zl}\\p{Zp}"
    "\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"
)


def unicode_printable_ratio(c: Column) -> Column:
    """Fraction of unicode-printable chars (Python ``isprintable``
    semantics, matching the reference's latin-extended validity path,
    text_utils.py:216-218)."""
    stripped = F.regexp_replace(c, _NONPRINTABLE_CLASS, "")
    return F.length(stripped).cast("double") / F.nullif(
        F.length(c).cast("double"), F.lit(0.0)
    )


def latin_script_ratio(c: Column) -> Column:
    """F7: fraction of chars that are Latin-script letters or combining
    marks -- the reference's ``regex.findall(r"\\p{Latin}|\\p{M}")``
    count over total length (text_utils.py:72-77). Java regex spells
    the script property ``\\p{IsLatin}``; stays whole-stage codegen."""
    kept = F.regexp_replace(c, "[^\\p{IsLatin}\\p{M}]", "")
    return F.coalesce(
        F.length(kept).cast("double") / F.nullif(
            F.length(c).cast("double"), F.lit(0.0)
        ),
        F.lit(0.0),
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


def is_invalid_text(c: Column, min_len: int = 20, min_latin: float = 0.7) -> Column:
    """F9, the reference's default ALLOW_LATIN_EXTENDED=true path
    (text_utils.py:206-224; thresholds shared/defaults.py:66-67):
    trimmed length < 20, unicode-printable ratio < 0.6, or Latin-script
    ratio < 0.7. The reference runs fix_mojibake before the ratio
    checks; pipelines here repair upstream -- pass the repaired
    column (``fix_mojibake``) for byte-parity on mojibake'd input."""
    return (
        (F.length(F.trim(c)) < min_len)
        | (unicode_printable_ratio(c) < 0.6)
        | (latin_script_ratio(c) < min_latin)
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


def quality_score_4dp(c: Column) -> Column:
    """:func:`quality_score` rounded to 4 decimals in EXACT integer
    rational arithmetic -- the boundary-proof emission the registered
    reports use. The r9 scale-step gate caught the float chain landing
    on a .00005 boundary (score exactly 0.90375: Spark's left-
    associated double chain evaluates 0.9037499..., DuckDB's lands at
    or above the boundary, so ``round(x, 4)`` split 0.9037 / 0.9038).
    Every component ratio is an integer pair (a/b nonalpha, c/d
    unique-word, e/f printable, L low-quality), so

        score = (10bdf - 3adf - 2(d-c)bf - 2Lbdf - 3(f-e)bd) / 10bdf

    is an exact rational; half-up 4-dp rounding is the integer
    expression ``(2 * num * 10^4 + den) div (2 * den)`` (num clamped
    at 0 first -- the ``greatest`` clamp). Products run in
    DECIMAL(38,0) (HUGEINT in the oracle): headroom to ~1e6-char
    1e5-word documents. The NULL/empty contract matches the float
    form: empty text -> nar = 1, uwr = 0, par = 0, L never null."""
    ln = F.length(c)
    w = words(c)
    nw = F.size(w)
    dec = "decimal(38,0)"
    b = F.when(ln > 0, ln).otherwise(F.lit(1)).cast(dec)
    a = F.when(
        ln > 0, F.length(F.regexp_replace(c, "[A-Za-z ]", ""))
    ).otherwise(F.lit(1)).cast(dec)
    d = F.when(nw > 0, nw).otherwise(F.lit(1)).cast(dec)
    cc = F.when(nw > 0, F.size(F.array_distinct(w))).otherwise(
        F.lit(0)).cast(dec)
    f = b
    e = F.when(
        ln > 0, F.length(F.regexp_replace(c, "[^ -~]", ""))
    ).otherwise(F.lit(0)).cast(dec)
    big_l = F.when(is_low_quality(c), F.lit(1)).otherwise(
        F.lit(0)).cast(dec)
    bdf = b * d * f
    num = (
        F.lit(10).cast(dec) * bdf
        - F.lit(3).cast(dec) * a * d * f
        - F.lit(2).cast(dec) * (d - cc) * b * f
        - F.lit(2).cast(dec) * big_l * bdf
        - F.lit(3).cast(dec) * (f - e) * b * d
    )
    num = F.greatest(num, F.lit(0).cast(dec))
    den = F.lit(10).cast(dec) * bdf
    x = F.lit(2).cast(dec) * num * F.lit(10_000).cast(dec) + den
    y = F.lit(2).cast(dec) * den
    # exact integral division: x and y are exact decimals, % is the
    # exact remainder, so (x - x % y) is an exact multiple of y and
    # the decimal division yields the exact integer quotient (no
    # scale-rounding hazard -- the quotient has no fractional part)
    units = ((x - x % y) / y).cast("long")
    return units.cast("double") / F.lit(10_000.0)
