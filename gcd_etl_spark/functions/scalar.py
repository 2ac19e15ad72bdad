"""Scalar column-expression library — the reference's per-row helpers
as pure Catalyst expressions (SURVEY.md §2.8, F1-F13).

Every function here returns a ``Column`` built from
``pyspark.sql.functions`` only: JVM-side, whole-stage-codegen'd, no
Python in the hot path. Reference citations give the exact semantics
each preserves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Split pattern for multi-valued fields (reference Main.java:539:
#: ``value.split("\\s*;\\s*")``).
MULTI_VALUE_PATTERN = r"\s*;\s*"

#: Missing-value sentinel for int date/count fields on the index path
#: (reference Main.java:589-601,626-650).
INT_SENTINEL = -1


def multi_split(col: Column | str) -> Column:
    """F2 — semicolon-delimited string -> array<string>.

    Java ``split`` drops trailing empty strings; Spark ``F.split``
    keeps them, so we trim the trailing run explicitly. Null input
    propagates to a null array (reference Main.java:535-547: null ->
    consumer never called).

    Whitespace-class corner (hypothesis-found, r3): the pattern's
    ``\\s`` is JAVA's ASCII-only class ``[ \\t\\n\\x0b\\f\\r]`` —
    Spark compiles regexes with java.util.regex, so this matches the
    reference byte-for-byte. Python's ``\\s`` additionally matches
    U+0085/U+00A0/Unicode spaces, so ``';\\x85'`` splits to
    ``['', '\\x85']`` here (correct) but ``[]`` under a naive Python
    model — any Python-side model of this function must spell the
    ASCII class out (tests/test_properties.py).
    """
    c = F.col(col) if isinstance(col, str) else col
    # ONE regex pass (the split), then drop Java's trailing empties on
    # the ARRAY side: a per-element index transform + array_max finds
    # the last non-empty slot, slice keeps [1 .. last+1]. The elements
    # are few (~2-5) while the string is long, so the interpreted
    # element fold costs far less than a second regex pass over the
    # characters — a strip-the-string-first variant (regexp_replace of
    # the trailing (\s*;\s*)+\z run, re-evaluated by its CASE guard)
    # measured ~2x slower across the snapshot build's 10 splits.
    # Covers all Java corners: "a;;b" keeps the inner empty (only the
    # tail trims), all-separator input (";", " ; ") has no non-empty
    # slot -> last_idx -1 -> slice length 0 -> []; "\r" has no
    # separator at all -> single non-empty element kept.
    arr = F.split(c, MULTI_VALUE_PATTERN)
    last_idx = F.array_max(
        F.transform(arr, lambda x, i: F.when(x != "", i).otherwise(-1))
    )
    trimmed = F.slice(arr, 1, last_idx + 1)
    # Java `"".split(p)` returns [""], not [] — preserve that corner.
    return F.when(c == "", F.array(F.lit(""))).otherwise(trimmed)


def date_str_to_int(col: Column | str, sentinel: int | None = INT_SENTINEL) -> Column:
    """F3 — ``YYYY-MM-DD``-shaped string -> yyyymmdd int.

    Full-string regex match ``(\\d{4})-(\\d\\d)-(\\d\\d)`` (reference
    Main.java:46,619-635 uses ``Matcher.matches()`` — FULL match, so
    trailing garbage fails); no calendar validation ("1987-00-00" is a
    *match* in the reference and becomes 19870000 — we preserve that).
    Non-match / null -> ``sentinel`` (-1 on the index path, None for
    nullable parquet semantics).
    """
    c = F.col(col) if isinstance(col, str) else col
    # \A...\z, not ^...$: Java-regex $ matches BEFORE a final line
    # terminator, so "1987-03-01\n" would wrongly parse; the
    # reference's Matcher.matches() is whole-input. Same bug class as
    # multi_split's trailing-separator trim above.
    matched = c.rlike(r"\A\d{4}-\d{2}-\d{2}\z")
    as_int = F.regexp_replace(F.substring(c, 1, 10), "-", "").cast("int")
    fallback = F.lit(sentinel).cast("int") if sentinel is not None else F.lit(None).cast("int")
    return F.when(matched, as_int).otherwise(fallback)


def epoch_to_date_int(col: Column | str, sentinel: int | None = INT_SENTINEL) -> Column:
    """F4 — epoch seconds -> comparable yyyymmdd int (UTC).

    Reference Main.java:48,637-650: epoch > 0 formats with
    ``SimpleDateFormat("yMMdd")`` in JVM-default TZ; we pin UTC
    (session TZ) and document the delta. <=0 / null -> sentinel.
    """
    c = F.col(col) if isinstance(col, str) else col
    # Integer date math instead of date_format: no per-row string
    # round-trip (the flagship stamps 14 of these per output row).
    ts = F.timestamp_seconds(c)
    formatted = (F.year(ts) * 10000 + F.month(ts) * 100 + F.dayofmonth(ts)).cast("int")
    fallback = F.lit(sentinel).cast("int") if sentinel is not None else F.lit(None).cast("int")
    return F.when(c > 0, formatted).otherwise(fallback)


def try_int(col: Column | str) -> Column:
    """F7 — try-parse string -> int, null on failure.

    Reference Main.java:253-258: ``Integer.parseInt`` with the
    NumberFormatException swallowed. ``try_cast`` gives identical
    parse-or-null semantics without ANSI exceptions.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("int")


def try_long(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("long")


def int_to_bool(col: Column | str) -> Column:
    """F8 — ``value == 1`` int flag -> boolean (null-propagating).

    Reference Main.java:410,420,423-424,434,450 (parquet path only;
    the index path keeps raw ints — callers choose).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c == 1


def int_with_default(col: Column | str, default: int = INT_SENTINEL) -> Column:
    """P5 — missing int -> sentinel fill (reference Main.java:589-601)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("int"), F.lit(default))


def string_with_default(col: Column | str, default: str = "") -> Column:
    """P4 — Avro ``default:""`` strings (reference issue_data.avsc:8,11)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(default))


def dict_decode(col: Column | str, mapping: dict[int, str]) -> Column:
    """F9/J9 — tiny-dictionary decode as a literal map expression.

    Reference GcdMetadata loaded 4 dimension tables into RAM maps and
    probed per row (reference GcdMetadata.java:74-86, Main.java:549-558,
    emit-only-on-hit -> miss decodes to null). For dictionaries that
    fit in a literal (<~1000 entries) an inline ``map`` keeps the
    decode inside codegen; bigger dims should use ``broadcast_decode``.
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    if not pairs:
        return F.lit(None).cast("string")
    return F.element_at(F.create_map(*pairs), c)


def date_int_from_date(col: Column | str, sentinel: int | None = None) -> Column:
    """yyyymmdd int from a date/timestamp column (engine extension:
    same output domain as F3/F4 but for properly-typed inputs)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.date_format(c, "yyyyMMdd").cast("int")
    if sentinel is not None:
        out = F.coalesce(out, F.lit(sentinel))
    return out


def snapshot_int(run_date: str) -> int:
    """F6 — run date ``YYYY-MM-DD`` -> snapshot partition value
    (reference Main.java:383)."""
    return int(run_date.replace("-", ""))
