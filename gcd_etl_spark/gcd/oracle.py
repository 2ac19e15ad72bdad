"""Independent DuckDB restatement of the GCD snapshot pipeline.

This is the golden-test oracle (SURVEY.md §5.2 layer 2): the whole
denormalized snapshot build (reference Main.java:134-216 join tree +
§2.8 scalar transforms + GcdStoryCredit.java credit subpipeline)
re-expressed as ONE ANSI-SQL statement DuckDB can run over parquet
views named after the 13 GCD input tables. The Spark plan
(gcd_etl_spark/gcd/pipeline.py) must hash-match this row-for-row.

The SQL is generated, not hand-maintained, so each scalar helper has
exactly one SQL restatement (mirroring functions/scalar.py semantics
but written against DuckDB's function surface, independently of
Spark's).
"""

from __future__ import annotations

import datetime as _dt

from gcd_etl_spark.gcd.credits import ATOMIC_FIELDS, CREDIT_TYPE_EXPANSION

#: Legacy semicolon-field fallback exists for these 6 of 8 atomic
#: types (reference Main.java:484-492; painting has no legacy column).
LEGACY_FIELDS = {"script", "pencils", "inks", "colors", "letters", "editing"}


def _jlong(x: str) -> str:
    """ResultSet.getLong: NULL -> 0 (reference Main.java:611-616)."""
    return f"COALESCE(CAST({x} AS BIGINT), 0)"


def _jint(x: str) -> str:
    """ResultSet.getInt: NULL -> 0 (reference Main.java:602-607)."""
    return f"COALESCE(CAST({x} AS INT), 0)"


def _jbool(x: str) -> str:
    """getInt(x) == 1 (reference Main.java:410)."""
    return f"(COALESCE(CAST({x} AS INT), 0) = 1)"


def _date_str_int(x: str) -> str:
    """F3 — full-match YYYY-MM-DD -> yyyymmdd int, else -1
    (reference Main.java:619-635, Matcher.matches)."""
    return (
        rf"CASE WHEN regexp_matches({x}, '^\d{{4}}-\d{{2}}-\d{{2}}$') "
        rf"THEN CAST(replace(substr({x}, 1, 10), '-', '') AS INT) ELSE -1 END"
    )


def _epoch_date(x: str) -> str:
    """F1+F4 — timestamp -> epoch secs -> yyyymmdd int, -1 on
    null/<=0 (reference Main.java:637-650); UTC wall time."""
    return (
        f"CASE WHEN epoch({x}) > 0 "
        f"THEN CAST(strftime({x}, '%Y%m%d') AS INT) ELSE -1 END"
    )


def _multi_split(x: str) -> str:
    """F2 — Java ``split("\\s*;\\s*")`` semantics: trailing empty
    strings dropped, '' -> [''], all-separator -> [], null -> null
    (reference Main.java:535-547)."""
    return (
        f"CASE WHEN {x} IS NULL THEN NULL "
        f"WHEN {x} = '' THEN [''] "
        rf"WHEN regexp_matches({x}, '^(\s*;\s*)*$') THEN CAST([] AS VARCHAR[]) "
        rf"ELSE regexp_split_to_array(regexp_replace({x}, '(\s*;\s*)+$', ''), '\s*;\s*') END"
    )


def _decode(x: str, table: str, val: str) -> str:
    """F9/J9 — dictionary decode, miss -> null (reference
    Main.java:549-558); probe key goes through getInt's NULL->0."""
    return f"(SELECT d.{val} FROM {table} d WHERE d.id = {_jint(x)})"


def run_epoch_seconds(run_date: str) -> int:
    """F5 — run date at GMT-06:00 midnight -> epoch seconds
    (reference Main.java:59-60); restated independently of the
    pipeline's implementation."""
    y, m, d = (int(v) for v in run_date.split("-"))
    return int(
        _dt.datetime(y, m, d, tzinfo=_dt.timezone(_dt.timedelta(hours=-6))).timestamp()
    )


def _credits_cte() -> str:
    expansion_rows = ", ".join(
        f"({tid}, '{atomic}')"
        for tid, fields in sorted(CREDIT_TYPE_EXPANSION.items())
        for atomic in fields
    )
    return f"""
expansion(credit_type_id, atomic) AS (VALUES {expansion_rows}),
credit_rows AS (
    SELECT c.story_id, e.atomic, c.id AS rid,
           cr2.gcd_official_name AS nm, cr2.id AS cid
    FROM gcd_story_credit c
    JOIN gcd_creator_name_detail n ON c.creator_id = n.id
    JOIN gcd_creator cr2 ON n.creator_id = cr2.id
    JOIN expansion e ON c.credit_type_id = e.credit_type_id
),
credits AS (
    SELECT story_id,
           -- (rid, nm, cid): same total order as Spark's array_sort
           -- over the whole struct, so rid ties stay deterministic
           list(struct_pack(rid := rid, atomic := atomic, nm := nm, cid := cid)
                ORDER BY rid, nm, cid) AS allc
    FROM credit_rows GROUP BY story_id
)"""


def snapshot_oracle_sql(run_date: str = "2024-01-15", extra_ctes: str = "") -> str:
    """The full pipeline restated; expects views/CTEs named after
    GCD_INPUT_TABLES to exist in the DuckDB session.

    ``extra_ctes`` (a ``name AS (...), ...`` block ending with a
    comma) lets callers synthesize the input tables inline — used by
    the driver-facing gcd_snapshot query, which derives them from the
    TPC-H fixtures (gcd/fixtures_adapter.py)."""
    unix_time = run_epoch_seconds(run_date)
    story_present = "st.id IS NOT NULL"
    credit_present = f"(cr.story_id IS NOT NULL AND {story_present})"

    def gate(expr: str) -> str:
        """P3 — story_* only on story rows (reference Main.java:459)."""
        return f"CASE WHEN {story_present} THEN {expr} END"

    credit_cols = []
    for field in ATOMIC_FIELDS:
        curated_names = f"[x.nm FOR x IN cr.allc IF x.atomic = '{field}']"
        curated_ids = f"[x.cid FOR x IN cr.allc IF x.atomic = '{field}']"
        if field in LEGACY_FIELDS:
            fallback = gate(_multi_split(f"st.{field}"))
        else:
            fallback = "NULL"
        credit_cols.append(
            f"CASE WHEN {credit_present} THEN {curated_names} "
            f"ELSE {fallback} END AS story_{field}"
        )
        credit_cols.append(
            f"CASE WHEN {credit_present} THEN {curated_ids} END"
            f" AS story_{field}_creator_id"
        )
    credit_sql = ",\n       ".join(credit_cols)

    return f"""
WITH {extra_ctes}{_credits_cte()}
SELECT
       {unix_time}::BIGINT AS unix_time,
       {_jlong("i.id")} AS issue_id,
       COALESCE(i.number, '') AS issue_number_raw,
       TRY_CAST(i.number AS INT) AS issue_number,
       {_date_str_int("i.key_date")} AS publication_date,
       COALESCE(i.price, '') AS price_raw,
       {_multi_split("i.price")} AS price,
       {_jint("i.page_count")} AS page_count,
       i.indicia_frequency AS indicia_frequency,
       i.isbn AS isbn,
       i.variant_name AS variant_name,
       {_jlong("i.variant_of_id")} AS variant_of_issue_id,
       i.barcode AS barcode,
       i.title AS title,
       {_date_str_int("i.on_sale_date")} AS on_sale_date,
       i.rating AS rating,
       {_jbool("i.volume_not_printed")} AS volume_not_printed,
       {_multi_split("i.editing")} AS editing,
       i.notes AS notes,
       {_epoch_date("i.created")} AS created,
       {_epoch_date("i.modified")} AS modified,
       {_jlong("s.id")} AS series_id,
       s.name AS series_name,
       {_jint("s.year_began")} AS series_year_began,
       {_jint("s.year_ended")} AS series_year_ended,
       {_jbool("s.is_current")} AS series_is_current,
       {_decode("s.country_id", "stddata_country", "code")} AS series_country_code,
       {_decode("s.language_id", "stddata_language", "code")} AS series_language_code,
       {_jbool("s.has_gallery")} AS series_has_gallery,
       {_jbool("s.is_comics_publication")} AS series_is_comics_publication,
       s.color AS series_color,
       s.dimensions AS series_dimensions,
       s.paper_stock AS series_paper_stock,
       {_multi_split("s.binding")} AS series_binding,
       s.publishing_format AS series_publishing_format,
       {_decode("s.publication_type_id", "gcd_series_publication_type", "name")} AS series_publishing_type,
       {_jbool("s.is_singleton")} AS series_is_singleton,
       {_epoch_date("s.created")} AS series_created,
       {_epoch_date("s.modified")} AS series_modified,
       {_jlong("p.id")} AS publisher_id,
       p.name AS publisher_name,
       {_decode("p.country_id", "stddata_country", "code")} AS publisher_country_code,
       {_epoch_date("p.created")} AS publisher_created,
       {_epoch_date("p.modified")} AS publisher_modified,
       p.url AS publisher_url,
       {_jlong("ip.id")} AS indicia_publisher_id,
       ip.name AS indicia_publisher_name,
       {_decode("ip.country_id", "stddata_country", "code")} AS indicia_publisher_country_code,
       {_jlong("ip.parent_id")} AS indicia_publisher_parent_id,
       {_jint("ip.year_began")} AS indicia_publisher_year_began,
       {_jint("ip.year_ended")} AS indicia_publisher_year_ended,
       {_jbool("ip.is_surrogate")} AS indicia_publisher_is_surrogate,
       ip.url AS indicia_publisher_url,
       {_epoch_date("ip.created")} AS indicia_publisher_created,
       {_epoch_date("ip.modified")} AS indicia_publisher_modified,
       {_jlong("b.id")} AS brand_id,
       b.name AS brand_name,
       b.url AS brand_url,
       {_epoch_date("b.created")} AS brand_created,
       {_epoch_date("b.modified")} AS brand_modified,
       st.id AS story_id,
       {gate("st.title")} AS story_title,
       {gate("st.feature")} AS story_feature,
       {gate(_jint("st.sequence_number"))} AS story_sequence_number,
       {gate(_jint("st.page_count"))} AS story_page_count,
       {credit_sql},
       CASE WHEN {credit_present} THEN 'gcd_story_credit'
            WHEN {story_present} THEN 'gcd_story' END AS story_credit_source,
       {gate(_multi_split("st.genre"))} AS story_genre,
       {gate(_multi_split("st.characters"))} AS story_characters,
       {gate(_decode("st.type_id", "gcd_story_type", "name"))} AS story_type,
       {gate("st.job_number")} AS story_job_number,
       {gate("st.first_line")} AS story_first_line,
       {gate(_epoch_date("st.created"))} AS story_created,
       {gate(_epoch_date("st.modified"))} AS story_modified
FROM gcd_issue i
JOIN gcd_series s ON i.series_id = s.id
JOIN gcd_publisher p ON s.publisher_id = p.id
LEFT JOIN gcd_indicia_publisher ip ON i.indicia_publisher_id = ip.id
LEFT JOIN gcd_brand b ON i.brand_id = b.id
LEFT JOIN gcd_story st ON st.issue_id = i.id
LEFT JOIN credits cr ON st.id = cr.story_id
"""
