"""GCD snapshot output schema + input-drift feature flags.

The 89-field output record mirrors the reference's Avro schema
(reference src/main/avro/issue_data.avsc:1-94) 1:1 in name, type,
and order; Avro ``["null", T]`` unions become nullable Spark fields,
``default: ""`` strings become non-null with '' fill.

``GcdSchemaFlags`` reproduces the reference's manual schema-evolution
mechanism (reference GcdSchema.java:8-13): each flag gates columns
that newer/older GCD dumps may lack. Where the reference spliced
column names out of its SQL string (reference Main.java:218-233), we
emit typed nulls — same output contract, no string surgery.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class GcdSchemaFlags:
    """Input-schema feature flags (reference GcdSchema.java:8-13)."""

    publication_type: bool = True
    volume_not_printed: bool = True
    series_is_singleton: bool = True
    story_first_line: bool = True
    story_credit: bool = True


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


_S = T.StringType()
_I = T.IntegerType()
_L = T.LongType()
_B = T.BooleanType()
_AS = T.ArrayType(T.StringType())
_AL = T.ArrayType(T.LongType())

#: Field order matches issue_data.avsc exactly.
GCD_SNAPSHOT_SCHEMA = T.StructType(
    [
        _f("unix_time", _L, False),
        _f("issue_id", _L, False),
        _f("issue_number_raw", _S, False),  # avro default ""
        _f("issue_number", _I),
        _f("publication_date", _I),
        _f("price_raw", _S, False),  # avro default ""
        _f("price", _AS),
        _f("page_count", _I),
        _f("indicia_frequency", _S),
        _f("isbn", _S),
        _f("variant_name", _S),
        _f("variant_of_issue_id", _L),
        _f("barcode", _S),
        _f("title", _S),
        _f("on_sale_date", _I),
        _f("rating", _S),
        _f("volume_not_printed", _B),
        _f("editing", _AS),
        _f("notes", _S),
        _f("created", _I, False),
        _f("modified", _I, False),
        _f("series_id", _L, False),
        _f("series_name", _S),
        _f("series_year_began", _I),
        _f("series_year_ended", _I),
        _f("series_is_current", _B),
        _f("series_country_code", _S),
        _f("series_language_code", _S),
        _f("series_has_gallery", _B),
        _f("series_is_comics_publication", _B),
        _f("series_color", _S),
        _f("series_dimensions", _S),
        _f("series_paper_stock", _S),
        _f("series_binding", _AS),
        _f("series_publishing_format", _S),
        _f("series_publishing_type", _S),
        _f("series_is_singleton", _B),
        _f("series_created", _I, False),
        _f("series_modified", _I, False),
        _f("publisher_id", _L, False),
        _f("publisher_name", _S),
        _f("publisher_country_code", _S),
        _f("publisher_created", _I, False),
        _f("publisher_modified", _I, False),
        _f("publisher_url", _S),
        _f("indicia_publisher_id", _L),
        _f("indicia_publisher_name", _S),
        _f("indicia_publisher_country_code", _S),
        _f("indicia_publisher_parent_id", _L),
        _f("indicia_publisher_year_began", _I),
        _f("indicia_publisher_year_ended", _I),
        _f("indicia_publisher_is_surrogate", _B),
        _f("indicia_publisher_url", _S),
        _f("indicia_publisher_created", _I),
        _f("indicia_publisher_modified", _I),
        _f("brand_id", _L),
        _f("brand_name", _S),
        _f("brand_url", _S),
        _f("brand_created", _I),
        _f("brand_modified", _I),
        _f("story_id", _L),
        _f("story_title", _S),
        _f("story_feature", _S),
        _f("story_sequence_number", _I),
        _f("story_page_count", _I),
        _f("story_script", _AS),
        _f("story_script_creator_id", _AL),
        _f("story_pencils", _AS),
        _f("story_pencils_creator_id", _AL),
        _f("story_inks", _AS),
        _f("story_inks_creator_id", _AL),
        _f("story_colors", _AS),
        _f("story_colors_creator_id", _AL),
        _f("story_letters", _AS),
        _f("story_letters_creator_id", _AL),
        _f("story_editing", _AS),
        _f("story_editing_creator_id", _AL),
        _f("story_painting", _AS),
        _f("story_painting_creator_id", _AL),
        _f("story_credit_source", _S),
        _f("story_genre", _AS),
        _f("story_characters", _AS),
        _f("story_type", _S),
        _f("story_job_number", _S),
        _f("story_first_line", _S),
        _f("story_created", _I),
        _f("story_modified", _I),
    ]
)

#: GCD input table names (reference Main.java:211-216,
#: GcdStoryCredit.java:115-119, GcdMetadata.java:58-72).
GCD_INPUT_TABLES = (
    "gcd_issue",
    "gcd_series",
    "gcd_publisher",
    "gcd_indicia_publisher",
    "gcd_brand",
    "gcd_story",
    "gcd_story_credit",
    "gcd_creator_name_detail",
    "gcd_creator",
    "stddata_country",
    "stddata_language",
    "gcd_series_publication_type",
    "gcd_story_type",
)
