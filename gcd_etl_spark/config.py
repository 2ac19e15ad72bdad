"""YAML configuration surface (reference parity).

The reference boots from a YAML file deserialized into
``GcdConfiguration { Gcdatabase { url, user, password, GcdSchema
flags } }`` (reference GcdConfiguration.java:3-18, Gcdatabase.java:
4-47, GcdSchema.java:8-13, example.yml:1-10). This module binds the
same file shape to the engine's typed equivalents:

* ``gcdatabase.url/user/password`` -> :class:`JdbcSource`
  (sources/jdbc.py — the partitioned staging reader's connection);
* ``gcdatabase.gcdSchema.*`` (camelCase, Java-bean keys) ->
  :class:`GcdSchemaFlags` (gcd/schema.py — the P2 column-elision
  flags), defaulting every flag to True exactly like the reference.

Secrets note: the reference also resolves credentials from a secrets
manager (download.py:17-26) — an environment concern we deliberately
keep out of the engine (SURVEY.md §7.6); pass resolved credentials in
the YAML or override ``user``/``password`` after loading.
"""

from __future__ import annotations

from dataclasses import dataclass

from gcd_etl_spark.gcd.schema import GcdSchemaFlags
from gcd_etl_spark.sources.jdbc import JdbcSource

#: Java-bean key (reference GcdSchema.java) -> GcdSchemaFlags field.
_FLAG_KEYS = {
    "publicationType": "publication_type",
    "volumeNotPrinted": "volume_not_printed",
    "seriesIsSingleton": "series_is_singleton",
    "storyFirstLine": "story_first_line",
    "storyCredit": "story_credit",
}


@dataclass(frozen=True)
class GcdConfiguration:
    """Typed mirror of the reference's root config object."""

    source: JdbcSource
    schema_flags: GcdSchemaFlags


def load_config_file(path: str) -> GcdConfiguration:
    """Parse an ``example.yml``-shaped config FILE."""
    with open(path, encoding="utf-8") as fh:
        return load_config_text(fh.read())


def load_config(path_or_text: str) -> GcdConfiguration:
    """Parse an ``example.yml``-shaped config (path or YAML text).

    Unknown keys fail loudly — a typo'd flag silently defaulting to
    True is exactly how a column-elision config rots.

    Dispatch is explicit, not filesystem-probing (ADVICE round 6: an
    os.path.exists probe would silently read a FILE when handed YAML
    text that happens to equal an existing relative path): anything
    containing a newline is YAML text — every valid config document
    needs ``gcdatabase:`` plus a nested key, so it cannot be
    one-line in BLOCK style — and a one-liner opening with ``{`` is
    FLOW-style YAML (``{gcdatabase: {url: ...}}``), which no sane
    path starts with (ADVICE round 7: flow-style one-liners used to
    misroute to the file branch and die with FileNotFoundError).
    Everything else is a path. (A colon test was considered and
    rejected: legitimate paths carry colons, e.g. the timestamped
    archive dirs acquire.py derives, and Windows drive prefixes —
    round-7 review finding.) Callers that know which they hold
    should use load_config_file / load_config_text directly.
    """
    if "\n" in path_or_text or path_or_text.lstrip().startswith("{"):
        return load_config_text(path_or_text)
    return load_config_file(path_or_text)


def load_config_text(text: str) -> GcdConfiguration:
    """Parse an ``example.yml``-shaped YAML config document."""
    import yaml

    raw = yaml.safe_load(text)
    if not isinstance(raw, dict) or "gcdatabase" not in raw:
        raise ValueError("config must have a top-level 'gcdatabase' mapping")
    db = dict(raw["gcdatabase"] or {})
    flags_raw = dict(db.pop("gcdSchema", None) or {})

    known_db = {"url", "user", "password", "driver", "fetchsize"}
    unknown = set(db) - known_db
    if unknown:
        raise ValueError(f"unknown gcdatabase keys: {sorted(unknown)}")
    if "url" not in db:
        raise ValueError("gcdatabase.url is required")

    unknown_flags = set(flags_raw) - set(_FLAG_KEYS)
    if unknown_flags:
        raise ValueError(f"unknown gcdSchema flags: {sorted(unknown_flags)}")
    flags = GcdSchemaFlags(
        **{
            _FLAG_KEYS[k]: bool(v)
            for k, v in flags_raw.items()
        }
    )
    return GcdConfiguration(source=JdbcSource(**db), schema_flags=flags)
