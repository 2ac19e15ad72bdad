"""YAML config loader round-trip (reference GcdConfiguration parity)."""

from __future__ import annotations

import pytest

from gcd_etl_spark.config import GcdConfiguration, load_config
from gcd_etl_spark.gcd.schema import GcdSchemaFlags

_EXAMPLE = """
gcdatabase:
  url: jdbc:mysql://HOST/DATABASE
  user: USERNAME
  password: PASSWORD
"""


def test_example_yml_shape_loads_with_default_flags():
    cfg = load_config(_EXAMPLE)
    assert isinstance(cfg, GcdConfiguration)
    assert cfg.source.url == "jdbc:mysql://HOST/DATABASE"
    assert cfg.source.user == "USERNAME"
    assert cfg.source.password == "PASSWORD"
    assert cfg.schema_flags == GcdSchemaFlags()  # all True, like the ref


def test_flags_bind_camel_case_java_bean_keys():
    cfg = load_config(
        _EXAMPLE + "  gcdSchema:\n    storyCredit: false\n    publicationType: false\n"
    )
    assert cfg.schema_flags.story_credit is False
    assert cfg.schema_flags.publication_type is False
    assert cfg.schema_flags.story_first_line is True


def test_loads_from_file(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text(_EXAMPLE)
    assert load_config(str(p)).source.url.startswith("jdbc:mysql://")


def test_unknown_keys_fail_loudly():
    with pytest.raises(ValueError, match="unknown gcdSchema flags"):
        load_config(_EXAMPLE + "  gcdSchema:\n    storyCreditz: true\n")
    with pytest.raises(ValueError, match="unknown gcdatabase keys"):
        load_config("gcdatabase:\n  url: x\n  s3bucket: y\n")
    with pytest.raises(ValueError, match="url is required"):
        load_config("gcdatabase:\n  user: x\n")


def test_config_feeds_jdbc_reader_options():
    from gcd_etl_spark.sources.jdbc import jdbc_reader_options

    cfg = load_config(_EXAMPLE)
    opts = jdbc_reader_options(
        cfg.source, "gcd_issue", partition_column="id", lower_bound=0,
        upper_bound=1000, num_partitions=8,
    )
    assert opts["url"] == cfg.source.url
    assert opts["dbtable"] == "gcd_issue"
    assert opts["numPartitions"] == "8"
