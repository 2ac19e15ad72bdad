"""Spark 4 Python DataSource for mysqldump INSERT files.

``spark.read.format("gcddump")`` — the dump tokenizer
(``sources.dump``) packaged behind Spark's user-defined data source
API (pyspark.sql.datasource, new surface in Spark 4), so dump text
participates in the reader pipeline like any built-in format:

    spark.dataSource.register(GcdDumpDataSource)
    df = (spark.read.format("gcddump")
          .schema("s_suppkey long, s_name string, ...")
          .option("table", "supplier")
          .option("path", "/data/dump/"))
          .load()

Compared to the ``stage_dump_table`` path (spark.read.text +
mapInPandas), the DataSource form owns its own PARTITIONING: one
input partition per dump file here (mysqldump writes one file per
table; nightly dumps arrive as many files), each read entirely
executor-side. At 100 TB the partitions() hook would instead emit
line-aligned byte ranges per file — the same splittability argument
as the text path (statement boundaries coincide with line
boundaries), just expressed in this API. The tokenizer itself is
shared with the staging path, so both readers are semantics-identical
by construction.
"""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class DumpFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _caster(dt: T.DataType):
    """Python-side try-cast with the same typed-null semantics as
    sources.dump.cast_fields (strict=False tolerance): unparseable
    values become nulls, never errors."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        def cast(v):
            try:
                return int(v) if v is not None else None
            except ValueError:
                return None
    elif isinstance(dt, (T.DoubleType, T.FloatType)):
        def cast(v):
            try:
                return float(v) if v is not None else None
            except ValueError:
                return None
    elif isinstance(dt, T.BooleanType):
        def cast(v):
            return None if v is None else v not in ("0", "", "0.0")
    else:
        def cast(v):
            return v
    return cast


class GcdDumpReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.table = options.get("table")
        self.path = options.get("path")
        if not self.table or not self.path:
            raise ValueError("gcddump requires .option('table', ...) and a load path")

    def partitions(self):
        import glob
        import os

        if os.path.isdir(self.path):
            paths = sorted(
                p for p in glob.glob(os.path.join(self.path, "*")) if os.path.isfile(p)
            )
        else:
            paths = [self.path]
        # one partition per dump file; a 100 TB deployment emits
        # line-aligned byte ranges here instead (see module doc)
        return [DumpFilePartition(p) for p in paths]

    def read(self, partition: DumpFilePartition):
        # executor-side: reuse the exact staging-path tokenizer
        from gcd_etl_spark.sources.dump import insert_table_name, iter_insert_tuples

        casts = [_caster(f.dataType) for f in self.schema.fields]
        n = len(casts)
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                if insert_table_name(line) != self.table:
                    continue
                for tup in iter_insert_tuples(line):
                    vals = tup[:n] + [None] * (n - len(tup)) if len(tup) != n else tup
                    yield tuple(c(v) for c, v in zip(casts, vals))


class GcdDumpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gcddump"

    def schema(self):
        raise ValueError(
            "gcddump has no self-describing schema; pass .schema(...) explicitly "
            "(dump files carry no types — the declared schema drives try-casts)"
        )

    def reader(self, schema: T.StructType) -> GcdDumpReader:
        return GcdDumpReader(schema, self.options)
