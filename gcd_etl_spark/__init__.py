"""gcd_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ETL (``youknowjack/gcd-etl``, a
single-threaded Java/MySQL snapshot builder), re-expressed as
idiomatic Spark DataFrame/SQL plans, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) such an engine needs at 100 TB.

Layout:
    session     SparkSession builder (UTC, AQE, arrow on)
    sources     table catalog readers (parquet / jdbc staging) + sinks
    functions   scalar/text/vector column-expression libraries
    operators   dedup, similarity, event-time windows, multimodal
    gcd         the flagship denormalizing snapshot pipeline
    streaming   structured-streaming variants of the window operators
"""

__version__ = "0.1.0"
