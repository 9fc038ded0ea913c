"""canary_weather_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``ilias-lp/canary-weather-etl``
(/root/reference/README.md — a Lambda→S3→Glue-PySpark→Athena weather ETL),
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle sizing, Arrow).
- ``sources``    : semi-structured ingestion (the reference's two raw JSON
                   shapes), parquet IO, partitioned sinks, lineage-from-path.
- ``operators``  : relational building blocks (top-k, upsert/merge, dedup,
                   similarity search, text analysis, multimodal plumbing).
- ``plans``      : the query registry — every SURVEY.md §2 operator exposed
                   as a named (spark_fn, oracle_sql) pair for differential
                   testing against DuckDB.
- ``streaming``  : Structured Streaming analogues (windowed aggs, watermark
                   dedupe) of the reference's micro-batch incremental path.
"""

__version__ = "0.1.0"
