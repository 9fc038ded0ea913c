"""SparkSession factory with scale-oriented defaults.

The reference (README.md:609-614) builds a GlueContext per job and relies on
Glue defaults. We centralize one tuned builder: AQE on (adaptive shuffle
coalescing, broadcast conversion, skew-join splitting — important because the
reference's key domains are tiny: 14 locations, 5 event types), dynamic
partition overwrite for the upsert path (replaces the reference's per-partition
hand-built-path loop at README.md:1493-1545), and Arrow for any pandas-UDF
extension operator.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults are sized for local[32] test runs; on a real cluster these are
# expected to be overridden by spark-submit conf (shuffle.partitions ~ 2-3x
# total cores, maxPartitionBytes 128-256m for 100 TB scans).
_DEFAULT_CONF = {
    # Let AQE re-plan at runtime: coalesce post-shuffle partitions, convert
    # sort-merge joins to broadcast when a side turns out small, split skewed
    # partitions (location/event_type keys are low-cardinality → skew-prone).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Upserts rewrite only the partitions present in the incoming frame
    # (reference semantics, README.md:1488-1545, without the driver loop).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow-batched transfer for pandas_udf / mapInPandas extension ops.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local-mode shuffle sizing; cluster deployments override.
    "spark.sql.shuffle.partitions": "32",
    # Parquet: vectorized reader on, don't write _SUCCESS noise in tests.
    "spark.sql.parquet.filterPushdown": "true",
    # functions/litexpr.py splices data-derived strings into SQL text
    # assuming the DEFAULT parser escaping (backslash escapes live);
    # pin it so a deployment enabling the legacy conf cannot silently
    # change parsed literal values (ADVICE r14). This is the Spark
    # default — stated, not changed.
    "spark.sql.parser.escapedStringLiterals": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "canary-weather-etl-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Return the shared SparkSession, creating it if needed.

    One session per process: at the small scale factors the driver benches
    at, JVM/session startup dominates, so every entry point (tests, bench,
    __spark_entry__) funnels through here.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in _DEFAULT_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
