"""Driver-visible streaming proofs.

The streaming machinery (streaming/jobs.py, streaming/stateful.py) is
pytest-proven, but the driver's correctness gate only sees registry
queries. This module packages the checkpoint-restart exactly-once
guarantee as a registered query: it runs the REAL stop/land/restart
sequence against a checkpointed file-source stream and returns a batch
aggregate over the sink — any reprocessing after the restart doubles the
counts and hash-mismatches the oracle (which is plain batch SQL over the
same events, i.e. "each row exactly once").
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming import jobs as J
from .registry import load, register


@register(
    "q_stream_restart_dedup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS id_sum,
           CAST(MIN(event_id) AS BIGINT) AS id_min,
           CAST(MAX(event_id) AS BIGINT) AS id_max
    FROM events
    GROUP BY event_type
    """,
    doc="Checkpoint-restart exactly-once, driver-checkable "
        "(tests/test_streaming.py:221's proof as a registry query). "
        "Sequence: half the events land as batch A; an availableNow "
        "file-source stream with a checkpointLocation drains them to a "
        "parquet sink and STOPS; batch B lands next to the still-present "
        "A files; a NEW query restarts from the same checkpoint and must "
        "process only B. The returned aggregate over the sink equals plain "
        "batch SQL over all events iff no row was processed twice — "
        "id_sum/n double on any reprocessing. Runs in a per-invocation "
        "temp dir (removed after collect-independent aggregation).",
    tags=("streaming", "exactly-once"),
)
def q_stream_restart_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="stream_restart_")
    src, table, ckpt = f"{work}/src", f"{work}/table", f"{work}/ckpt"
    try:
        a = base.filter(F.col("event_id") % 2 == 0)
        b = base.filter(F.col("event_id") % 2 == 1)
        a.write.mode("overwrite").parquet(src)

        def drain() -> None:
            # J.drain fails loudly: letting a still-active query's
            # checkpoint be reused by the next drain() is a concurrent-query
            # error or checkpoint corruption, not a clean timeout
            stream = J.read_events_stream(spark, src, base.schema)
            J.drain(stream.writeStream.format("parquet")
                    .option("path", table)
                    .option("checkpointLocation", ckpt)
                    .outputMode("append")
                    .trigger(availableNow=True).start())

        drain()                              # stream sees only A
        b.write.mode("append").parquet(src)  # A files still in place
        drain()                              # restart: must process only B

        # materialize the aggregate BEFORE the temp dir is removed — the
        # returned DataFrame must not depend on the deleted sink files
        rows = (spark.read.parquet(table)
                .groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("event_id").alias("id_sum"),
                     F.min("event_id").cast("bigint").alias("id_min"),
                     F.max("event_id").cast("bigint").alias("id_max"))
                ).collect()
        return spark.createDataFrame(rows)
    finally:
        shutil.rmtree(work, ignore_errors=True)
