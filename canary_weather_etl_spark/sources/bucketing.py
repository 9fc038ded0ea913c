"""Bucketed tables: shuffle-free co-located joins (SURVEY.md 'Partitioning
& shuffle': bucketing for co-located joins).

At 100 TB the dominant cost of fact-to-fact joins is the shuffle. Writing
both tables bucketed by the join key with the same bucket count pins rows
to co-located buckets at WRITE time, so every subsequent join or
aggregation on that key skips its exchange entirely — pay the shuffle
once, reuse it forever. Bucketing requires the table catalog
(`saveAsTable`), not plain paths — the bucket spec lives in catalog
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16,
                   sort: bool = True) -> None:
    """Persist `df` as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets lets sort-merge joins skip the sort too."""
    writer = (df.write.mode("overwrite")
              .bucketBy(buckets, key))
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans SortMergeJoin with NO Exchange on either
    side (verify with .explain — tests assert it)."""
    # disable broadcast so the plan demonstrates the bucket-co-location
    # (small test tables would otherwise broadcast and hide the effect)
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, on=key, how=how)
