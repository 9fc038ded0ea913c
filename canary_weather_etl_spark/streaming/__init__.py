"""Structured Streaming surface (SURVEY.md §2.9).

The reference's incrementality is orchestrated micro-batch: monthly Lambdas
re-fetch a 31-day window into a staging prefix, then a Glue job upserts
(README.md:812-818, 1219-1557). This package is the streaming-native
re-expression: file-source streams with ``Trigger.AvailableNow`` (exactly
the reprocess-a-batch-when-it-lands semantics), watermarked windowed
aggregations, streaming dedupe, and a foreachBatch upsert sink that reuses
the same ``upsert_clean`` operator as the batch path.
"""

from .jobs import (  # noqa: F401
    stream_dedupe,
    stream_session_agg,
    stream_tumbling_agg,
    stream_upsert_sink,
)
