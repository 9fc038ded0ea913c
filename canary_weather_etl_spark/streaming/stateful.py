"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 extension: the reference has no streaming at all; this is
the 'custom stateful operator' rung of the ladder — used only because no
built-in aggregation expresses cross-batch running state with arbitrary
per-group logic).

`running_user_totals`: per-user cumulative (count, sum, max) maintained in
GroupState across micro-batches, emitting one row per user per batch with
the updated totals. The state payload is a 3-tuple — constant-size per key,
so state store growth is O(distinct users), watermark-free by design (a
production job would add a timeout to expire idle users; shown via the
`timeout` parameter).

The UDF is self-contained (stdlib/pandas only inside) for the same
worker-PYTHONPATH reason as operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
    StructField("mx", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("max_value", DoubleType()),
])


def running_user_totals(events: DataFrame,
                        timeout: str = "NoTimeout") -> DataFrame:
    """Cumulative per-user totals across micro-batches (count/sum/max of
    `value`), one output row per user per batch that saw that user."""

    def update(key, pdfs, state):
        import pandas as _pd

        (user_id,) = key
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield _pd.DataFrame([{
            "user_id": user_id, "n_events": n,
            "total_value": total, "max_value": mx,
        }])

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )


# ----------------- transformWithState (Spark 4 successor API) ----------------

def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same cumulative per-user totals on Spark 4's
    ``transformWithStateInPandas`` — the successor to
    applyInPandasWithState: state is named and composable (value/list/map
    handles instead of one tuple), timers are first-class, and the state
    store is RocksDB-backed (the operator REQUIRES
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider — HDFS-backed state is not supported).
    Kept alongside the original so both stateful APIs stay exercised; the
    semantics and schemas are identical, which the paired test asserts.
    ENVIRONMENT NOTE: the TWS state-server protocol imports
    google.protobuf at query start; in containers without protobuf the
    paired test skips and applyInPandasWithState stays the exercised
    path."""
    import pandas as _pd
    from pyspark.sql.streaming import StatefulProcessor

    class _RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            if self._totals.exists():
                n, total, mx = self._totals.get()
            else:
                n, total, mx = 0, 0.0, float("-inf")
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._totals.update((n, total, mx))
            yield _pd.DataFrame([{
                "user_id": key[0], "n_events": n,
                "total_value": total, "max_value": mx,
            }])

        def close(self) -> None:
            pass

    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
