"""Query registry: every operator from SURVEY.md §2 as a named pair of
(PySpark implementation, DuckDB oracle SQL) for differential testing.

The driver contract (`__spark_entry__.py`) consumes this registry verbatim:
``queries()`` returns the Spark callables, ``oracle_sql()`` the SQL strings.
Ops whose semantics are not ANSI-SQL-expressible (approx sketches,
engine-specific hashes, streaming state) register with ``oracle=None`` and
get the driver's weaker rows-only check.

Design rules (SURVEY.md §7.2):
- Alias every computed column identically in Spark and SQL — the driver's
  compare sorts columns by name before hashing.
- Round float aggregates (sum/avg are reduction-order-dependent between
  engines); pure row-wise double arithmetic is IEEE-deterministic and needs
  no rounding.
- Keep plans narrow and single-stage where possible: at the bench scale
  factors, Spark's fixed overheads dominate, so plan simplicity wins.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan — Catalyst handles column
    pruning and predicate pushdown from whatever the query does downstream.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; we read nanos as long (legacy conf)
    and rebuild a microsecond TimestampType column. Floor-division matches
    DuckDB's own ns→µs truncation, so oracle comparisons stay exact.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # pin the session tz: the LTZ column below follows the session
        # timezone for window bucketing and collected wall-clock values —
        # must equal DuckDB's naive (UTC-as-stored) view even if the
        # driver's session runs in a non-UTC zone
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            # TIMESTAMP(NANOS) fixtures: the vectorized reader rejects
            # nanos, so read as long (legacy conf above) and rebuild µs.
            # Integer `div`, not `/`: float division loses precision on
            # epoch-nano magnitudes (2^53 < 1.7e18) and lands 1µs off
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) fixtures arrive as
            # NTZ; with the session tz pinned UTC the cast to LTZ is
            # value-preserving. LTZ is required downstream: watermarks /
            # event-time streaming reject NTZ event-time columns.
            # Explicit TimestampType, not the "timestamp" string: the string
            # resolves via spark.sql.timestampType, which a deployment could
            # set to TIMESTAMP_NTZ, silently making this cast a no-op
            df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
        return df
    return spark.read.parquet(path)


def load_par(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Like `load`, but repartitioned to the session's parallelism.

    The fixture tables are single parquet files → Spark gives them one
    input partition, which serializes compute-heavy per-row work (shingle
    hashing, regex profiling, cosine folds) onto one core. At production
    scale inputs arrive as many files and this is unnecessary; for the
    single-file case the tiny shuffle buys full-width parallelism."""
    df = load(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "",
             tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                   doc=doc or (fn.__doc__ or ""), tags=tags,
                                   bench=bench)
        return fn
    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}
