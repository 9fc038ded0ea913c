"""litexpr (r14): the SQL-string literal builders must produce the SAME
analyzed expressions as the element-wise py4j shapes they replace —
same values, same types, same plans. If these drift, the optimization
changed semantics, which is exactly what it must never do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from canary_weather_etl_spark.functions import litexpr as X

@pytest.fixture(scope="module")
def frame(spark):
    rows = [(i, [((i * 7 + j * 13) % 41) - 20 for j in range(8)])
            for i in range(32)]
    return spark.createDataFrame(rows, "vec_id BIGINT, qvec ARRAY<BIGINT>")


CENTS = {0: [3, -1, 4, 1, -5, 9, 2, -6],
         1: [-2, 7, 1, -8, 2, 8, -1, 8],
         2: [0, 0, 0, 0, 0, 0, 0, 0]}


def _old_sqdist(cent):
    carr = F.array(*[F.lit(int(v)).cast("long") for v in cent])
    diff = F.zip_with(F.col("qvec"), carr, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff, F.lit(0).cast("long"), lambda acc, x: acc + x)


def test_sqdist_matches_elementwise_shape(frame):
    old = frame.select(_old_sqdist(CENTS[0]).alias("d"))
    new = frame.select(F.expr(X.sqdist_sql("qvec", CENTS[0])).alias("d"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()


def test_argmin_struct_matches_elementwise_shape(frame):
    old_best = F.array_min(F.array(*[
        F.struct(_old_sqdist(c).alias("d"),
                 F.lit(int(cid)).cast("int").alias("cid"))
        for cid, c in sorted(CENTS.items())]))
    old = frame.select(old_best["cid"].alias("cid"),
                       old_best["d"].alias("d"))
    sql = X.argmin_struct_sql("qvec", CENTS)
    new = frame.select(F.expr(f"({sql}).cid").alias("cid"),
                       F.expr(f"({sql}).d").alias("d"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()


def test_case_long_array_matches_when_chain(frame):
    keyed = frame.withColumn("k", (F.col("vec_id") % 3).cast("int"))
    cexpr = None
    for cid, c in sorted(CENTS.items()):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in c])
        cexpr = (F.when(F.col("k") == cid, arr) if cexpr is None
                 else cexpr.when(F.col("k") == cid, arr))
    old = keyed.select(F.zip_with("qvec", cexpr,
                                  lambda x, y: x - y).alias("r"))
    case = X.case_long_array_sql("k", CENTS)
    new = keyed.select(
        F.expr(f"zip_with(qvec, {case}, (x, y) -> x - y)").alias("r"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()


def test_dot_sql_matches_elementwise_shape(frame):
    w = CENTS[1]
    warr = F.array(*[F.lit(int(v)).cast("long") for v in w])
    old = frame.select(
        F.aggregate(F.zip_with("qvec", warr, lambda x, y: x * y),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("p"))
    new = frame.select(F.expr(X.dot_sql("qvec", w)).alias("p"))
    assert old.schema == new.schema
    assert old.collect() == new.collect()


def test_long_array_types_and_values(spark):
    df = spark.range(1).select(X.long_array([1, -2, 3]).alias("a"))
    assert df.schema["a"].dataType.simpleString() == "array<bigint>"
    assert df.collect()[0]["a"] == [1, -2, 3]
