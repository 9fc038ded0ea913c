#!/usr/bin/env python
"""Attribute q_stream_ann_ingest's wall (SCALE.md r12; r11 verdict #7:
the entry's sf0.1 wall spread 21-63 s run-to-run — attribute the two
availableNow cycles vs the encode, and either cut a cycle or document
the stream-machinery floor).

Replays the registered entry's exact pipeline with per-component
timers:

  model   quantizer train + literal collect + residuals + PQ books
  seed    seed-third encode + initial code write
  drops   per drop: fixture write, stream cycle wall (start→drain),
          and the encode_batch body wall measured inside foreachBatch
          (cycle − encode = the stream-machinery share)
  query   the final ADC top-k over the accumulated codes

Variants:
  two_cycles   the shipped shape (one availableNow stream per drop)
  one_cycle    both drops pre-written, ONE availableNow stream with
               maxFilesPerTrigger=8 → still >= 2 micro-batches, one
               stream lifecycle. Encoding is row-wise against frozen
               literals (batch-invariant, pytest-pinned), so the result
               cannot change — asserted here against the two-cycle run.

Usage: python scripts/ann_ingest_attrib.py [--reps 3]
Prints one JSON line per (variant, rep) plus a component table.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators import clustering as C  # noqa: E402
from canary_weather_etl_spark.operators import similarity as S  # noqa: E402
from canary_weather_etl_spark.plans.registry import load_par  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402
from canary_weather_etl_spark.streaming.jobs import drain  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_variant(spark, variant: str) -> tuple[dict, list]:
    t = {}
    t0 = time.perf_counter()
    e = load_par(spark, SF_DIR, "embeddings")
    n = e.count()
    seed = e.filter(F.col("vec_id") * 3 < n)
    drop_a = e.filter((F.col("vec_id") * 3 >= n)
                      & (F.col("vec_id") * 3 < 2 * n))
    drop_b = e.filter(F.col("vec_id") * 3 >= 2 * n)
    cdf = S.train_ivf_quantizer_fixed(seed, n_lists=8, iterations=2)
    cents = {int(r["list_id"]): [int(v) for v in r["centroid"]]
             for r in cdf.collect()}
    rseed = S.ivf_residuals(seed, cents)
    books = S.pq_train_codebooks(rseed.select("vec_id", "qvec"),
                                 m=2, k=4, iterations=2)
    t["model"] = round(time.perf_counter() - t0, 2)

    base = tempfile.mkdtemp(prefix=f"ann_attrib_{variant}_")
    drops = os.path.join(base, "drops")
    codes_dir = os.path.join(base, "codes")
    ckpt = os.path.join(base, "ckpt")

    t0 = time.perf_counter()
    (S.ivfpq_encode_frozen(seed, cents, books)
     .write.mode("overwrite").parquet(os.path.join(codes_dir, "seed")))
    t["seed_encode"] = round(time.perf_counter() - t0, 2)

    encode_walls: list[float] = []

    def encode_batch(batch, batch_id: int) -> None:
        b0 = time.perf_counter()
        (S.ivfpq_encode_frozen(batch, cents, books)
         .write.mode("overwrite")
         .parquet(os.path.join(codes_dir, f"batch_{int(batch_id):05d}")))
        encode_walls.append(round(time.perf_counter() - b0, 2))

    schema = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    if variant == "two_cycles":
        cycles = []
        for b in (drop_a, drop_b):
            t0 = time.perf_counter()
            b.repartition(8).write.mode("append").parquet(drops)
            tw = time.perf_counter()
            q = (spark.readStream.schema(schema).parquet(drops)
                 .writeStream.foreachBatch(encode_batch)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            drain(q, timeout=600)
            cycles.append({"drop_write": round(tw - t0, 2),
                           "cycle": round(time.perf_counter() - tw, 2)})
        t["cycles"] = cycles
    else:  # one_cycle
        t0 = time.perf_counter()
        drop_a.repartition(8).write.mode("append").parquet(drops)
        drop_b.repartition(8).write.mode("append").parquet(drops)
        tw = time.perf_counter()
        q = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 8).parquet(drops)
             .writeStream.foreachBatch(encode_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        drain(q, timeout=600)
        t["cycles"] = [{"drop_write": round(tw - t0, 2),
                        "cycle": round(time.perf_counter() - tw, 2)}]
    t["encode_walls"] = encode_walls

    t0 = time.perf_counter()
    codes = (spark.read.option("recursiveFileLookup", "true")
             .parquet(codes_dir))
    q0 = [int(v) for v in
          C.quantize_vectors(e).filter(F.col("vec_id") == 0)
          .collect()[0]["qvec"]]
    top = S.ivfpq_adc_over_codes(codes, q0, cents, books, k_top=10,
                                 n_probe=2, exclude_vec_id=0)
    rows = sorted(tuple(r) for r in top.collect())
    t["query"] = round(time.perf_counter() - t0, 2)
    t["total"] = round(sum(v for v in (t["model"], t["seed_encode"],
                                       t["query"]))
                       + sum(c["drop_write"] + c["cycle"]
                             for c in t["cycles"]), 2)
    shutil.rmtree(base, ignore_errors=True)
    return t, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("canary-ann-ingest-attrib")
    spark.range(1000).selectExpr("sum(id)").collect()

    ref_rows = None
    for variant in ("two_cycles", "one_cycle"):
        for rep in range(args.reps):
            t, rows = run_variant(spark, variant)
            if ref_rows is None:
                ref_rows = rows
            assert rows == ref_rows, f"{variant} changed the result!"
            print(json.dumps({"variant": variant, "rep": rep, **t}),
                  flush=True)


if __name__ == "__main__":
    main()
