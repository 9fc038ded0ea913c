#!/usr/bin/env python
"""Stage probe: the portable-minhash SIGNATURE projection at the third
decade (r11, SCALE.md evidence).

The r10 stage attribution pinned `q_dedup_minhash_lsh`'s portable-basis
1000x gap entirely on the signature projection (md5+conv+32 universal-
hash transforms: 113.6 s vs the xxhash64 basis' 35.2 s at 5M docs; band
legs at parity). The r10 dead end (precomputing the md5 base hashes
into the checkpoint left the stage at ~99 s) plus an r11 one (a
Mersenne-fold `%` replacement made things WORSE — see the dead-end
note at operators/dedup.py above MINHASH_P) localize the cost to the
transform/array_min lambda shape itself: higher-order-function lambdas
are CodegenFallback, so every element×permutation pays interpreted
per-node eval dispatch, not silicon arithmetic. This probe A/Bs the
r11 fix — `_portable_minhash_agg_signatures`, explode + a codegen'd
32-way MIN aggregate — against the r10 lambda shape and the xxhash64
reference (in both shapes), over the SAME eagerly-checkpointed
shingle-set frame from the amplified 1000x documents fixture
(/tmp/bench_1000x, built by scripts/bench_scale.py).

Sink: xxhash64 over the whole signature array into one sum — forces
every element, returns one driver row (the bench_scale hash-sink
discipline; a bare count could prune the projection).

Usage:
  SPARK_GRAFT_DRIVER_MEM=64g python scripts/minhash_sig_probe.py [reps]
Prints one JSON line per variant (best-of-reps, all reps listed).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators import dedup as D  # noqa: E402
from canary_weather_etl_spark.session import get_spark  # noqa: E402

FIXTURE = os.environ.get("SPARK_GRAFT_1000X", "/tmp/bench_1000x")


def xxhash64_agg_signatures(sets):
    """The xxhash64 basis in the explode+agg shape — isolates how much
    of the win is codegen'd aggregation vs the hash family."""
    exploded = sets.select("doc", F.explode("sh").alias("shingle"))
    aggs = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(32)]
    return (exploded.groupBy("doc").agg(*aggs)
            .select("doc", F.array(*[f"h{i}" for i in range(32)])
                    .alias("signature")))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("minhash-sig-probe")
    docs = spark.read.parquet(f"{FIXTURE}/documents.parquet")
    sets = D.shingle_sets(docs, "doc_id", "text", n=2).localCheckpoint(
        eager=True)
    n = sets.count()

    variants = {
        "xxhash64_lambda": lambda: D.minhash_signatures_from_sets(
            sets, 32, portable_hash=False),
        "xxhash64_agg": lambda: xxhash64_agg_signatures(sets),
        "portable_lambda_r10": lambda: D._portable_lambda_signatures(
            sets, 32),
        "portable_agg_r11": lambda: D.minhash_signatures_from_sets(
            sets, 32, portable_hash=True),
    }

    def run(make):
        t0 = time.perf_counter()
        row = make().agg(F.bit_xor(F.xxhash64("signature")).alias("sink"),
                         F.count(F.lit(1)).alias("n")).collect()[0]
        return round(time.perf_counter() - t0, 2), int(row["n"]), row["sink"]

    sinks: dict[str, int] = {}
    for name, make in variants.items():
        times = []
        for _ in range(reps):
            t, rows, sink = run(make)
            times.append(t)
        sinks[name] = sink
        print(json.dumps({"variant": name, "n_docs": n, "rows": rows,
                          "best_sec": min(times), "reps_sec": times,
                          "sink": sink}), flush=True)
    # same spec, different physical plan: bit-identical or it's a bug
    assert sinks["portable_lambda_r10"] == sinks["portable_agg_r11"], \
        (sinks["portable_lambda_r10"], sinks["portable_agg_r11"])
    assert sinks["xxhash64_lambda"] == sinks["xxhash64_agg"], \
        (sinks["xxhash64_lambda"], sinks["xxhash64_agg"])
    print(json.dumps({"shape_sinks_identical": True}), flush=True)


if __name__ == "__main__":
    main()
