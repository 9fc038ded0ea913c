#!/usr/bin/env python
"""Stage attribution for q_bpe_encode_ids' execution tail (VERDICT r14
#4). The construction cost was fixed in r14 (litexpr merge folds); what
remains at sf0.1 is ~1.3 s of "broadcast join + grouped assembly".
This probe decomposes the query at sf0.1 and at a bench_scale-amplified
decade (SPARK_GRAFT_SF_DIR=/tmp/bench_10x) into cumulative prefixes,
each timed with the noop sink (guide §1.4), plus the bench's collect()
shape so driver result serialization is attributed separately:

  words      — posexplode of the corpus into (doc_id, pos, word)
  encoded    — distinct words + 8 merge folds + vocab-map lookup
               (vocabulary-sized; the r14-fixed construction path)
  assembly   — broadcast join of encoded onto positions + groupBy(doc)
               array_sort(collect_list(struct(pos, ids))) + flatten
  full_noop  — the whole registry frame (adds the empty-doc left join
               and the array_join-to-string projection), noop sink
  full_bench — same frame, .collect() (the bench methodology: adds
               driver row serialization of corpus-sized id strings)

Usage: python scripts/bpe_tail_probe.py [--reps N]
Prints one JSON line per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from canary_weather_etl_spark.operators.bpe import (  # noqa: E402
    _merge_fold_sql,
    string_int_map_sql,
    string_literal_sql,
    EOW,
)
from canary_weather_etl_spark.plans import REGISTRY  # noqa: E402
from canary_weather_etl_spark.plans.registry import load_par  # noqa: E402
from canary_weather_etl_spark.plans.r8_queries import (  # noqa: E402
    _BPE_MERGES,
    _BPE_VOCAB,
)
from canary_weather_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 3
    spark = get_spark("bpe-tail-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    # every stage REBUILDS its frame per rep, exactly like bench.py:
    # re-collecting the same DataFrame object reuses its shuffle map
    # outputs (stages show as skipped), which understates steady cost
    def mk_words():
        docs = load_par(spark, SF, "documents")
        return docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .alias("pos", "word")).filter(F.col("word") != "")

    def mk_encoded():
        col_sql = (f"concat(split(word, ''), "
                   f"array({string_literal_sql(EOW)}))")
        for left, right in _BPE_MERGES:
            col_sql = _merge_fold_sql(col_sql, left, right)
        return mk_words().select("word").distinct().select(
            "word",
            F.expr(f"transform({col_sql}, s -> cast(coalesce("
                   f"try_element_at({string_int_map_sql(_BPE_VOCAB)}, s), "
                   f"-1) as bigint))").alias("__ids"))

    def mk_assembly():
        return (mk_words().join(F.broadcast(mk_encoded()), "word")
                .groupBy("doc_id")
                .agg(F.flatten(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "__ids"))),
                    lambda x: x["__ids"])).alias("token_ids")))

    mk_full = REGISTRY["q_bpe_encode_ids"].fn

    stages = [
        ("words", lambda: _noop(mk_words())),
        ("encoded", lambda: _noop(mk_encoded())),
        ("assembly", lambda: _noop(mk_assembly())),
        ("full_noop", lambda: _noop(mk_full(spark, SF))),
        ("full_bench", lambda: mk_full(spark, SF).collect()),
    ]
    for name, fn in stages:
        spark.sparkContext.setJobDescription(f"bpe_tail {name}")
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"sf_dir": SF, "stage": name, "runs": runs,
                          "min": min(runs)}))


if __name__ == "__main__":
    main()
