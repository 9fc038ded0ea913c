"""Cleaning-operator tests: PII redaction leaves zero residual matches
and preserves non-PII text; URL canonicalization produces lowercase,
www-free, port-free, fragment-free, tracking-param-free keys that
collapse case/port/param variants of the same page to one canonical
form (the property dedup relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from canary_weather_etl_spark.plans.cleaning import (
    _EMAIL_PAT, _IP_PAT, _PHONE_PAT, q_pii_redact, q_url_canonicalize)
from canary_weather_etl_spark.plans.registry import load

from conftest import SF_SMALL


def test_pii_redaction_is_total(spark):
    """After redaction, zero residual email/phone/IP matches remain in
    the cleaned corpus; every doc had >=1 of each injected, so the
    audit counts are bounded below by the doc count."""
    d = load(spark, SF_SMALL, "documents")
    n_docs = d.count()
    out = q_pii_redact(spark, SF_SMALL)
    agg = out.agg(F.sum("n_docs").alias("docs"),
                  F.sum("emails").alias("emails"),
                  F.sum("phones").alias("phones"),
                  F.sum("ips").alias("ips"),
                  F.min("chars_removed").alias("min_removed")).collect()[0]
    assert agg["docs"] == n_docs
    assert agg["emails"] > n_docs  # even ids carry a second address
    assert agg["phones"] == n_docs
    assert agg["ips"] == n_docs
    # placeholders are shorter than any injected email+phone+ip triple
    assert agg["min_removed"] > 0

    # residual sweep: rebuild the cleaned column and regex-scan it
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 3).cast("string"), F.lit(".com"),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit(" or admin"), F.col("doc_id").cast("string"),
                        F.lit("@corp.net"))).otherwise(F.lit("")),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") / 256).cast("bigint") % 256)
        .cast("string"), F.lit(".7"))
    clean = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(dirty, _EMAIL_PAT, "<EMAIL>"),
                         _PHONE_PAT, "<PHONE>"),
        _IP_PAT, "<IP>")
    residual = (d.select(clean.alias("clean"))
                .select((F.regexp_count("clean", F.lit(_EMAIL_PAT))
                         + F.regexp_count("clean", F.lit(_PHONE_PAT))
                         + F.regexp_count("clean", F.lit(_IP_PAT)))
                        .alias("n"))
                .agg(F.sum("n")).collect()[0][0])
    assert residual == 0
    # the original text survives: redaction touched only injected spans
    kept = (d.select(F.col("text"), clean.alias("clean"))
            .filter(~F.col("clean").startswith(F.col("text"))).count())
    assert kept == 0


def test_url_canonical_keys_are_normalized(spark):
    """Canonical hosts are lowercase, www-free, and port-free; variant
    count collapses: n_canonical <= 97*13 paths-x-ids per host and every
    host aggregates >1 raw URL at sf0.001."""
    out = q_url_canonicalize(spark, SF_SMALL)
    rows = out.collect()
    assert rows, "no hosts produced"
    for r in rows:
        assert r["host"] == r["host"].lower()
        assert not r["host"].startswith("www.")
        assert ":" not in r["host"]
        assert r["host"].endswith(".example.com")
        assert r["n_canonical"] <= r["n_urls"]
        assert r["n_canonical"] <= 97 * 13


def test_url_case_and_param_variants_collapse(spark):
    """Two raw spellings of the same page (case, port, utm params,
    fragment) canonicalize identically — the dedup-enabling property."""
    variants = spark.createDataFrame(
        [(1, "HTTPS://WWW.Host7.Example.COM:443/path/5/page"
             "?utm_source=feed&id=3&ref=1#sec0"),
         (2, "https://host7.example.com/path/5/page?id=3")],
        ["i", "url"])
    canon = variants.select(
        F.concat(
            F.regexp_replace(F.lower(F.parse_url("url", F.lit("HOST"))),
                             r"^www\.", ""),
            F.parse_url("url", F.lit("PATH")),
            F.lit("?id="),
            F.parse_url("url", F.lit("QUERY"), F.lit("id"))).alias("key"))
    keys = [r["key"] for r in canon.collect()]
    assert keys[0] == keys[1] == "host7.example.com/path/5/page?id=3"


def test_equidepth_buckets_differ_by_at_most_one(spark):
    """The NTILE invariant reproduced through global_rank arithmetic:
    bucket sizes differ by <=1 and fat buckets come first."""
    from canary_weather_etl_spark.plans.r7_queries import (
        q_equidepth_histogram)
    rows = {r["bucket"]: r["n_rows"]
            for r in q_equidepth_histogram(spark, SF_SMALL).collect()}
    assert set(rows) == set(range(1, 11))
    sizes = [rows[b] for b in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # fat buckets first
    n = sum(sizes)
    assert sizes.count(max(sizes)) == (n % 10 or 10)


def test_sql_scripting_control_flow(spark):
    """Spark 4 SQL scripting: WHILE with ITERATE/LEAVE drives per-
    iteration distributed queries; the script's fixpoint equals the
    declaratively-computed one."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    spark.range(100).createOrReplaceTempView("script_v")
    got = spark.sql("""
    BEGIN
      DECLARE acc BIGINT DEFAULT 0;
      DECLARE i BIGINT DEFAULT 0;
      loop_label: WHILE i < 20 DO
        SET i = i + 1;
        IF i % 2 = 1 THEN ITERATE loop_label; END IF;
        IF i > 10 THEN LEAVE loop_label; END IF;
        SET acc = acc + (SELECT COUNT(*) FROM script_v WHERE id < i);
      END WHILE;
      SELECT acc AS total, i AS stopped_at;
    END
    """).collect()[0]
    # even i in 2..10 accumulate COUNT(id<i)=i -> 2+4+6+8+10; leave at 12
    assert got["total"] == 30
    assert got["stopped_at"] == 12
