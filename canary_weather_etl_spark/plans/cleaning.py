"""Corpus-cleaning operators: PII redaction and URL canonicalization —
the two scrubbing passes every web-scale training-data pipeline runs
between raw crawl and dedup (reference scope: the reference's pipeline
cleans and normalizes records before aggregation, README.md "Transform";
these are the text-corpus equivalents, built Spark-first).

The fixture corpus is synthetic word salad with no real PII/URLs, so
each query first CONSTRUCTS its dirty column deterministically from
doc_id/event_id arithmetic — both engines build the identical string,
then the operator under test (regex redaction, parse_url
canonicalization) does real work on real variety (emails on every doc,
a second one on even ids, phones/IPs with per-doc digits; mixed-case
hosts, default ports, tracking params, fragments). The oracle therefore
verifies the CLEANING logic, not the synthesis.

Determinism: all aggregates are integer counts/length sums (order-free);
regex semantics used are the RE2/Java common subset (character classes,
bounded quantifiers, \\b word boundary — no lookaround, no backrefs).

Scale: both queries are row-wise JVM expression pipelines (regexp_*,
parse_url) feeding one grouped aggregate — a single shuffle on a
low-cardinality key at any corpus size; nothing leaves whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register

# --- PII redaction -----------------------------------------------------------

_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+\d{1,2}-\d{3}-\d{4}"
_IP_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Deterministic dirty-text synthesis, shared by both engines: one email
# per doc (domain varies mod 3), a second on even ids, one phone with
# doc-id digits, one private-range IP with doc-id octets.
_PII_SYNTH_SQL = """
    text || ' contact u' || CAST(doc_id AS VARCHAR)
         || '@ex' || CAST(doc_id % 3 AS VARCHAR) || '.com'
         || CASE WHEN doc_id % 2 = 0
                 THEN ' or admin' || CAST(doc_id AS VARCHAR) || '@corp.net'
                 ELSE '' END
         || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
         || CAST((doc_id // 256) % 256 AS VARCHAR) || '.7'
"""

_PII_ORACLE = f"""
    WITH raw AS (
        SELECT source,
               {_PII_SYNTH_SQL} AS dirty
        FROM documents
    ),
    red AS (
        SELECT source, dirty,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(dirty, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                       '{_PHONE_PAT}', '<PHONE>', 'g'),
                   '{_IP_PAT}', '<IP>', 'g') AS clean,
               length(regexp_extract_all(dirty, '{_EMAIL_PAT}')) AS n_email,
               length(regexp_extract_all(dirty, '{_PHONE_PAT}')) AS n_phone,
               length(regexp_extract_all(dirty, '{_IP_PAT}')) AS n_ip
        FROM raw
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(n_ip) AS BIGINT) AS ips,
           CAST(SUM(length(dirty) - length(clean)) AS BIGINT)
               AS chars_removed
    FROM red
    GROUP BY source
"""


@register(
    "q_pii_redact",
    oracle=_PII_ORACLE,
    doc="PII redaction audit: regex-scrub emails, phone numbers, and "
        "IPv4 addresses to typed placeholders and report per-source "
        "redaction counts + characters removed — the scrubbing pass "
        "between raw crawl and dedup, with the audit table a compliance "
        "review needs. The fixture corpus has no real PII, so the dirty "
        "column is synthesized deterministically from doc_id on BOTH "
        "engines (emails on every doc + a second on even ids, phones/IPs "
        "with per-doc digits); the oracle verifies the redaction regexes "
        "and the audit arithmetic, not the synthesis. Row-wise JVM "
        "regexp_replace/regexp_count feeding one grouped integer "
        "aggregate — one shuffle at any scale, patterns in the RE2/Java "
        "common subset.",
    tags=("llm", "cleaning"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    dirty = (
        F.concat(
            F.col("text"),
            F.lit(" contact u"), F.col("doc_id").cast("string"),
            F.lit("@ex"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".com"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.concat(F.lit(" or admin"),
                            F.col("doc_id").cast("string"),
                            F.lit("@corp.net"))).otherwise(F.lit("")),
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") / 256).cast("bigint") % 256).cast("string"),
            F.lit(".7")))
    red = d.select(
        "source", dirty.alias("dirty"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(dirty, _EMAIL_PAT, "<EMAIL>"),
                _PHONE_PAT, "<PHONE>"),
            _IP_PAT, "<IP>").alias("clean"),
        F.regexp_count(dirty, F.lit(_EMAIL_PAT)).alias("n_email"),
        F.regexp_count(dirty, F.lit(_PHONE_PAT)).alias("n_phone"),
        F.regexp_count(dirty, F.lit(_IP_PAT)).alias("n_ip"))
    return (red.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_email").alias("emails"),
                 F.sum("n_phone").alias("phones"),
                 F.sum("n_ip").alias("ips"),
                 F.sum(F.length("dirty") - F.length("clean"))
                  .alias("chars_removed")))


# --- URL canonicalization ----------------------------------------------------

# Deterministic dirty-URL synthesis from event arithmetic: mixed-case
# scheme/host, www. prefix, default :443 port, tracking params
# (utm_source, ref) around the load-bearing id param, and a fragment.
_URL_SYNTH_SQL = """
    'HTTPS://WWW.host' || CAST(user_id % 40 AS VARCHAR)
        || '.Example.COM:443/path/' || CAST(event_id % 97 AS VARCHAR)
        || '/page?utm_source=feed&id=' || CAST(event_id % 13 AS VARCHAR)
        || '&ref=' || CAST(user_id % 5 AS VARCHAR)
        || '#sec' || CAST(event_id % 3 AS VARCHAR)
"""

_URL_ORACLE = f"""
    WITH raw AS (
        SELECT event_id, user_id, {_URL_SYNTH_SQL} AS url FROM events
    ),
    canon AS (
        SELECT regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)),
                   '^www\\.', '') AS host,
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1)
                   AS path,
               regexp_extract(url, '[?&]id=([0-9]+)', 1) AS id_param
        FROM raw
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT path || '?id=' || id_param) AS BIGINT)
               AS n_canonical,
           CAST(SUM(CAST(id_param AS BIGINT)) AS BIGINT) AS id_sum
    FROM canon
    GROUP BY host
"""


@register(
    "q_url_canonicalize",
    oracle=_URL_ORACLE,
    doc="URL canonicalization + host-level rollup: lowercase the host, "
        "strip the www. prefix and default port, drop the fragment and "
        "tracking params (utm_*, ref) while keeping the load-bearing id "
        "param, then aggregate per canonical host (url count, distinct "
        "canonical pages, id checksum) — the normalization that makes "
        "crawl dedup and per-domain quotas possible (without it every "
        "tracking-param variant counts as a distinct page). Spark side "
        "uses the native parse_url expression (HOST/PATH/QUERY:key "
        "extraction, port-free host); the oracle reproduces it with RE2 "
        "regexes. Dirty URLs are synthesized deterministically from "
        "event arithmetic on BOTH engines; row-wise JVM expressions, one "
        "grouped shuffle at any scale.",
    tags=("llm", "cleaning"),
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    url = F.concat(
        F.lit("HTTPS://WWW.host"), (F.col("user_id") % 40).cast("string"),
        F.lit(".Example.COM:443/path/"),
        (F.col("event_id") % 97).cast("string"),
        F.lit("/page?utm_source=feed&id="),
        (F.col("event_id") % 13).cast("string"),
        F.lit("&ref="), (F.col("user_id") % 5).cast("string"),
        F.lit("#sec"), (F.col("event_id") % 3).cast("string"))
    canon = e.select(
        F.regexp_replace(F.lower(F.parse_url(url, F.lit("HOST"))),
                         r"^www\.", "").alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"))
    return (canon.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct(
                     F.concat(F.col("path"), F.lit("?id="),
                              F.col("id_param"))).alias("n_canonical"),
                 F.sum(F.col("id_param").cast("bigint")).alias("id_sum")))
