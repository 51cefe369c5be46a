"""Corpus-curation operators beyond the 50-entry driver ledger: URL
canonicalization + canonical-URL dedup, and deterministic hash-mod
stratified sampling. All JVM-side expressions; each has a DuckDB-twin
form in its docstring (the ledger is at the driver's 50-row cap, so
these are proof-mapped through pytest — see PARITY.md "beyond-cap").

Scale notes: canonicalization is a narrow per-row expression;
canonical-URL dedup is one hash-aggregate shuffle on the canonical key
(the same 100 TB shape as ``dedup.exact_duplicates``); hash-mod sampling
is narrow and — unlike ``df.sample`` — deterministic across retries,
partitionings and cluster sizes, which is what a resumable training-data
pipeline needs (a task retry must not change the sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never change page content — the common tracker set
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "ref")


def canonical_url(url_col: str = "url") -> Column:
    """Canonical form of a URL, as one composable JVM expression.

    Rules (each a regexp step, applied in order):
    1. drop the ``#fragment``
    2. drop tracking query params (``TRACKING_PARAMS``), then a dangling
       ``?`` / ``&``
    3. lowercase scheme+host (path stays case-sensitive)
    4. drop default ports (``:80`` http, ``:443`` https)
    5. drop a single trailing ``/`` on a non-root path

    DuckDB twin: the same five ``regexp_replace``/``lower`` steps compose
    verbatim (both engines use RE2-compatible syntax for these patterns).
    """
    u = F.col(url_col)
    u = F.regexp_replace(u, r"#.*$", "")
    tracking = "|".join(TRACKING_PARAMS)
    u = F.regexp_replace(u, r"(?i)[?&](" + tracking + r")=[^&#]*", "")
    # a surviving first param may now start with '&' — restore '?'
    # (anchored: fires only when no '?' remains before the first '&')
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"^([^?]*)&", r"$1?")
    u = F.regexp_replace(u, r"\?$", "")
    # lowercase scheme://host only: split at the first '/' after '//'
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    u = F.concat(F.lower(head),
                 F.substring(u, F.length(head) + 1, F.lit(1 << 30)))
    u = F.regexp_replace(u, r"^(https?://[^/:]+):(?:80|443)(/|$)", r"$1$2")
    u = F.regexp_replace(u, r"(.+?)/$", r"$1")
    return u


def dedup_canonical_url(df: DataFrame, url_col: str = "url",
                        id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the canonical URL: keep the lowest-id document per
    canonical form. One narrow canonicalization pass + one hash-aggregate
    shuffle (min over the canonical key) — the optimal 100 TB shape.

    DuckDB twin: ``SELECT canon, min(doc_id) AS keep_id, count(*) AS n
    FROM (SELECT <canonical_url steps>, doc_id FROM docs) GROUP BY 1``.
    """
    canon = canonical_url(url_col).alias("canon_url")
    return (
        df.select(F.col(id_col).alias("doc_id"), canon)
        .groupBy("canon_url")
        .agg(F.min("doc_id").alias("keep_id"),
             F.count("*").alias("n_variants"))
    )


def stratified_hash_sample(df: DataFrame, fraction_pct: int,
                           strata_col: str = "lang",
                           id_col: str = "doc_id",
                           seed: int = 7) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff
    ``pmod(xxhash64(id, seed), 100) < fraction_pct`` — the same rows on
    every retry, partitioning and cluster size (``df.sample`` is none of
    those). Strata are implicit (the predicate is stratum-independent and
    id-uniform, so each stratum is sampled at ~fraction_pct% without a
    shuffle); ``strata_col`` is kept for downstream per-stratum accounting.

    DuckDB twin: ``WHERE pmod(hash(...)...)`` is NOT portable (xxhash64
    seeds differ across engines) — the oracle-portable check is the
    ACCOUNTING: per-stratum kept/total counts recomputed from the kept-id
    list, which tests pin.
    """
    keep = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)),
                  F.lit(100)) < fraction_pct
    return (
        df.where(keep)
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count("*").alias("kept"),
             F.min(id_col).alias("min_id"),
             F.max(id_col).alias("max_id"))
    )
