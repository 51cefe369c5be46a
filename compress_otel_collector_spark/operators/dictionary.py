"""Global dictionary build — the cluster-wide variant of the codec's pools.

The wire codec scopes dictionaries per blob (reference parity). When a
*global* dictionary is wanted (e.g. a cross-partition id table for hosts or
names), the Spark-native construction is: distinct → first-seen ordering →
``row_number`` index → **broadcast join** back onto the fact rows
(SURVEY.md §2.1 O6). One aggregation shuffle builds it; applying it is
shuffle-free on the fact side.

First-seen order needs a deterministic tiebreak at scale, so the index
orders by (first_seen_row, value) where first_seen_row is the minimum of a
caller-provided ordering column (e.g. an id) — the distributed analog of
the reference's insertion-order indices (custom_map.go:25-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_dictionary(df: DataFrame, value_col: str, order_col: str,
                      n_buckets: int | None = None) -> DataFrame:
    """(value, index) rows: index = rank of first occurrence by order_col.

    Two-phase index build (r3 verdict #4): a bare ``Window.orderBy`` would
    funnel every distinct value through ONE task's sort. Instead:

    1. build-time (driver, model-parameter sized — same license as the IVF
       centroid collects): quantile boundaries of ``first_seen`` and the
       per-bucket counts are computed and baked into the plan as LITERALS,
       so every recomputation of the returned frame buckets identically
       (a sampled ``repartitionByRange`` would re-draw boundaries if the
       exchange isn't reused, silently corrupting the offsets);
    2. plan: each bucket computes a local ``row_number`` in parallel
       (window partitioned by bucket) and the global index adds the
       bucket's precomputed offset.

    Output is identical for any boundary placement: (first_seen, value) is
    unique per row, so offset + local rank IS the global rank by
    (first_seen, value). ``order_col`` must be numeric (quantile
    boundaries); ties/skew in ``first_seen`` degrade parallelism, never
    correctness.
    """
    firsts = df.groupBy(F.col(value_col).alias("value")).agg(
        F.min(order_col).alias("first_seen"))
    if n_buckets is None:
        n_buckets = df.sparkSession.sparkContext.defaultParallelism
    bnds: list = []
    if n_buckets > 1:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        row = firsts.select(
            F.percentile_approx("first_seen", qs, 10000).alias("b")).first()
        seen: set = set()
        for b in (row["b"] or []):
            if b is not None and b not in seen:
                seen.add(b)
                bnds.append(b)
    bucket = F.lit(0)
    for b in bnds:
        bucket = bucket + F.when(F.col("first_seen") > F.lit(b),
                                 1).otherwise(0)
    bucketed = firsts.withColumn("_b", bucket.cast("int"))
    counts = {
        r["_b"]: r["_c"]
        for r in bucketed.groupBy("_b").agg(
            F.count("*").alias("_c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for i in sorted(counts):
        offsets[i] = acc
        acc += counts[i]
    if offsets:
        off_expr = F.element_at(
            F.create_map(*[F.lit(x) for kv in sorted(offsets.items())
                           for x in kv]),
            F.col("_b"))
    else:  # empty input
        off_expr = F.lit(0)
    w = Window.partitionBy("_b").orderBy("first_seen", "value")
    return (
        bucketed.withColumn("_rn", F.row_number().over(w))
        .select("value",
                (off_expr + F.col("_rn") - 1).cast("long").alias("index"))
    )


def apply_dictionary(df: DataFrame, dictionary: DataFrame, value_col: str,
                     index_col: str = "dict_index") -> DataFrame:
    """Replace ``value_col`` occurrences with their dictionary index via a
    broadcast hash join (the decode side keeps the dictionary itself)."""
    dim = F.broadcast(
        dictionary.select(F.col("value").alias(value_col),
                          F.col("index").alias(index_col)))
    return df.join(dim, value_col, "left")
