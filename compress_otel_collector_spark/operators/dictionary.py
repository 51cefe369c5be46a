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


def global_dictionary(df: DataFrame, value_col: str,
                      order_col: str) -> DataFrame:
    """(value, index) rows: index = rank of first occurrence by order_col."""
    firsts = df.groupBy(F.col(value_col).alias("value")).agg(
        F.min(order_col).alias("first_seen"))
    w = Window.orderBy("first_seen", "value")
    return firsts.select(
        "value",
        (F.row_number().over(w) - 1).cast("long").alias("index"),
    )


def apply_dictionary(df: DataFrame, dictionary: DataFrame, value_col: str,
                     index_col: str = "dict_index") -> DataFrame:
    """Replace ``value_col`` occurrences with their dictionary index via a
    broadcast hash join (the decode side keeps the dictionary itself)."""
    dim = F.broadcast(
        dictionary.select(F.col("value").alias(value_col),
                          F.col("index").alias(index_col)))
    return df.join(dim, value_col, "left")
