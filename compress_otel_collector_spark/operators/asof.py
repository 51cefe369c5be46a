"""As-of join — the canonical "operator Spark lacks", as a composition.

``asof_join(left, right, on, by, right_cols)`` attaches to every left row
the most recent right row with ``right.on <= left.on`` within the same
``by`` key (inclusive at equality — the same semantics as DuckDB's native
``ASOF LEFT JOIN`` on ``l.on >= r.on``, which is the oracle twin).

Implementation is pure DataFrame composition, no UDF: tag both sides, union
them, and carry the right-side values forward with ``last(..., ignorenulls)``
over a (key, time, side) window — right rows sort before left rows at equal
timestamps so equality matches. Scale shape: the union is narrow; the only
shuffle is the window's partitionBy(key) — the same single exchange a
shuffled join would pay, but with no join explosion and no range condition
for the optimizer to mishandle.

Caveat (documented, not hidden): if the right side has several rows at the
same (key, time), "the" most recent row is ambiguous — pre-aggregate the
right side to one row per (key, time) first, as the driver query does.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              right_cols: Sequence[str],
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: latest right values at-or-before each left row."""
    lcols = list(left.columns)
    right_types = dict((f.name, f.dataType) for f in right.schema.fields)

    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right_types[c]).alias(f"_r_{c}")
          for c in right_cols],
    )
    left_types = dict((f.name, f.dataType) for f in left.schema.fields)
    tagged_right = right.select(
        *[
            F.col(c) if c in (on, by)
            else F.lit(None).cast(left_types[c]).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        *lcols, "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w)
            .alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
