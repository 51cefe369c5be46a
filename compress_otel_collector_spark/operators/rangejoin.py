"""Bucketized range join — points joined into intervals at scale.

Spark has no native range-join optimization (a plain ``t BETWEEN lo AND hi``
condition degenerates to BroadcastNestedLoopJoin or a cartesian): the
standard scale pattern is **bucketization** — quantize the range dimension,
explode each interval to the buckets it covers, equi-join points to
intervals on (key, bucket), then apply the exact range predicate. Each
point lives in exactly one bucket, so every qualifying (point, interval)
pair meets exactly once — no dedup pass needed. Candidate volume is
|intervals| × (interval_len / bucket_width + 1), tunable via the width;
the only shuffle is the (key, bucket) equi-join, which Catalyst plans as a
normal hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width: int) -> Column:
    return F.floor(col / width).cast("long")


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, by: str | None = None,
               bucket_width: int = 3600) -> DataFrame:
    """Inner join of points into intervals: ``lo <= point <= hi``
    (inclusive both ends), optionally key-scoped via ``by``.

    Returns all columns of both inputs (points' first). ``bucket_width``
    is in the units of the range columns.
    """
    p = points.withColumn("_pb", _bucket(F.col(point_col), bucket_width))
    iv = intervals.withColumn(
        "_ib",
        F.explode(F.sequence(
            _bucket(F.col(lo_col), bucket_width),
            _bucket(F.col(hi_col), bucket_width),
        )),
    )
    cond = p["_pb"] == iv["_ib"]
    if by is not None:
        cond = cond & p[by].eqNullSafe(iv[by])
    joined = p.join(iv, cond).where(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    drop = ["_pb", "_ib"] + ([iv[by]] if by is not None else [])
    out = joined
    for d in drop:
        out = out.drop(d)
    return out
