"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_pairs` / :func:`cosine_topk`: brute-force exact baseline,
  pure JVM expressions (``zip_with`` + ``aggregate`` fold — no Python).
- :func:`lsh_cosine_topk`: a scale path — deterministic random-hyperplane
  LSH buckets shrink the candidate set from O(N²) to bucket-mates, then the
  exact cosine ranks candidates. At 100 TB: signatures are one narrow pass;
  the bucket join shuffles only same-bucket pairs; recall is tunable via
  number of hyperplanes / probing multiple tables.
- :func:`ivf_topk`: the other standard scale path — an IVF (inverted-file)
  index: a small coarse quantizer (centroids, trained by deterministic-init
  Lloyd iterations) partitions vectors into cells; queries probe only their
  ``n_probe`` nearest cells. Centroids are model parameters (n_cells × dim
  floats), so holding them on the driver / broadcasting is the correct
  distribution shape; assignment and probing are pure JVM expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                    lambda acc, x: acc + x)
    )


def with_unit_norm(embeddings: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        v.alias("vec"),
        _norm(v).alias("norm"),
    )


def cosine_pairs(embeddings: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """All pairs (a_id < b_id) with cosine similarity (rounded to 4dp)."""
    e = with_unit_norm(embeddings, vec_col, id_col)
    a = e.select(F.col("vec_id").alias("a_id"), F.col("vec").alias("va"),
                 F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("vec").alias("vb"),
                 F.col("norm").alias("nb"))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.round(_dot(F.col("va"), F.col("vb"))
                    / (F.col("na") * F.col("nb")), 4).alias("cos"),
        )
    )


def cosine_topk(embeddings: DataFrame, k: int = 5,
                n_queries: int = 20, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` ids (self excluded).

    Brute force O(Q·N) — the correctness baseline. The query side is tiny so
    Spark broadcasts it; the candidate side streams with no shuffle until the
    final per-query top-k (a windowed rank over Q·N rows).
    """
    e = with_unit_norm(embeddings, vec_col, id_col)
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("vq"),
        F.col("norm").alias("nq"))
    joined = (
        F.broadcast(q).crossJoin(
            e.select(F.col("vec_id").alias("n_id"), F.col("vec").alias("vn"),
                     F.col("norm").alias("nn")))
        .where(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id",
            (_dot(F.col("vq"), F.col("vn"))
             / (F.col("nq") * F.col("nn"))).alias("cos_exact"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_exact").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("int").alias("rank"),
                F.round("cos_exact", 4).alias("cos"))
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (pure function of
    (plane, coordinate) — no RNG state, reproducible across executors)."""
    vals = []
    for j in range(dim):
        # golden-ratio low-discrepancy stream mapped to [-1, 1)
        x = math.modf(math.sin(1.0 + plane * 7919 + j * 104729) * 43758.5453)[0]
        vals.append(2.0 * abs(x) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def _bucket_expr(n_planes: int, dim: int, table: int) -> Column:
    """One hash table's bucket id: sign bits of n_planes projections."""
    return sum(
        (F.when(
            _dot(F.col("vec"),
                 F.array(*[F.lit(v) for v in
                           _hyperplane(dim, table * 64 + p)])) > 0, 1
        ).otherwise(0) * F.lit(2 ** p)).cast("long")
        for p in range(n_planes)
    )


def lsh_signatures(embeddings: DataFrame, n_planes: int = 12, dim: int = 64,
                   n_tables: int = 1, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(vec_id, vec, norm, table, bucket) rows — one per hash table.

    Multiple tables = OR-amplification: a pair is a candidate if it collides
    in ANY table (recall 1-(1-p^k)^L for match prob p per plane).
    """
    e = with_unit_norm(embeddings, vec_col, id_col)
    buckets = F.array(*[
        _bucket_expr(n_planes, dim, t) for t in range(n_tables)
    ])
    return e.select(
        "vec_id", "vec", "norm",
        F.posexplode(buckets).alias("table", "bucket"),
    )


def lsh_cosine_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 20,
                    n_planes: int = 4, n_tables: int = 4, dim: int = 64,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: exact cosine ranked within LSH bucket collisions.

    Recall < 1 by construction; tests measure it against the brute-force
    baseline. At scale, candidates per query drop from N to
    ~L·N/2^planes, and the only shuffle is the (table, bucket) join.
    """
    sigs = lsh_signatures(embeddings, n_planes=n_planes, n_tables=n_tables,
                          dim=dim, vec_col=vec_col, id_col=id_col)
    q = sigs.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("vq"),
        F.col("norm").alias("nq"), F.col("table").alias("qt"),
        F.col("bucket").alias("qb"))
    cand = sigs.select(
        F.col("vec_id").alias("n_id"), F.col("vec").alias("vn"),
        F.col("norm").alias("nn"), F.col("table").alias("nt"),
        F.col("bucket").alias("nb"))
    joined = (
        F.broadcast(q).join(cand, (F.col("qt") == F.col("nt"))
                            & (F.col("qb") == F.col("nb")))
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", "vq", "nq", "vn", "nn")
        .dropDuplicates(["q_id", "n_id"])  # collided in ≥1 table
        .select("q_id", "n_id",
                (_dot(F.col("vq"), F.col("vn"))
                 / (F.col("nq") * F.col("nn"))).alias("cos_exact"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_exact").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("int").alias("rank"),
                F.round("cos_exact", 4).alias("cos"))
    )


#: default hot-bucket cap for embedding LSH, mirroring
#: ``dedup.DEFAULT_MAX_BUCKET``: a (table, bucket) group is a candidate
#: *cluster* and real near-dup clusters are small; anything larger is a
#: degenerate signature (zero/padded vectors, a post-dedup residue of
#: near-identical embeddings) whose in-bucket pairing is quadratic. 100
#: bounds any bucket's pair fan-out at 100·99/2 ≈ 5k while keeping every
#: real cluster at tested scales (identical-vector dup buckets are tiny).
DEFAULT_MAX_VEC_BUCKET = 100


def embedding_hot_buckets(embeddings: DataFrame, max_bucket: int,
                          n_planes: int = 8, n_tables: int = 4,
                          dim: int = 64, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """(table:bucket, bucket_size) rows whose membership exceeds
    ``max_bucket`` — the mass :func:`embedding_dup_pairs_lsh` drops.
    Mirrors ``dedup.lsh_hot_buckets``: production runs report these so a
    capped bucket is observable, never silent."""
    sigs = lsh_signatures(embeddings, n_planes=n_planes, n_tables=n_tables,
                          dim=dim, vec_col=vec_col, id_col=id_col)
    return (
        sigs.select(F.concat_ws(":", "table", "bucket").alias("bkt"))
        .groupBy("bkt").agg(F.count("*").alias("bucket_size"))
        .where(F.col("bucket_size") > max_bucket)
    )


def embedding_dup_pairs_lsh(embeddings: DataFrame, threshold: float = 0.9,
                            n_planes: int = 8, n_tables: int = 4,
                            dim: int = 64, vec_col: str = "embedding",
                            id_col: str = "vec_id",
                            max_bucket: int | None = DEFAULT_MAX_VEC_BUCKET
                            ) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH candidates + exact verify.

    The scale path for ``embedding_dup_pairs`` (which is exact but
    all-pairs): candidate pairs are generated WITHIN each (table, bucket)
    group — ids only, so the collected array is small — then the exact
    cosine over the candidate set keeps pairs ≥ threshold. Identical
    vectors share every bucket, so true duplicates are always candidates;
    near-dups are found with recall governed by (n_planes, n_tables).
    At 100 TB: one narrow signature pass, a bucket groupBy over ids, and
    two hash joins of the (small) candidate set back to vectors — never
    an all-pairs product.

    ``max_bucket`` caps per-bucket fan-out exactly like
    ``dedup.minhash_lsh_pairs``: buckets larger than the cap are dropped
    AFTER the single groupBy aggregate, inside the one lineage
    (``size(ids) > cap`` ⇒ drop before pair explosion), killing the
    quadratic bomb a degenerate bucket (k near-identical or zero vectors
    → one O(k²) task) would set off at 100 TB. The residual cost of
    having collected a hot bucket's id array once is linear and paid
    once. ON by default (:data:`DEFAULT_MAX_VEC_BUCKET`); pass
    ``max_bucket=None`` to disable explicitly. Dropped mass is observable
    via :func:`embedding_hot_buckets` with the same parameters.
    """
    sigs = lsh_signatures(embeddings, n_planes=n_planes, n_tables=n_tables,
                          dim=dim, vec_col=vec_col, id_col=id_col)
    grouped = (
        sigs.select("vec_id",
                    F.concat_ws(":", "table", "bucket").alias("bkt"))
        .groupBy("bkt")
        .agg(F.sort_array(F.collect_set("vec_id")).alias("ids"))
    )
    if max_bucket is not None:
        grouped = grouped.where(F.size("ids") <= max_bucket)
    pair_arr = F.flatten(F.transform(
        F.col("ids"),
        lambda a, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda b: F.struct(a.alias("a"), b.alias("b")))))
    cand = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.a").alias("a_id"), F.col("p.b").alias("b_id"))
        .distinct()
    )
    e = with_unit_norm(embeddings, vec_col, id_col)
    a = e.select(F.col("vec_id").alias("a_id"), F.col("vec").alias("va"),
                 F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("vec").alias("vb"),
                 F.col("norm").alias("nb"))
    return (
        cand.join(a, "a_id").join(b, "b_id")
        .select("a_id", "b_id",
                F.round(_dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")), 4).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def topk_recall(approx: DataFrame, exact: DataFrame,
                method: str) -> DataFrame:
    """One-row recall@k of an ANN result against the exact baseline.

    recall = |approx ∩ exact| / |exact| over (q_id, n_id) pairs, computed
    as one left join + aggregate. Both inputs are deterministic (fixed
    hyperplanes / centroid seeds over fixed data), so the emitted recall is
    an exact, pinnable number — the honest scorecard for the approximate
    indexes (r2 verdict #8: recall was only visible inside tests).
    """
    # distinct: duplicate (q_id, n_id) rows in the approx input (e.g. the
    # same pair surviving in two LSH tables) would fan out the left join
    # and inflate both exact_pairs and hit_pairs
    a = approx.select("q_id", "n_id").distinct().withColumn("_hit", F.lit(1))
    e = exact.select("q_id", "n_id")
    return (
        e.join(a, ["q_id", "n_id"], "left")
        .agg(F.count("*").alias("exact_pairs"),
             F.count("_hit").alias("hit_pairs"))
        .select(
            F.lit(method).alias("method"),
            "exact_pairs", "hit_pairs",
            F.round(F.col("hit_pairs") / F.col("exact_pairs"), 4)
            .alias("recall"),
        )
    )


def _lit_vec(vals) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _centroid_dots(centroids) -> Column:
    """array<double> of cosine(vec, centroid_i) for every centroid."""
    return F.array(*[
        _dot(F.col("vec"), _lit_vec(c))
        / (F.col("norm") * F.lit(math.sqrt(sum(x * x for x in c)) or 1.0))
        for c in centroids
    ])


def ivf_train_centroids(embeddings: DataFrame, n_cells: int = 16,
                        iters: int = 1, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> list[list[float]]:
    """Deterministic coarse quantizer: evenly-strided seed vectors refined
    by ``iters`` Lloyd steps (assign → per-cell mean via posexplode).

    Returns plain Python lists — the trained model parameters. Each Lloyd
    step is two narrow passes + one (cell, dim) aggregation; nothing is
    iterative per row, and n_cells × dim stays driver-sized by definition.
    """
    e = with_unit_norm(embeddings, vec_col, id_col)
    n = e.count()
    stride = max(n // n_cells, 1)
    seeds = (
        e.where(F.col("vec_id") % stride == 0)
        .orderBy("vec_id").limit(n_cells).select("vec").collect()
    )
    centroids = [list(r["vec"]) for r in seeds]
    for _ in range(iters):
        assigned = e.select(
            "vec",
            (F.array_position(
                _centroid_dots(centroids),
                F.array_max(_centroid_dots(centroids))) - 1)
            .cast("int").alias("cell"),
        )
        means = (
            assigned.select("cell", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_cell[c][p] for p in sorted(by_cell[c])]
            if c in by_cell else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def ivf_assign(embeddings: DataFrame, centroids,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(vec_id, vec, norm, cell): nearest-centroid assignment, JVM-only."""
    e = with_unit_norm(embeddings, vec_col, id_col)
    dots = _centroid_dots(centroids)
    return e.select(
        "vec_id", "vec", "norm",
        (F.array_position(dots, F.array_max(dots)) - 1)
        .cast("int").alias("cell"),
    )


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 20,
             n_cells: int = 16, n_probe: int = 4, iters: int = 1,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k via IVF probing: exact cosine ranked within the
    ``n_probe`` nearest cells of each query.

    At scale: the index build is one narrow assignment pass (the inverted
    file would be a cell-partitioned table); each query touches
    ~n_probe/n_cells of the corpus, and the only shuffle is the cell join.
    Recall < 1 by construction — measured against the brute-force baseline
    in tests, tunable via n_probe.
    """
    centroids = ivf_train_centroids(embeddings, n_cells=n_cells,
                                    iters=iters, vec_col=vec_col,
                                    id_col=id_col)
    assigned = ivf_assign(embeddings, centroids, vec_col, id_col)
    dots = _centroid_dots(centroids)
    ranked_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dots,
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct((-d).alias("negd"),
                                          i.alias("cell"))),
                ),
            lambda s: s["cell"]),
        1, n_probe)
    q = (
        with_unit_norm(embeddings, vec_col, id_col)
        .where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("q_id"), F.col("vec").alias("vq"),
                F.col("norm").alias("nq"),
                F.explode(ranked_cells).alias("cell"))
    )
    joined = (
        F.broadcast(q).join(assigned, "cell")
        .where(F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("n_id"),
                (_dot(F.col("vq"), F.col("vec"))
                 / (F.col("nq") * F.col("norm"))).alias("cos_exact"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_exact").desc(), F.col("n_id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("int").alias("rank"),
                F.round("cos_exact", 4).alias("cos"))
    )
