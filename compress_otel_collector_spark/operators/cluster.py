"""Connected components over near-duplicate pair graphs — the dedup
last mile.

Every pairwise dedup operator in this repo (``minhash_lsh_pairs``,
``simhash_hamming_pairs``, ``embedding_dup_pairs_lsh``,
``ngram_jaccard_pairs``) emits candidate PAIRS. A production curation run
must then pick ONE representative per duplicate *cluster* — pairs are not
transitive-closed (A~B, B~C usually means A,B,C are one boilerplate
family even when (A,C) missed the candidate net), so keeping "one per
pair" both over- and under-deletes. This operator closes the gap:
``connected_components`` labels every node with the minimum reachable
node id, and :func:`drop_near_duplicates` keeps exactly the
representative (min doc_id) of each cluster plus every unpaired doc.

Algorithm — iterative min-label propagation with pointer jumping (the
"hash-to-min" family: Rastogi et al., "Finding Connected Components in
Map-Reduce in Logarithmic Rounds", ICDE 2013; same shape GraphX/
GraphFrames use). Per round, entirely as DataFrame ops:

1. neighbor step: every node takes ``min(label(self), label(neighbors))``
   — one join of the symmetrized edge list with the label table + one
   min-aggregate, both keyed by node id;
2. pointer-jumping step: ``label(node) = label(label(node))`` — one
   self-join of the label table (labels only ever decrease, so the
   parent's label is always ≤ the node's own).

Rounds needed: O(log d) for diameter d with jumping. Near-dup clusters
are shallow (a boilerplate family is a quasi-clique — diameter ≲ 3), so
real corpora converge in 2–3 rounds; ``max_iter`` is a hard stop against
pathological inputs, and non-convergence raises rather than silently
returning partial labels.

100 TB shape: there is deliberately a bounded DRIVER-SIDE LOOP here —
iterative graph algorithms are rounds of shuffles by construction (this
is exactly how GraphX implements CC) — but no driver-side DATA: each
round is two node-id-keyed exchanges over the label table (|V| rows,
far smaller than the corpus — only docs that collided in some LSH
bucket), the per-round convergence check is a boolean ``isEmpty`` on a
changed-rows filter, and ``localCheckpoint`` truncates the lineage each
round so the plan does not grow with iterations (on a real cluster,
prefer ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` —
reliable storage instead of executor-local blocks). Degree is already
bounded upstream by the LSH hot-bucket caps, so no skew salt is needed:
label keys are doc ids, uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_local_checkpoint(df: DataFrame) -> None:
    """Unpersist the executor-local blocks behind a ``localCheckpoint``-ed
    DataFrame (the DF is unusable afterwards — call only on rounds' dead
    intermediates). ``Dataset.unpersist`` only talks to the cache manager,
    not checkpoint blocks, so this reaches the LogicalRDD's RDD directly;
    best-effort (a Spark-internals change degrades to the old
    grows-until-session-end behavior, never to an error)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(edges: DataFrame, a: str = "a_id",
                         b: str = "b_id", max_iter: int = 25) -> DataFrame:
    """``(node, comp)`` for every node in ``edges``; ``comp`` is the
    minimum node id reachable via the undirected pair graph (so the
    component label IS its representative member).

    Only nodes that appear in at least one edge are returned — callers
    treat absent docs as singletons (see :func:`drop_near_duplicates`).
    Raises ``ValueError`` after ``max_iter`` non-converged rounds.
    """
    sym = (
        edges.select(F.col(a).cast("long").alias("u"),
                     F.col(b).cast("long").alias("v"))
        .union(edges.select(F.col(b).cast("long").alias("u"),
                            F.col(a).cast("long").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    comp = (
        sym.select(F.col("u").alias("node")).distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(max_iter):
        # 1) neighbor step: node takes min over self + neighbors' labels
        msgs = (
            sym.join(comp, sym["v"] == comp["node"])
            .select(F.col("u").alias("node"), F.col("comp"))
        )
        stepped = (
            comp.unionByName(msgs)
            .groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # 2) pointer jumping: label(node) = label(label(node)). Labels
        # are node ids and only ever decrease, so the parent row always
        # exists and its label is ≤ ours — taking it is monotone-safe.
        parent = stepped.select(F.col("node").alias("p_node"),
                                F.col("comp").alias("p_comp"))
        jumped = (
            stepped.join(parent, stepped["comp"] == parent["p_node"])
            .select("node", F.col("p_comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # round 0 always changes labels when any non-self edge exists
        # (some node has a smaller neighbor), so the convergence probe —
        # one join + isEmpty job — is normally skipped there; a degenerate
        # all-self-loop input just pays one extra (empty-delta) round.
        # With max_iter == 1 there IS no later round, so probe immediately
        # (trivially-converged inputs then succeed instead of raising).
        if rnd > 0 or max_iter == 1:
            changed = (
                jumped.alias("n")
                .join(comp.alias("o"), "node")
                .where(F.col("n.comp") != F.col("o.comp"))
            )
            converged = changed.isEmpty()
        else:
            converged = False
        # the previous round's label table is dead once the probe above
        # has consumed it — free its checkpoint blocks so executor
        # storage stays O(|V|), not O(rounds·|V|)
        _free_local_checkpoint(comp)
        comp = jumped
        if converged:
            _free_local_checkpoint(sym)
            return comp
    raise ValueError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological pair graph (diameter > 2^rounds)")


def drop_near_duplicates(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", a: str = "a_id",
                         b: str = "b_id") -> DataFrame:
    """Keep one representative (min id) per duplicate cluster, plus every
    doc that never appeared in a candidate pair.

    One anti-join against the non-representative members — the keep
    predicate never touches doc payloads, so at 100 TB the corpus-side
    cost is a single id-keyed anti-join (broadcastable whenever the
    duplicate mass fits an executor; Spark picks the strategy)."""
    comp = connected_components(pairs, a=a, b=b)
    losers = (comp.where(F.col("node") != F.col("comp"))
              .select(F.col("node").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


def cluster_summary(pairs: DataFrame, a: str = "a_id",
                    b: str = "b_id") -> DataFrame:
    """Per-cluster ledger rows: ``(rep_id, cluster_size, members)`` with
    ``members`` the comma-joined member ids in ascending numeric order —
    deterministic output for oracle comparison (clusters of size 1 cannot
    appear: every node here came from at least one pair)."""
    comp = connected_components(pairs, a=a, b=b)
    members = F.concat_ws(
        ",", F.transform(F.sort_array(F.collect_list("node")),
                         lambda x: x.cast("string")))
    return (
        comp.groupBy(F.col("comp").alias("rep_id"))
        .agg(F.count("*").cast("long").alias("cluster_size"),
             members.alias("members"))
    )
