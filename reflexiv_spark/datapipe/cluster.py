"""Duplicate clustering — connected components over near-dup pairs.

Pair generators (:mod:`reflexiv_spark.datapipe.dedup`) emit edges; a
corpus pipeline needs *clusters*: "keep one document per group of mutual
near-duplicates". Pairwise greedy dropping (drop id2 of every pair) is
what ``minhash_dedup`` does and is fine for clone blocks, but it can
over-drop on chains (A~B, B~C, A!~C drops both B and C even though C
only resembles the already-dropped B). The standard corpus-pipeline fix
(RefinedWeb, SlimPajama, Dolma all do this) is connected components over
the near-dup graph, then one representative per component.

Algorithm: *hash-to-min with pointer jumping*. Every node starts
labelled with itself; each round every node takes the minimum of its own
label, its neighbours' labels (one shuffle: edge ⋈ label, groupBy, min)
and its label's label (one more join — the pointer jump that turns
O(diameter) convergence into roughly O(log diameter)). Labels only ever
decrease and are always real node ids, so the fixpoint labels every node
with the minimum id of its component. This is the DataFrame rendering of
the two-phase CC scheme of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14) — public algorithm, re-derived here on
DataFrame ops.

100 TB design: state is two longs per node; every exchange is
(long, long); rounds are bounded and each round is two hash shuffles on
the node id. Near-dup graphs are overwhelmingly tiny star/clique
components, so convergence is typically 2-3 rounds. Nothing is
quadratic; the only driver action per round is an empty-check on the
changed set.

Reference parity note: the reference engine has no clustering analog —
this is an engine addition mandated by the training-data-pipeline brief
(same category as dedup/similarity in ``datapipe/``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "id1",
    b_col: str = "id2",
    max_rounds: int = 25,
) -> DataFrame:
    """Edges[a_col, b_col] → DataFrame[node, component] where component
    is the minimum node id reachable from ``node``. Only nodes that
    appear in at least one edge are returned (singletons are trivially
    their own component — callers left-join and coalesce).

    Converges when a full round changes no label; rounds are capped at
    ``max_rounds`` (hash-to-min + jump needs ~log2(longest path) rounds,
    so 25 covers any graph that fits on a cluster).
    """
    # materialize the (possibly expensive) edge plan ONCE before the
    # union references it twice — a MinHash pair generator would
    # otherwise execute per branch
    base = edges.select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    ).localCheckpoint(eager=True)
    und = base.union(
        base.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )

    lbl = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        # hash-to-min: every node receives the min label among its
        # neighbours (edge ⋈ label on the far endpoint, then min per node)
        nbr = (
            und.join(lbl.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        # the round's ORIGINAL label rides along as __lbl0 so the
        # convergence flag needs no extra lbl rejoin at the end of the
        # round (was a 4th join per round — one (long,long) exchange
        # removed per iteration, r13 optimization; outputs verified
        # identical on the minhash edge graph)
        stepped = (
            lbl.join(nbr, "node", "left")
            .select(
                "node",
                F.col("lbl").alias("__lbl0"),
                F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
            )
        )
        # pointer jump: lbl is itself a node id, so chase one hop —
        # lbl[v] := min(lbl[v], lbl[lbl[v]])
        jump = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("jlbl")
        )
        nxt = (
            stepped.join(jump, "lbl", "left")
            .select(
                "node",
                "__lbl0",
                F.least(F.col("lbl"), F.coalesce("jlbl", F.col("lbl"))).alias("nlbl"),
            )
        )
        from reflexiv_spark.plans.barriers import iteration_barrier

        merged = iteration_barrier(
            nxt.select(
                "node",
                F.col("nlbl").alias("lbl"),
                (F.col("nlbl") != F.col("__lbl0")).alias("__chg"),
            )
        )
        changed = merged.where(F.col("__chg")).limit(1).count()
        lbl = merged.drop("__chg")
        if changed == 0:
            break

    return lbl.select("node", F.col("lbl").alias("component"))


def dup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id1",
    b_col: str = "id2",
) -> DataFrame:
    """DataFrame[doc_id, component, csize] for every document that has at
    least one near-duplicate: its connected component (min member id) and
    the component's size. Singleton documents are excluded — at corpus
    scale the dup graph is a small fraction of the corpus and keeping the
    output proportional to it (not to n) is the point.
    """
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("component").agg(F.count("*").alias("csize"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias(id_col),
            "component",
            F.col("csize").cast("bigint").alias("csize"),
        )
    )


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Cluster-aware dedup: one representative per near-dup component,
    chosen by highest ``score_col`` (ties → smallest id); documents with
    no near-duplicate survive untouched. Returns the surviving rows of
    ``docs`` (original columns).

    This is the production alternative to min-id greedy dropping: the
    *best* copy survives, not the one that happened to get the smallest
    id. One extra join against the score table; everything else rides
    :func:`connected_components`.
    """
    from pyspark.sql import Window

    cc = connected_components(pairs)
    # LEFT join: a clustered doc missing a score row must still compete
    # (nulls rank last), otherwise incomplete score tables silently keep
    # every unscored duplicate. An all-unscored cluster keeps its
    # smallest-id member.
    ranked = (
        cc.join(
            score.select(F.col(id_col).alias("node"), score_col),
            "node",
            "left",
        )
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.col(score_col).desc_nulls_last(), F.col("node").asc()
                )
            ),
        )
    )
    losers = ranked.where(F.col("__rk") > 1).select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")
