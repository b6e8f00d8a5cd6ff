"""Iterative graph analytics over edge DataFrames: fixed-iteration
PageRank.

Complements the hash-to-min connected-components kernel in
``datapipe/cluster.py``: CC answers "which docs are the same", PageRank
answers "which nodes matter" — the standard quality prior for link-graph
corpus filtering (page importance → document sampling weight).

Scale design (100 TB of edges): per iteration exactly one
rank-attachment join (8-byte node keys) and one contribution shuffle
(groupBy dst with map-side partial sums). Out-degrees are computed once
and stay attached to the edge table; the rank state is nodes-sized, never
edges-sized. Every round passes through
:func:`reflexiv_spark.plans.barriers.iteration_barrier`, the repo-wide
idiom that cuts lineage and stops Catalyst's size-estimate squaring in
iterative self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reflexiv_spark.plans.barriers import iteration_barrier


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    barrier_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    The classic simple variant (uniform teleport ``1 - damping``,
    dangling mass not redistributed): exactly reproducible by an unrolled
    SQL oracle, deterministic given the edge set, and the variant used
    when ranks feed a *relative* ordering (corpus weighting, crawl
    prioritization) where the dangling-mass constant offset is
    irrelevant.

    ``rank_{t+1}(v) = (1-d) + d * sum_{u->v} rank_t(u) / outdeg(u)``

    Multi-edges collapse first (``distinct``) so a repeated link does not
    multiply its endorsement. Returns ``(node, rank)`` for every node
    appearing as a source or destination, ``rank`` rounded to 6 places.

    Determinism caveat: the per-iteration contribution sum is a
    double-precision ``F.sum`` whose addition order depends on
    partitioning, so ``round(rank, 6)`` is TOLERANCE-BASED, not
    bit-exact — a rank landing within an ulp of a rounding boundary can
    flip its 6th digit across runs or vs an unrolled SQL oracle (unlike
    the integer/dyadic-rational exactness devices the other operators
    use; same caveat applies to ``text.bigram_logprob``). Compare with
    an epsilon when hash equality matters and a boundary case appears.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    # Edges are scanned every round: materialize once (lazily — the
    # first action computes and pins them; no standalone warmup jobs),
    # stats reset.
    e = iteration_barrier(e, eager=False)
    # Distinct SOURCES ride the outdeg aggregate (map-side combine →
    # src-cardinality rows exchanged); distinct DESTINATIONS are one
    # dedicated distinct. The node set is then srcs ∪ dsts over those
    # two SMALL relations — the old form unioned all 2|E| raw endpoints
    # and exchanged them for a distinct (profiled at sf1.0: a 69 MB
    # exchange and the single most expensive setup stage), even though
    # both ingredients were already being computed anyway.
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    dstd = iteration_barrier(
        e.select(F.col("dst").alias("node")).distinct(), eager=False
    )
    # outdeg is src-cardinality-sized → AQE broadcasts it; edeg carries
    # (src, dst, outdeg) and is the per-round probe table. Deliberately
    # NOT barriered: edeg is a CONSTANT relation (it never participates
    # in the iterative self-join whose stats-squaring the barrier
    # exists to stop), and converting it to a LogicalRDD made every
    # round's plan a distinct subtree, defeating ReuseExchange — the
    # edge exchange re-executed per iteration (round-9 paired study,
    # BASELINE.md: 5.91 → 4.43 s at sf1.0 with bit-identical output).
    # Left as a plain plan node, Catalyst marks the per-round probe
    # subtrees equal and reuses one shuffle for all rounds.
    edeg = e.join(outdeg, "src")
    # barriered: nodes seeds round 1's rank state, so an un-truncated
    # lineage here (outdeg agg + union-distinct) nests inside every
    # subsequent round's plan — the growing-lineage shape the celebrity
    # skew test's exchange-count bound polices
    nodes = iteration_barrier(
        outdeg.select(F.col("src").alias("node"))
        .unionByName(dstd)
        .distinct(),
        eager=False,
    )
    # Nodes with NO in-edges hold the constant teleport rank (1-d) from
    # round 1 onward — computing that set ONCE (anti-join, barriered)
    # and unioning it in per round replaces the old per-round
    # nodes-left-join, which re-exchanged and re-sorted the full node
    # set every iteration (exchange-free union vs join: ~2 fewer
    # shuffles per round). nodes \ dsts ≡ srcs \ dsts, so the anti-join
    # probes the small src relation, not the full node set.
    no_in = iteration_barrier(
        outdeg.select(F.col("src").alias("node")).join(
            dstd, "node", "left_anti"
        ),
        eager=False,
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for it in range(iters):
        contrib = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        # contrib covers exactly {v : some u→v}; no_in is its complement
        # within nodes, so the union hits every node exactly once
        ranks = contrib.select(
            "node",
            (
                F.lit(1.0 - damping) + F.lit(damping) * F.col("__in")
            ).alias("rank"),
        ).unionByName(no_in.withColumn("rank", F.lit(1.0 - damping)))
        # Barrier every few rounds, not every round: an eager
        # materialization per iteration costs a full job of scheduling
        # floor, while the stats-squaring pathology needs dozens of
        # unbarriered self-join rounds to bite. Cadence 4 keeps plan
        # depth and estimates bounded at a quarter of the job cost.
        if (it + 1) % max(1, barrier_every) == 0 and it + 1 < iters:
            ranks = iteration_barrier(ranks)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts on the undirected simple graph induced by
    the edge list (direction and multiplicity are collapsed; self-loops
    dropped). Returns ``(node, triangles)`` for every node of the graph.

    The standard distributed formulation (node-iterator++ / the
    degree-oriented join): orient every undirected edge from its
    lower-degree endpoint to its higher-degree endpoint (ties by id).
    Every triangle then has exactly one wedge (a→b, a→c) centered at its
    lowest-degree vertex, so the wedge join's fan-out per vertex is
    bounded by its ORIENTED out-degree — O(sqrt(m)) on any graph, which
    tames the celebrity-vertex hub that makes the naive wedge join
    quadratic. Two hash joins total: wedges (a→b ⋈ a→c), then a
    closing-edge probe against the oriented edge set.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    e = iteration_barrier(e, eager=False)
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    oriented = iteration_barrier(oriented, eager=False)
    w1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = w1.join(w2, "a").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    ).union(
        oriented.select(F.col("b").alias("x"), F.col("a").alias("y"))
    ).distinct()
    tris = wedges.join(closing, ["x", "y"]).select("a", "x", "y")
    per_node = (
        tris.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    nodes = deg.select("node")
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
    )
