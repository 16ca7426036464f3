"""Iterative DataFrame connected components + group-representative selection.

Replaces ``scipy.sparse.csgraph.connected_components``
(/root/reference/string_grouper/string_grouper.py:851-904) with the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed as pure DataFrame
transforms in a driver loop — the one part of the engine Catalyst cannot
express (SURVEY §4.2).  Converges in O(log n) rounds; every round is
``localCheckpoint``-ed to cut lineage (at cluster scale, swap in a
table-backed checkpoint via checkpoint.StageCheckpointer).

Component label = minimum node id in the component — deterministic, so group
ids are stable across partitionings and cluster sizes.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GROUP_REP_CENTROID, MatchConfig
from .similarity import LEFT, RIGHT, SIM

NODE = "node"
COMPONENT = "component"


def _canonical_undirected(edges: DataFrame) -> DataFrame:
    """(u,v) multiset -> distinct unordered pairs as (hi=a > lo=b), no loops."""
    u, v = F.col("u"), F.col("v")
    return (
        edges.select(F.greatest(u, v).alias("a"), F.least(u, v).alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _is_star_forest(edges: DataFrame) -> bool:
    """True iff the canonical edge set is a union of DISJOINT min-rooted
    stars — the large/small-star fixed point the label extraction assumes.

    Condition on canonical (a > b) edges: (1) no node appears on both the
    member ('a') and center ('b') side, and (2) every member has exactly one
    center.  Sufficiency: on such a graph one more large-star + small-star
    round provably re-emits the same edges, so iterating further is pure
    cost.  This replaces the previous fingerprint-equality stop, which had
    to RUN the extra round to observe that nothing changed — one whole
    round (≈5 exchanges + a checkpoint materialization) saved per
    connected_components call, and a plain-wrong-labels guard: a
    hypothetical non-star fixed point now raises at ``max_iterations``
    instead of silently passing fingerprint equality into the star-shaped
    label extraction.  Cost: one count-aggregation + limit-1 job over the
    (checkpointed) edge set per round.
    """
    # ONE scan of the edge set: explode each edge into its two (node, side)
    # rows inside the same task.  The two-legged union formulation read the
    # edges twice — and with the lazy per-round checkpoints both legs can
    # race to compute a not-yet-cached partition, paying the reduce-side
    # canonicalization twice on the round's first (materializing) job.
    sides = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("n"), F.lit(1).alias("ia")),
                F.struct(F.col("b").alias("n"), F.lit(0).alias("ia")),
            )
        ).alias("s")
    ).select("s.n", "s.ia")
    viol = (
        sides.groupBy("n")
        .agg(F.sum("ia").alias("na"), F.sum(1 - F.col("ia")).alias("nb"))
        .where((F.col("na") > 0) & ((F.col("nb") > 0) | (F.col("na") > 1)))
    )
    return viol.isEmpty()


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to min(Γ(u) ∪ {u})."""
    # symmetrize in one scan (explode, not self-union — see _is_star_forest)
    g = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    m = g.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    bigger = g.where(F.col("v") > F.col("u")).join(m, "u")
    return _canonical_undirected(bigger.select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient high->low; connect all smaller neighbors (and self) to the min."""
    m = edges.groupBy("a").agg(F.min("b").alias("m"))
    j = edges.join(m, "a")
    to_min = j.select(F.col("b").alias("u"), F.col("m").alias("v"))
    center = m.select(F.col("a").alias("u"), F.col("m").alias("v"))
    return _canonical_undirected(to_min.unionAll(center))


def connected_components(
    edges: DataFrame,
    nodes: Optional[DataFrame] = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Edge list (any two numeric columns = endpoints) -> (node, component).

    ``nodes``: optional 1-column DataFrame of all node ids; isolated nodes
    become singleton components.  Component id = min node id in component.
    """
    ec = edges.columns
    # LAZY localCheckpoint: the star-forest check below always runs a
    # full-aggregation job over ``cur`` immediately after each (re)assign,
    # which materializes the checkpoint as a side effect of that job's map
    # stage — an eager checkpoint would run a SEPARATE materialization pass
    # first and the check would re-read the blocks (one extra pass over the
    # edge set per round).  The loop can only exit through a check on the
    # final ``cur`` (or raise), so the returned label plan always reads
    # fully-materialized checkpoint blocks — callers may release upstream
    # caches as soon as connected_components returns, exactly as before.
    cur = _canonical_undirected(
        edges.select(F.col(ec[0]).alias("u"), F.col(ec[1]).alias("v"))
    ).localCheckpoint(eager=False)

    # converged the moment the edges are a disjoint star forest (checked
    # BEFORE each round too: an already-star input pays no round at all);
    # see _is_star_forest for why this saves one full round per call
    for _ in range(max_iterations + 1):
        if _is_star_forest(cur):
            break
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")

    # Fixed point is a union of stars: 'a' (hi) members point at 'b' = center.
    # A center can appear on the 'b' side only.
    # one scan: each star edge yields its member row and its center row
    # (explode, not a two-legged self-union — see _is_star_forest)
    labels = (
        cur.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias(NODE), F.col("b").alias(COMPONENT)),
                    F.struct(F.col("b").alias(NODE), F.col("b").alias(COMPONENT)),
                )
            ).alias("m")
        )
        .select(f"m.{NODE}", f"m.{COMPONENT}")
        .groupBy(NODE)
        .agg(F.min(COMPONENT).alias(COMPONENT))
    )
    if nodes is not None:
        nc = nodes.columns[0]
        singletons = nodes.select(F.col(nc).alias(NODE)).join(
            labels, NODE, "left_anti"
        ).withColumn(COMPONENT, F.col(NODE))
        labels = labels.unionAll(singletons)
    return labels


def group_labels(
    edges: DataFrame,
    nodes: DataFrame,
    cfg: MatchConfig,
) -> DataFrame:
    """Reference ``_deduplicate`` semantics (SG:851-904) on an edge DataFrame.

    ``edges``: (master_side, dupe_side, similarity) edge MULTISET as produced
    by the match pipeline after symmetrize (includes the diagonal).  Duplicate
    entries contribute repeatedly to the centroid weight — exactly like the
    reference's csr construction which sums duplicate (i,j) entries.

    Returns (node, group_rep) where group_rep is the representative's row id:
      * 'first'    -> smallest row id in the component (pandas transform('first')
                      over position-ordered rows, SG:872-873)
      * 'centroid' -> row with the largest similarity row-sum (SG:875-881);
                      ties -> smallest row id (pandas idxmax keeps first max).
    """
    simple = edges.where(F.col(LEFT) != F.col(RIGHT)).select(
        F.col(LEFT).alias("u"), F.col(RIGHT).alias("v")
    )
    comp = connected_components(simple, nodes)

    if cfg.group_rep == GROUP_REP_CENTROID:
        weights = edges.groupBy(LEFT).agg(F.sum(SIM).alias("_weight")).select(
            F.col(LEFT).alias(NODE), "_weight"
        )
        ranked = comp.join(weights, NODE, "left").withColumn(
            "_weight", F.coalesce(F.col("_weight"), F.lit(0.0))
        )
        # argmax weight, tie -> min node, as one MIN-of-struct: negating the
        # (non-negative) weight makes lexicographic struct-min equal the
        # row_number()-over-(weight desc, node asc) pick
        pick = F.min(F.struct((-F.col("_weight")).alias("_o"), F.col(NODE).alias("_n")))
        # groupBy + join instead of a row_number window over COMPONENT: a
        # boilerplate MEGACOMPONENT would land in one window sort task, while
        # the aggregation combines map-side and AQE can skew-split the join
        reps = (
            ranked.groupBy(COMPONENT)
            .agg(pick.alias("_p"))
            .select(COMPONENT, F.col("_p._n").alias("group_rep"))
        )
        return comp.join(reps, COMPONENT).select(NODE, "group_rep")
    # 'first' rep = smallest node id in the component, which IS the
    # component label (connected_components' min-id invariant) — no
    # aggregation or join needed at all
    return comp.select(NODE, F.col(COMPONENT).alias("group_rep"))
