"""Connected components for dedup clustering (alternating-star method).

Near-duplicate detection emits PAIRS (MinHash/SimHash/embedding LSH);
keeping one canonical document per duplicate GROUP needs the
transitive closure of those pairs — A~B, B~C puts A,C in one cluster
even though no detector compared them.  The reference resolves entity
merges pairwise (``src/entities/resolution.py`` repoints one id at a
time); at corpus scale the closure must be computed distributedly.

Algorithm: alternating **large-star / small-star** label propagation
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public):

- large-star: every node points its LARGER neighbors at its smallest
  neighbor (or itself);
- small-star: every node points its smaller-or-equal neighbors at its
  smallest neighbor.

Each round is two groupBy shuffles over the edge list; the edge list
only shrinks toward (node -> cluster-min) stars, and convergence is
O(log n) rounds on real graphs.  Iteration happens driver-side but
each step is a full DataFrame job — no per-node driver work, and the
edge list is ``localCheckpoint``-ed per round to keep lineage flat
(the classic iterative-algorithm trap).

Output: ``(node, component)`` where component = the smallest node id
in the cluster — deterministic, so downstream "keep the minimum id as
canonical" is stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One star round over an undirected edge list (u, v).

    Canonical definitions (Kiveris et al. §3): per node u with FULL
    symmetrized neighborhood Γ(u) and m = min(Γ(u) ∪ {u}) —
    large-star emits (v, m) for v ∈ Γ(u), v > u; small-star emits
    (v, m) for v ∈ Γ(u), v <= u, plus (u, m).  The minimum is over
    the whole neighborhood in BOTH rounds (min over only the filtered
    side degenerates large-star into edge re-orientation)."""
    # NOTE: no self-unions anywhere — unioning two projections of the
    # same parent plan trips Catalyst's Union constraint rewrite
    # (key-not-found on the reused attribute); array-explode emits the
    # same rows from a single plan branch.
    sym = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # Per-node minimum as a MAP-SIDE-COMBINED aggregate joined back to
    # the edge rows — never a collect_set neighborhood row.  A hub of
    # degree n (one giant dup cluster: boilerplate at corpus scale)
    # stays n ordinary rows on one key, which AQE's skew-join splitting
    # can subdivide; a single array row holding n neighbors cannot be
    # split and would cap cluster size at executor row memory.
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
    )
    exploded = sym.join(mins, "u").select("u", "m", "v")
    if large:
        out = exploded.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        out = (
            exploded.select(
                F.explode(
                    F.array(
                        F.when(
                            F.col("v") <= F.col("u"),
                            F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        ),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .filter(F.col("e").isNotNull())
            .select("e.u", "e.v")
        )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Compute components of the undirected graph given by (src, dst)
    pairs.  Returns ``(node, component)`` for every node appearing in
    any edge; component is the cluster's minimum node id.

    Convergence is detected by edge-set stability (small-star output is
    a fixpoint star forest); ``max_iter`` bounds pathological chains
    (a path graph needs O(log n) rounds)."""
    base = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u").isNotNull() & F.col("v").isNotNull()
    )
    # nodes BEFORE the self-loop drop: a node appearing only in (x, x)
    # edges is still a node and must land as its own singleton
    nodes = (
        base.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        base.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    prev_count = cur.count()
    for _ in range(max_iter):
        after_large = _star(cur, large=True)
        after_small = _star(after_large, large=False).localCheckpoint(eager=True)
        # fixpoint: star forests are stable under both rounds.  The
        # count compare is the cheap gate (1 job on already-checkpointed
        # data); the two-sided set equality only runs when counts match,
        # saving 2 jobs per non-final round
        n = after_small.count()
        if n == prev_count and after_small.exceptAll(cur).isEmpty() and cur.exceptAll(after_small).isEmpty():
            cur = after_small
            break
        prev_count = n
        cur = after_small

    # cur is now a star forest: u -> root (root = component min).  The
    # min-aggregation also guards the max_iter-without-fixpoint case
    # (a node transiently holding two targets resolves downward).
    roots = (
        cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return (
        nodes.join(roots, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
