"""Connected components via min-label propagation — the cluster step of
near-duplicate deduplication (SURVEY.md §2.9 OP-X-DEDUP-NEAR: "connected
components for clusters").

Iterative algorithms don't fit a single Catalyst plan; the driver loop runs
one join + aggregate per round and truncates lineage with an eager
``localCheckpoint`` so the plan doesn't grow unboundedly.  Convergence: every
vertex ends with the minimum vertex id reachable in its component —
deterministic, so the result is oracle-checkable against a recursive-CTE
transitive closure.

Scale: the propagation loop runs ONLY over vertices that appear in an edge
— every other vertex is a singleton (component = its own id) and is unioned
back at the end without ever entering a round.  Near-dup candidate graphs
are sparse (≪ 1% of a deduplicated corpus), so this cuts the per-round
shuffle from |V| to |edge endpoints|: at 10⁹ docs with 10⁷ candidate-pair
endpoints, each round moves 10⁷ rows, not 10⁹.  Each round is one shuffle
on vertex id; rounds needed = graph diameter (LSH candidate graphs are
shallow — hub-shaped, a few rounds).  For planet-scale graphs you'd switch
to large-star/small-star (alternating optimizations of the same fixpoint);
the API is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Returns (id, component) where component = min vertex id in the
    connected component.  ``edges`` is treated as undirected."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # und is symmetric, so column "a" alone covers every edge endpoint
    endpoints = und.select(F.col("a").alias("id")).distinct()
    labels = endpoints.select("id", F.col("id").alias("component")).localCheckpoint(
        eager=True
    )

    from pyspark.sql import Observation

    for i in range(max_iter):
        nbr_min = (
            und.join(labels, und.a == labels.id)
            .groupBy(F.col("b").alias("id2"))
            .agg(F.min("component").alias("nbr"))
        )
        # the convergence check rides the checkpoint job as an Observation
        # (one job per round, not two: the old separate join+count doubled
        # the per-round latency); coalesce guards the empty-graph case
        # (sum over zero rows is NULL, which must read as converged)
        obs = Observation(f"cc_round_{i}")
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.id2, "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr"), F.col("component"))).alias(
                    "component"
                ),
                F.col("component").alias("_prev"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum((F.col("component") != F.col("_prev")).cast("long")), F.lit(0)
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("_prev")
        if obs.get["changed"] == 0:
            break
    else:
        # iterations exhausted with labels still moving: silently
        # returning the partial propagation would mislabel one component
        # as several (dedup then KEEPS duplicates) — fail loudly; the
        # caller raises max_iter (rounds needed ≈ graph diameter)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({int(obs.get['changed'])} labels still changing) — the "
            f"candidate graph's diameter exceeds max_iter; raise it"
        )

    singletons = (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(endpoints, "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labels.unionByName(singletons)
