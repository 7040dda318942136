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
endpoints, each round moves 10⁷ rows, not 10⁹.

Two fixpoint engines over the same API (r4):

* ``connected_components`` — min-label propagation; rounds = graph
  DIAMETER.  Fine for hub-shaped LSH graphs, pathological on chains.
* ``connected_components_star`` — alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): each alternation contracts path lengths multiplicatively, so
  rounds = O(log d) — a 1000-long chain converges in ~6 alternations
  where propagation needs ~1000 (test-pinned).  Edge count never grows
  (large-star emits exactly one edge per undirected input edge;
  small-star is count-preserving), every round shuffles only edge
  endpoints, and convergence detection rides the round's checkpoint job
  as an Observation — no extra action.  This is the catalog default
  (plans/text.py _cluster_labels).
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


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    vertex_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al. SoCC'14).

    Same contract as :func:`connected_components` — returns
    ``(id, component)`` with component = min vertex id reachable, edges
    undirected — but converges in O(log d) alternations instead of O(d)
    propagation rounds.

    * **large-star(u)**: with m = min(N(u) ∪ {u}), re-point every LARGER
      neighbor v > u at m.  Emits exactly one edge per undirected input
      edge (the edge {u,v} is emitted only from its smaller endpoint's
      group), so the edge multiset never grows.
    * **small-star(u)**: over edges oriented (big=u, small=v), with
      m = min(N(u) ∪ {u}) = min smaller-neighbor, attach u and every
      other smaller neighbor directly to m.  Count-preserving (k inputs →
      k outputs).

    Both operations preserve connectivity and the node set; the fixpoint
    is a forest of depth-1 stars rooted at each component's minimum id.
    Convergence is detected with per-round Observations riding each
    checkpoint job (no extra action, no edge-set diff): large-star counts
    re-pointed edges (group min beat the anchor, ``m != u``), small-star
    counts groups with more than one smaller neighbor.  The loop stops
    only when BOTH are zero within one alternation — each alone is
    insufficient (a path ``1-2-3-4`` large-stars into
    ``{(2,1),(3,1),(4,2)}`` where every node has exactly one parent, yet
    node 4 is not attached to the component min until the NEXT large-star
    reports a change); jointly they certify a depth-1 star forest rooted
    at local minima, which Kiveris et al. show is rooted at component
    minima.

    ``stats``, when given, receives ``{"rounds": n}`` (alternations run) —
    used by the O(log d) regression test.
    """
    from pyspark.sql import Observation

    # canonicalize: (big, small), no self-loops, distinct
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest(F.col("a"), F.col("b")).alias("big"),
            F.least(F.col("a"), F.col("b")).alias("small"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    endpoints = (
        e.select(F.col("big").alias("id"))
        .union(e.select(F.col("small").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if not e.take(1):
        # statically-empty edge plans get PropagateEmptyRelation'd, which
        # prunes the CollectMetrics nodes the convergence check reads —
        # and with no edges every vertex is a singleton anyway
        if stats is not None:
            stats["rounds"] = 0
        return vertices.select(
            F.col(vertex_col).alias("id"), F.col(vertex_col).alias("component")
        )

    rounds = 0
    prev_ss_changed: int | None = None
    for i in range(max_iter):
        # ---- large-star: group by the SMALLER endpoint's neighborhood ----
        sym = e.select(F.col("big").alias("u"), F.col("small").alias("v")).union(
            e.select(F.col("small").alias("u"), F.col("big").alias("v"))
        )
        grp = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        ls_obs = Observation(f"cc_ls_{i}")
        e = (
            sym.filter(F.col("v") > F.col("u"))
            .join(grp, "u")
            # counted BEFORE distinct: zero iff large-star was a no-op
            .observe(
                ls_obs,
                F.coalesce(
                    F.sum((F.col("m") != F.col("u")).cast("long")), F.lit(0)
                ).alias("ls_changed"),
            )
            .select(F.col("v").alias("big"), F.col("m").alias("small"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if prev_ss_changed == 0 and ls_obs.get["ls_changed"] == 0:
            # the previous small-star left the edge set untouched and this
            # large-star did too → both stars are no-ops on the SAME edge
            # set: fixpoint, skip the redundant final small-star
            rounds = i + 1
            break

        # ---- small-star: group by the BIGGER endpoint ----
        mins = e.groupBy("big").agg(
            F.min("small").alias("m"), F.count("small").alias("k")
        )
        ss_obs = Observation(f"cc_ss_{i}")
        joined = e.join(mins, "big").observe(
            ss_obs,
            F.coalesce(F.sum(F.col("k") - 1), F.lit(0)).alias("ss_changed"),
        )
        # emit (big → m) and (small → m | small != m); explode keeps the
        # observed frame single-consumer (an Observation may be bound to
        # one Dataset only — a self-union would duplicate the node)
        e = (
            joined.select(
                F.col("m"), F.explode(F.array("big", "small")).alias("x")
            )
            .filter(F.col("x") != F.col("m"))
            .select(F.col("x").alias("big"), F.col("m").alias("small"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds = i + 1
        prev_ss_changed = int(ss_obs.get["ss_changed"])
        # fixpoint requires BOTH stars to be no-ops in the SAME alternation
        # (see docstring for why either alone is unsound)
        if ls_obs.get["ls_changed"] == 0 and prev_ss_changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "alternations — raise max_iter"
        )
    if stats is not None:
        stats["rounds"] = rounds

    labels = e.select(F.col("big").alias("id"), F.col("small").alias("component"))
    roots = (
        endpoints.join(
            e.select(F.col("big").alias("id")).distinct(), "id", "left_anti"
        ).select("id", F.col("id").alias("component"))
    )
    singletons = (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(endpoints, "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labels.unionByName(roots).unionByName(singletons)
