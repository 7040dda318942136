"""Iterative graph/linear-algebra operators (§2.9 extension surface):
PageRank and power-iteration PCA.

Both are driver-loop algorithms (like operators/components.py): a fixed
number of rounds, each round one Catalyst plan, lineage truncated with
``localCheckpoint``.  Both are EXACT-INTEGER so every round is independent
of accumulation order and bit-identical to a DuckDB oracle that unrolls the
same rounds as chained CTEs:

* PageRank keeps ranks as BIGINTs scaled by 1e12; the damping update is
  ``(15*base + 85*contrib) DIV 100`` — Spark ``DIV`` and DuckDB ``//`` both
  truncate toward zero, and integer sums commute, so partial aggregation
  order can't change the result (a float PageRank would differ in the last
  ulp between engines).
* PCA quantizes embeddings by ``floor(x * 64.0)`` — 64 is a power of two,
  so the multiply is a mantissa shift (exact for every float), and floor of
  an exact product is engine-independent.  The covariance accumulation and
  the matvec rounds are integer arithmetic end to end.

Scale shapes:
* PageRank: per round, ONE shuffle of the edge list on src (join ranks) and
  one on dst (contribution sum) — |E| rows each, the standard web-graph
  pattern; ranks/outdeg co-partition on node id so AQE can reuse the
  exchange.  The synthetic modular-arithmetic link graph stands in for a
  crawl's hyperlink table (the driver testdata has no real links); swap
  ``_edge_formulas`` for a real (src, dst) table and nothing else changes.
* PCA: the only corpus-sized pass is the covariance aggregation — explode
  to (row, dim, q) then a self-join on row id and a (i, j) grouBy: d²-per-row
  map-side work with full partial aggregation, one shuffle of d² partials
  per partition.  The d×d result (64×64 = 4 KiB) is driver-resident by
  design — like k-means centroids, it is O(d²) REGARDLESS of corpus size, so
  the power iteration itself runs in exact unbounded Python ints on the
  driver (no per-round cluster jobs for a 4096-row matrix).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t


# Integer-distance rule used throughout this module: int64 numpy
# arithmetic is exact (diffs² ≤ 2^44 · 64 dims < 2^63) and integer sums
# are commutative, so ANY evaluation order gives the identical BIGINT —
# no fold-order discipline needed, unlike the float paths in
# plans/similarity.py.

# ---------------------------------------------------------------------------
# PageRank (OP-X-GRAPH): damped, integer-scaled, fixed rounds
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 8
# deterministic synthetic link graph: (multiplier, offset, modulus-filter)
_EDGE_FORMULAS = ((7, 3, None), (13, 5, None), (31, 11, 3))


def _synthetic_edges(d: DataFrame, n: int) -> DataFrame:
    """The deterministic modular-arithmetic link graph shared by the graph
    queries (stands in for a crawl's hyperlink table; swap for a real
    (src, dst) table and nothing downstream changes)."""
    parts = []
    for mult, off, modf in _EDGE_FORMULAS:
        e = d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * mult + off) % n).alias("dst"),
        )
        if modf is not None:
            e = e.filter(F.col("src") % modf == 0)
        parts.append(e)
    return (
        parts[0]
        .union(parts[1])
        .union(parts[2])
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _edges_sql_ctes() -> list[str]:
    """Shared oracle CTEs: nodes, node count, raw formula edges, distinct
    directed edges — the SQL twin of :func:`_synthetic_edges`."""
    e_parts = []
    for mult, off, modf in _EDGE_FORMULAS:
        where = f" WHERE node % {modf} = 0" if modf is not None else ""
        e_parts.append(
            f"SELECT node AS src, (node*{mult}+{off}) % (SELECT n FROM nn) AS dst"
            f" FROM nodes{where}"
        )
    e_raw = "\n  UNION ALL ".join(e_parts)
    return [
        "nodes AS (SELECT doc_id AS node FROM documents)",
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        f"e_raw AS (\n  {e_raw}\n)",
        "edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM e_raw WHERE src <> dst)",
    ]


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85) over a deterministic synthetic link graph on
    the documents table, ``_PR_ITERS`` synchronous rounds, ranks as BIGINTs
    scaled by 1e12.  The training-data use case: graph-quality weighting of
    a crawl (rank mass ∝ how linked-to a page is) feeding sampling weights.
    """
    d = t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()  # driver scalar, like a centroid count — O(1)
    base = _PR_SCALE // n

    edges = _synthetic_edges(d, n)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # edge list + outdeg fused once; every round reuses this checkpointed table
    ew = edges.join(outdeg, "src").localCheckpoint(eager=True)

    # r12: the rounds chain lazily into ONE plan — ``_PR_ITERS`` is a
    # fixed constant, so lineage depth is bounded and the per-round
    # eager localCheckpoints were 8 blocking driver round-trips of pure
    # fixed cost for a 15k-edge graph; the 8 identical ew-side shuffles
    # canonicalize to one exchange that AQE reuses round-over-round.
    # Integer ranks make every round order-free, so the single-plan
    # execution is bit-identical (measured 3.38 -> 3.07 s median under
    # external box load — the win is 8 fewer blocking jobs; at cluster
    # scale those are 8 fewer full barriers).
    ranks = d.select(
        F.col("doc_id").alias("node"), F.lit(base).cast("long").alias("rank")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            ew.join(
                ranks.select(F.col("node").alias("src"), "rank").hint("shuffle_hash"),
                "src",
            )
            .select("dst", F.expr("rank DIV outdeg").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            d.select(F.col("doc_id").alias("node"))
            .join(
                contrib.select(F.col("dst").alias("node"), "contrib").hint(
                    "shuffle_hash"
                ),
                "node",
                "left",
            )
            .select(
                "node",
                F.expr(
                    f"(CAST({15 * base} AS BIGINT)"
                    " + 85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100"
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").alias("rank_scaled"))


def _pagerank_sql() -> str:
    ctes = _edges_sql_ctes() + [
        f"bb AS (SELECT {_PR_SCALE} // n AS b FROM nn)",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT node, (SELECT b FROM bb) AS rank FROM nodes)",
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""r{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         (15 * (SELECT b FROM bb) + 85 * COALESCE(c.contrib, 0)) // 100 AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst, SUM(r.rank // o.outdeg) AS contrib
    FROM edges e JOIN outdeg o ON e.src = o.src JOIN r{i} r ON r.node = e.src
    GROUP BY e.dst
  ) c ON c.dst = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM r{_PR_ITERS}"
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the (undirected) link graph: the
    classic cohesion metric — triangle-dense neighborhoods of a crawl are
    boilerplate farms / link rings, so per-node triangle participation
    feeds the same sampling-weight pipeline as PageRank.  Top-10 nodes by
    participation, with the global triangle count alongside.

    Shape: edges canonicalize to ``u < v`` once, then the standard
    wedge-close algorithm — one self-join on the shared middle vertex
    builds wedges (a<b<c by construction), one LEFT-SEMI join against the
    edge table closes them.  Every join keys on a vertex column of the
    edge table (corpus-sized → ``shuffle_hash``-pinned, never broadcast);
    cost is O(Σ deg²) wedges, the textbook bound.  All-integer →
    order-free, bit-identical to the oracle.
    """
    d = t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    # the modular formula graph alone is triangle-free — add the 2-ring
    # (a→a+1, a→a+2), whose consecutive chords close (a, a+1, a+2)
    # triangles everywhere; PageRank keeps the original edge set, so its
    # driver-green result is untouched
    ring = d.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") + 1) % n).alias("dst")
    ).union(
        d.select(F.col("doc_id"), ((F.col("doc_id") + 2) % n))
    )
    ue = (
        _synthetic_edges(d, n)
        .union(ring.filter(F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed three times below
    )
    wedges = (
        ue.alias("e1")
        .join(ue.hint("shuffle_hash").alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(
            F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c")
        )
    )
    tris = wedges.join(
        ue.hint("shuffle_hash").alias("e3"),
        (F.col("a") == F.col("e3.u")) & (F.col("c") == F.col("e3.v")),
        "left_semi",
    ).localCheckpoint(eager=True)
    total = tris.agg(F.count("*").alias("total_triangles"))
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        per_node.join(F.broadcast(total))
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(10)
    )


_TRIANGLES_SQL = (
    "WITH "
    + ",\n".join(_edges_sql_ctes())
    + """,
tedges AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT node AS src, (node + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node + 2) % (SELECT n FROM nn) AS dst FROM nodes
),
uedges AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM tedges WHERE src <> dst
),
tris AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM uedges e1 JOIN uedges e2 ON e1.v = e2.u
  WHERE EXISTS (SELECT 1 FROM uedges e3 WHERE e3.u = e1.u AND e3.v = e2.v)
),
pn AS (
  SELECT node, COUNT(*) AS n_triangles
  FROM (SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris)
  GROUP BY node
)
SELECT node, n_triangles, (SELECT COUNT(*) FROM tris) AS total_triangles
FROM pn
ORDER BY n_triangles DESC, node ASC LIMIT 10
"""
)


# ---------------------------------------------------------------------------
# Power-iteration PCA (OP-X-PCA): top principal direction of the embeddings
# ---------------------------------------------------------------------------

_PCA_QUANT = 64.0  # power of two → exact float multiply on every engine
_PCA_XSCALE = 10**6
_PCA_ITERS = 6


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the (quantized, uncentered) embedding
    second-moment matrix via ``_PCA_ITERS`` power-iteration rounds, returned
    as (dim_idx, pc_scaled) with components scaled to max|x| = 1e6.

    Training-data use: the leading direction of an embedding collection
    drives whitening / anisotropy diagnostics ("all-but-the-top") before
    cosine retrieval.  The corpus-sized work — the d² second-moment
    aggregation — is fully distributed with map-side partials; the 64×64
    matrix is then collected (4 KiB, size independent of corpus) and the
    matvec rounds run in unbounded-precision Python ints, normalizing by
    max|y| with truncating division each round exactly like the DuckDB
    oracle's unrolled hugeint CTEs."""
    e = t(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vec_id", "i", F.floor(F.col("x") * F.lit(_PCA_QUANT)).cast("long").alias("q")
    )
    qb = q.select(F.col("vec_id").alias("vid"), F.col("i").alias("j"), F.col("q").alias("qj"))
    cov = (
        q.join(qb.hint("shuffle_hash"), q.vec_id == qb.vid)
        .select("i", "j", (F.col("q") * F.col("qj")).alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("v"))
    )
    mat = {(r["i"], r["j"]): r["v"] for r in cov.collect()}
    dim = 1 + max(i for i, _ in mat)

    x = [_PCA_XSCALE] * dim
    for _ in range(_PCA_ITERS):
        y = [
            sum(mat.get((i, j), 0) * x[j] for j in range(dim)) for i in range(dim)
        ]
        m = max(abs(v) for v in y)
        # sign-split // truncates toward zero — same as DuckDB's hugeint //
        x = [
            (v * _PCA_XSCALE) // m if v >= 0 else -((-v * _PCA_XSCALE) // m)
            for v in y
        ]
    return spark.createDataFrame(
        [(i, x[i]) for i in range(dim)], "dim_idx INT, pc_scaled BIGINT"
    )


def _pca_sql() -> str:
    ctes = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, i - 1 AS i,
         CAST(FLOOR(x * {_PCA_QUANT}) AS BIGINT) AS q
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
)""",
        """cov AS MATERIALIZED (
  SELECT a.i, b.i AS j, SUM(CAST(a.q AS HUGEINT) * b.q) AS v
  FROM q a JOIN q b ON a.vec_id = b.vec_id
  GROUP BY a.i, b.i
)""",
        f"""x0 AS (SELECT DISTINCT i AS j, CAST({_PCA_XSCALE} AS HUGEINT) AS xv FROM q)""",
    ]
    for k in range(_PCA_ITERS):
        ctes.append(
            f"""y{k} AS MATERIALIZED (
  SELECT cov.i, SUM(cov.v * x{k}.xv) AS yv
  FROM cov JOIN x{k} ON cov.j = x{k}.j
  GROUP BY cov.i
)"""
        )
        ctes.append(f"m{k} AS MATERIALIZED (SELECT MAX(ABS(yv)) AS m FROM y{k})")
        ctes.append(
            f"""x{k + 1} AS MATERIALIZED (
  SELECT i AS j,
         CASE WHEN yv >= 0 THEN (yv * {_PCA_XSCALE}) // (SELECT m FROM m{k})
              ELSE -((-yv * {_PCA_XSCALE}) // (SELECT m FROM m{k})) END AS xv
  FROM y{k}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(j AS INT) AS dim_idx, CAST(xv AS BIGINT) AS pc_scaled"
        f" FROM x{_PCA_ITERS}"
    )


# ---------------------------------------------------------------------------
# Lloyd's k-means training (OP-X-KMEANS): learn IVF cells, not just use them
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_Q = 1 << 20  # power of two — exact float multiply before floor


def emb_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means on the embeddings (K=``_KM_K``, ``_KM_ITERS``
    synchronous rounds), returning the final assignment (vec_id, cell,
    dist_q).  This is the TRAINING loop emb_ivf_topk's coarse quantizer
    assumes pre-exists — seeds are the first K vectors, each round is
    assign-to-nearest + integer-mean update.

    Exact-integer end to end: embeddings quantize to ``floor(x · 2^20)``
    longs, distances are integer sums of squared diffs (commutative —
    partial-agg order can't change them), centroid updates are
    ``SUM(q) DIV count`` with both engines truncating toward zero, ties on
    equal distance break to the lower cell id.  Empty cells keep their
    previous centroid (same COALESCE rule in the oracle).

    Scale shape: per round ONE broadcast-map assignment pass over the corpus
    (centroid table is K×d ≈ KiB — driver-resident by design, like every
    k-means implementation) and ONE groupBy(cell, dim) mean with map-side
    partials bounded by K·d rows per partition.  No corpus-sized shuffle at
    any round; cost is rounds × one scan.  Cite: the reference has no ANN
    training path at all (its closest analog is the static label layout,
    agf_ingestion_lambda.py:179-248)."""
    e = t(spark, sf_dir, "embeddings")
    # r12: widen a narrower-than-cores scan before the checkpoint so the
    # per-round assignment passes use every core instead of one task
    # (the _ivfpq_codes_from rule — a no-op at real scale where the scan
    # already carries >= cores partitions; integer distances/sums are
    # partition-order-free)
    src = e.select("vec_id", "embedding")
    dp = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < dp:
        src = src.repartition(dp)
    q = src.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * _KM_Q).cast("long")
        ).alias("qv"),
    ).localCheckpoint(eager=True)

    seeds = q.filter(F.col("vec_id") < _KM_K).collect()
    cents = {int(r["vec_id"]): list(r["qv"]) for r in seeds}

    def assign_df():
        # ONE map-only Arrow pass: the K×d centroid matrix rides in the UDF
        # closure (the "broadcast" of a table that is KiB-sized by
        # construction), every vector computes all K integer distances and
        # takes the argmin in-batch — no crossJoin row blowup, no window
        # shuffle, the corpus is never exchanged.  Integer arithmetic is
        # order-free, so numpy vectorization is bit-safe here (the module's
        # integer-distance rule); np.argmin ties break to the FIRST index = lowest
        # cell id because rows are ordered by cell.
        cells = sorted(cents)
        cent_mat = np.array([cents[c] for c in cells], dtype=np.int64)
        cell_arr = np.array(cells, dtype=np.int32)

        def assign_batches(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
                diff = Q[:, None, :] - cent_mat[None, :, :]
                D = (diff * diff).sum(axis=2)
                amin = D.argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "qv": pdf["qv"],
                        "cell": cell_arr[amin],
                        "dist_q": D[np.arange(len(amin)), amin],
                    }
                )

        return q.mapInPandas(
            assign_batches,
            "vec_id bigint, qv array<bigint>, cell int, dist_q bigint",
        )

    for _ in range(_KM_ITERS):
        a = assign_df()
        means = (
            a.select("cell", F.posexplode("qv").alias("i", "qc"))
            .groupBy("cell", "i")
            .agg(F.expr("sum(qc) DIV count(*)").alias("c"))
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault(int(r["cell"]), [0] * len(next(iter(cents.values()))))[
                r["i"]
            ] = int(r["c"])
        for c in cents:  # empty cells keep their previous centroid
            if c not in new:
                new[c] = cents[c]
        cents = new

    return assign_df().select(
        "vec_id", F.col("cell").cast("int").alias("cell"), "dist_q"
    )


def _kmeans_sql() -> str:
    ctes = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, i - 1 AS i, CAST(FLOOR(x * {_KM_Q}) AS BIGINT) AS qv
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
)""",
        f"c0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cell, i, qv AS cv"
        f" FROM q WHERE vec_id < {_KM_K})",
    ]
    for k in range(_KM_ITERS + 1):
        last = k == _KM_ITERS
        ctes.append(
            f"""d{k} AS MATERIALIZED (
  SELECT q.vec_id, c.cell, SUM(CAST((q.qv - c.cv) AS HUGEINT) * (q.qv - c.cv)) AS dist_q
  FROM q JOIN c{k} c ON q.i = c.i
  GROUP BY q.vec_id, c.cell
)""",
        )
        ctes.append(
            f"""a{k} AS MATERIALIZED (
  SELECT vec_id, cell, dist_q FROM (
    SELECT vec_id, cell, dist_q,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist_q ASC, cell ASC) AS rn
    FROM d{k}
  ) WHERE rn = 1
)"""
        )
        if last:
            break
        ctes.append(
            f"""c{k + 1} AS MATERIALIZED (
  SELECT c.cell, c.i,
         COALESCE(m.c, c.cv) AS cv
  FROM c{k} c LEFT JOIN (
    SELECT a.cell, q.i, SUM(q.qv) // COUNT(*) AS c
    FROM a{k} a JOIN q ON a.vec_id = q.vec_id
    GROUP BY a.cell, q.i
  ) m ON m.cell = c.cell AND m.i = c.i
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, CAST(cell AS INT) AS cell, CAST(dist_q AS BIGINT) AS dist_q"
        f" FROM a{_KM_ITERS}"
    )


_KCORE_K = 8
_KCORE_ROUNDS = 4


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_KCORE_ROUNDS`` rounds of k-core peeling (k = ``_KCORE_K``) on
    the undirected link graph (same edge set as ``graph_triangles``):
    each round drops every node whose CURRENT degree is below k and every
    edge touching a dropped node — the standard crawl-graph densest-core
    extraction (spam farms and boilerplate rings survive high-k cores;
    isolated tails peel off first).  Emits the surviving nodes with their
    end-state degree.

    Exact-integer rounds (degrees are counts), so bit-identical to the
    unrolled MATERIALIZED-CTE oracle.  Per-round shape: one explode +
    keyed count for degrees, two semi-joins to restrict the edge set; the
    edge frame is localCheckpointed every round so the plan stays
    round-sized (the module's iterative-operator toolkit rule).
    """
    d = t(spark, sf_dir, "documents").select("doc_id")
    n = d.count()
    ring = d.select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") + 1) % n).alias("dst")
    ).union(d.select(F.col("doc_id"), ((F.col("doc_id") + 2) % n)))
    edges = (
        _synthetic_edges(d, n)
        .union(ring.filter(F.col("src") != F.col("dst")))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("core_degree"))
        .filter(F.col("core_degree") >= _KCORE_K)
    )


def _kcore_sql() -> str:
    ctes = _edges_sql_ctes() + [
        """tedges AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT node AS src, (node + 1) % (SELECT n FROM nn) AS dst FROM nodes
  UNION ALL
  SELECT node AS src, (node + 2) % (SELECT n FROM nn) AS dst FROM nodes
)""",
        """e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM tedges WHERE src <> dst
)""",
    ]
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"""d{r} AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
  ) GROUP BY node
)"""
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {_KCORE_K})"
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT node FROM s{r}) AND v IN (SELECT node FROM s{r})
)"""
        )
        prev = f"e{r}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
) GROUP BY node HAVING COUNT(*) >= {_KCORE_K}
"""
    )


QUERIES: dict[str, QuerySpec] = {
    "graph_kcore": QuerySpec(graph_kcore, _kcore_sql(), ("OP-X-GRAPH", "OP-JOIN-SEMI")),
    "graph_pagerank": QuerySpec(graph_pagerank, _pagerank_sql(), ("OP-X-GRAPH",)),
    "graph_triangles": QuerySpec(
        graph_triangles, _TRIANGLES_SQL, ("OP-X-GRAPH", "OP-JOIN-SEMI", "OP-SORT-LIMIT")
    ),
    "emb_pca_power": QuerySpec(emb_pca_power, _pca_sql(), ("OP-X-PCA", "OP-ARR-SUM")),
    "emb_kmeans_train": QuerySpec(
        emb_kmeans_train, _kmeans_sql(), ("OP-X-KMEANS", "OP-X-SIM-TOPK")
    ),
}
