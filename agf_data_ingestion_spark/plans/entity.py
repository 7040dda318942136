"""Entity resolution / record linkage (OP-X-ENTITY): resolve a dirty
customer registry back to canonical entities with deletion-neighborhood
blocking, attribute-conjunct verification, and bounded-diameter
min-label components.

The reference system has no entity-resolution surface (its dedup is
key-exact — ``agf_ingestion_lambda.py`` synthesizes keys and upserts);
this is part of the 100 TB training/curation extension: the same
blocking→verify→cluster shape that deduplicates user records, author
strings, or metadata entities in a web-scale corpus.

The dirty registry is DERIVED deterministically inside the query (the
planted-corpus pattern): every customer contributes its clean record,
an md5-selected ~half contribute a one-character DELETION variant, and
an md5-selected ~third an one-character INSERTION variant — positions
and inserted characters are md5-derived, so both engines build the
bit-identical registry and the query is self-evaluating
(``resolved_correctly`` compares the recovered entity id to the planted
truth).

Blocking is the symmetric-delete (SymSpell-style) depth-1 neighborhood:
each record emits its name plus every one-char-deleted form as block
keys; two records within one edit share a key by construction (an
insertion's parent is in the child's deletion set), so candidate
generation is an equi-join on the key — never an all-pairs scan.  Keys
per record = len+1, so the blocking table is O(corpus × name-length)
and the join is hash-partitioned on the key (``shuffle_hash``-pinned:
registry-sized sides are never broadcast).  Oversized blocks are
rank-capped (``_ER_BLOCK_CAP``, r6): mass-duplicate names cannot make
the candidate join quadratic — see the constant's docstring.
Verification is the usual
ER conjunct — name edit distance ≤ 2 AND exact agreement on the stable
attributes (nation, balance, segment) — which rejects the
adjacent-serial-number false candidates blocking necessarily admits
(TPC-H-ish names differ by one digit).  Clusters are stars around the
clean record (variant↔variant pairs never share a depth-1 key — their
lengths differ by 2), so TWO unrolled min-label rounds converge
exactly; both engines run the same two rounds, so results stay
bit-identical even for a hypothetical deeper component (the
star-contraction operator in operators/components.py is the
general-depth tool).

Cross-engine notes (CLAUDE.md toolkit): md5-derived buckets only;
``DIV``/``//`` truncation parity; levenshtein over ASCII-stripped text
(Spark counts codepoints, DuckDB bytes); the post-explode DISTINCT on
block keys (zero-runs in names make many deletions coincide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t

#: levenshtein acceptance bound for the verify conjunct (≥2 admits both
#: planted edit types; the attribute conjunct carries the precision)
_ER_MAX_EDIT = 2
#: insertion alphabet (md5-indexed)
_ER_ALPHA = "abcdefghij"
#: hot-block guard (VERDICT r5 finding #1): a real dirty registry carries
#: mass duplicates ("john smith" × 50k) — one block key whose candidate
#: join is quadratic.  Same rule as the LSH ``_LSH_BUCKET_CAP``: block
#: members are row_number-ranked by rec_id ON THE SAME key the join
#: shuffles on (no extra exchange) and a pair is admitted only when the
#: ranks are within the cap, so a B-member block emits ≤ B·cap pairs
#: (not B²/2) while adjacent ranks keep the block CONNECTED for
#: clustering.  Honest blocks (≤ cap+1 members) still emit their full
#: clique — the planted TPC-H-style blocks are far under it at every sf,
#: so the catalog oracle is unchanged; the identical row_number rule runs
#: in the DuckDB twin so results stay bit-identical at ANY block size
#: (tests/test_entity.py plants a 5k same-name registry to pin the
#: O(n·cap) candidate bound).
_ER_BLOCK_CAP = 32


def _registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic dirty registry: rec_id = ck*4 + {0 clean,
    1 deletion, 2 insertion}; md5('er:'||ck) drives which variants exist
    and where they edit."""
    c = t(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").alias("ck"),
        F.regexp_replace(F.col("c_name"), "[^ -~]", "").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_acctbal").alias("acct"),
        F.col("c_mktsegment").alias("seg"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("er:"), F.col("c_custkey").cast("string"))),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("b"),
    )
    v0 = base.select(
        (F.col("ck") * 4).alias("rec_id"), "ck", "name", "nat", "acct", "seg"
    )
    v1 = (
        base.filter(F.col("b") % 2 == 0)
        .withColumn("p", F.expr("(b DIV 2) % length(name) + 1"))
        .select(
            (F.col("ck") * 4 + 1).alias("rec_id"),
            "ck",
            F.expr(
                "concat(substring(name, 1, p - 1),"
                " substring(name, p + 1, length(name)))"
            ).alias("name"),
            "nat",
            "acct",
            "seg",
        )
    )
    v2 = (
        base.filter(F.col("b") % 3 == 0)
        .withColumn("q", F.expr("(b DIV 6) % (length(name) + 1) + 1"))
        .withColumn(
            "ins", F.expr(f"substring('{_ER_ALPHA}', (b DIV 60) % 10 + 1, 1)")
        )
        .select(
            (F.col("ck") * 4 + 2).alias("rec_id"),
            "ck",
            F.expr(
                "concat(substring(name, 1, q - 1), ins,"
                " substring(name, q, length(name)))"
            ).alias("name"),
            "nat",
            "acct",
            "seg",
        )
    )
    return v0.unionByName(v1).unionByName(v2)


def _er_candidates(recs: DataFrame) -> DataFrame:
    """Blocking → capped candidate pairs (ra < rb) over any (rec_id, name)
    frame: depth-1 deletion-neighborhood keys, equi-join on the key with
    the ``_ER_BLOCK_CAP`` rank guard — a mass-duplicate block emits
    O(B·cap) pairs, never B²/2.  Factored out so the skew pytest can pin
    the bound on a planted hot-block registry."""
    # depth-1 deletion neighborhood as block keys; i=0 keeps the name
    # itself.  DISTINCT after the explode (zero-runs make deletions
    # coincide; post-explode distinct is the exchange-cheap form).
    keys = (
        recs.select(
            "rec_id",
            "name",
            F.explode(F.sequence(F.lit(0), F.length("name"))).alias("i"),
        )
        .select(
            "rec_id",
            F.expr(
                "CASE WHEN i = 0 THEN name"
                " ELSE concat(substring(name, 1, i - 1),"
                "             substring(name, i + 1, length(name))) END"
            ).alias("k"),
        )
        .distinct()
    )
    # rank on the SAME key the join shuffles on: the guard adds no exchange
    wk = Window.partitionBy("k").orderBy("rec_id")
    keys = keys.withColumn("rk", F.row_number().over(wk))
    ka = keys.select(F.col("rec_id").alias("ra"), "k", F.col("rk").alias("rka"))
    kb = keys.select(
        F.col("rec_id").alias("rb"), F.col("k").alias("kb"), F.col("rk").alias("rkb")
    )
    return (
        ka.join(
            kb.hint("shuffle_hash"),
            (F.col("k") == F.col("kb"))
            & (F.col("ra") < F.col("rb"))
            & (F.col("rkb") - F.col("rka") <= _ER_BLOCK_CAP),
        )
        .select("ra", "rb")
        .distinct()
    )


def customers_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the registry, verified-edge, and label frames are all NARROW
    # (id/name-width rows) and multiply consumed — cache() them so the
    # blocking→verify chain runs once instead of once per downstream
    # branch (the CLAUDE.md narrow-frame rule; measured 5.6 → 3.2 s
    # fresh / 1.0 s warm at sf0.1).  No corpus-sized ARRAY columns are
    # cached here.
    recs = _registry(spark, sf_dir).cache()
    cand = _er_candidates(recs)

    attrs = recs.select("rec_id", "name", "nat", "acct", "seg")
    xa = attrs.select(*[F.col(c).alias(f"{c}_a") for c in attrs.columns])
    xb = attrs.select(*[F.col(c).alias(f"{c}_b") for c in attrs.columns])
    ver = (
        cand.join(xa.hint("shuffle_hash"), F.col("ra") == F.col("rec_id_a"))
        .join(xb.hint("shuffle_hash"), F.col("rb") == F.col("rec_id_b"))
        .filter(
            (F.levenshtein("name_a", "name_b") <= _ER_MAX_EDIT)
            & (F.col("nat_a") == F.col("nat_b"))
            & (F.col("acct_a") == F.col("acct_b"))
            & (F.col("seg_a") == F.col("seg_b"))
        )
        .select("ra", "rb")
        .cache()
    )

    # two unrolled min-label rounds (components are stars: diameter ≤ 2)
    nbr = ver.select(F.col("ra").alias("rec_id"), F.col("rb").alias("n")).union(
        ver.select(F.col("rb").alias("rec_id"), F.col("ra").alias("n"))
    )
    ids = recs.select("rec_id", "ck", "name")
    m1 = (
        ids.select("rec_id")
        .join(nbr, "rec_id", "left")
        .groupBy("rec_id")
        .agg(F.least(F.first("rec_id"), F.coalesce(F.min("n"), F.first("rec_id"))).alias("m"))
    )
    nbr_m = nbr.join(
        m1.select(F.col("rec_id").alias("n"), F.col("m").alias("nm")), "n"
    ).select("rec_id", "nm")
    m2 = (
        m1.join(nbr_m, "rec_id", "left")
        .groupBy("rec_id")
        .agg(F.least(F.first("m"), F.coalesce(F.min("nm"), F.first("m"))).alias("entity_id"))
        .cache()
    )
    sizes = m2.groupBy("entity_id").agg(F.count("*").alias("entity_size"))
    return (
        ids.join(m2, "rec_id")
        .join(sizes, "entity_id")
        .select(
            "rec_id",
            F.col("ck").alias("truth_key"),
            "name",
            "entity_id",
            "entity_size",
            (F.col("entity_id") == F.col("ck") * 4).alias("resolved_correctly"),
        )
    )


_ER_SQL = f"""
WITH base AS (
  SELECT c_custkey AS ck,
         regexp_replace(c_name, '[^ -~]', '', 'g') AS name,
         c_nationkey AS nat, c_acctbal AS acct, c_mktsegment AS seg,
         ('0x' || substr(md5('er:' || CAST(c_custkey AS VARCHAR)), 1, 10))::BIGINT AS b
  FROM customer
),
recs AS (
  SELECT ck * 4 AS rec_id, ck, name, nat, acct, seg FROM base
  UNION ALL
  SELECT ck * 4 + 1, ck,
         substr(name, 1, p - 1) || substr(name, p + 1, length(name)),
         nat, acct, seg
  FROM (SELECT *, (b // 2) % length(name) + 1 AS p FROM base WHERE b % 2 = 0)
  UNION ALL
  SELECT ck * 4 + 2, ck,
         substr(name, 1, q - 1)
           || substr('{_ER_ALPHA}', (b // 60) % 10 + 1, 1)
           || substr(name, q, length(name)),
         nat, acct, seg
  FROM (SELECT *, (b // 6) % (length(name) + 1) + 1 AS q FROM base WHERE b % 3 = 0)
),
keys AS (
  SELECT DISTINCT rec_id,
         CASE WHEN i = 0 THEN name
              ELSE substr(name, 1, i - 1) || substr(name, i + 1, length(name)) END AS k
  FROM (SELECT rec_id, name, UNNEST(range(0, length(name) + 1)) AS i FROM recs)
),
krk AS (
  SELECT rec_id, k,
         row_number() OVER (PARTITION BY k ORDER BY rec_id) AS rk
  FROM keys
),
cand AS (
  SELECT DISTINCT a.rec_id AS ra, b.rec_id AS rb
  FROM krk a JOIN krk b
    ON a.k = b.k AND a.rec_id < b.rec_id AND b.rk - a.rk <= {_ER_BLOCK_CAP}
),
ver AS (
  SELECT c.ra, c.rb
  FROM cand c
  JOIN recs x ON c.ra = x.rec_id
  JOIN recs y ON c.rb = y.rec_id
  WHERE levenshtein(x.name, y.name) <= {_ER_MAX_EDIT}
    AND x.nat = y.nat AND x.acct = y.acct AND x.seg = y.seg
),
nbr AS (SELECT ra AS rec_id, rb AS n FROM ver UNION ALL SELECT rb, ra FROM ver),
m1 AS (
  SELECT r.rec_id, least(r.rec_id, coalesce(min(n.n), r.rec_id)) AS m
  FROM recs r LEFT JOIN nbr n ON r.rec_id = n.rec_id
  GROUP BY r.rec_id
),
m2 AS (
  SELECT s.rec_id,
         least(s.m, coalesce(min(t.m), s.m)) AS entity_id
  FROM m1 s
  LEFT JOIN nbr n ON s.rec_id = n.rec_id
  LEFT JOIN m1 t ON n.n = t.rec_id
  GROUP BY s.rec_id, s.m
),
sizes AS (SELECT entity_id, COUNT(*) AS entity_size FROM m2 GROUP BY entity_id)
SELECT r.rec_id, r.ck AS truth_key, r.name, m2.entity_id, sizes.entity_size,
       (m2.entity_id = r.ck * 4) AS resolved_correctly
FROM recs r
JOIN m2 ON r.rec_id = m2.rec_id
JOIN sizes ON m2.entity_id = sizes.entity_id
"""


QUERIES: dict[str, QuerySpec] = {
    "customers_entity_resolution": QuerySpec(
        customers_entity_resolution, _ER_SQL, ("OP-X-ENTITY",)
    ),
}
