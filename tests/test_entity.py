"""Entity resolution (plans/entity.py, OP-X-ENTITY): planted-truth
recovery, blocking candidate bounds (never all-pairs), and cluster
structure.  Corpus-level bit-identity vs DuckDB is pinned by the oracle
gate (scripts/check_oracle.py) at all three scale factors."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.entity import (
    _registry,
    customers_entity_resolution,
)

SF = "/root/testdata/sf0.001"


def test_truth_recovery_and_cluster_shape(spark):
    out = customers_entity_resolution(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/customer.parquet").count()
    )
    # every customer contributes a clean record; md5-selected subsets add
    # variants, so 1x < rows < 3x
    assert n_cust < len(out) < 3 * n_cust

    # the planted truth is fully recovered: every record resolves to its
    # own customer's clean rec_id
    assert all(r.resolved_correctly for r in out)
    assert all(r.entity_id == r.truth_key * 4 for r in out)

    # entities are the planted {clean[, deletion][, insertion]} sets
    by_entity = {}
    for r in out:
        by_entity.setdefault(r.entity_id, []).append(r)
    assert set(len(v) for v in by_entity.values()) <= {1, 2, 3}
    assert len(by_entity) == n_cust
    for members in by_entity.values():
        assert len(members) == members[0].entity_size
        # the clean record (rec_id % 4 == 0) anchors every entity
        assert any(m.rec_id % 4 == 0 for m in members)


def test_variants_are_single_edits(spark):
    """The derived dirty registry is what the docstring claims: deletion
    variants are one char shorter, insertion variants one char longer,
    both within levenshtein 1 of the clean name."""
    recs = _registry(spark, SF)
    clean = recs.filter(F.col("rec_id") % 4 == 0).select(
        "ck", F.col("name").alias("clean_name")
    )
    variants = recs.filter(F.col("rec_id") % 4 != 0).join(clean, "ck")
    rows = variants.select(
        "rec_id",
        (F.length("name") - F.length("clean_name")).alias("dlen"),
        F.levenshtein("name", "clean_name").alias("lev"),
    ).collect()
    assert rows, "md5 selection produced no variants"
    for r in rows:
        assert r.dlen == (-1 if r.rec_id % 4 == 1 else 1)
        assert r.lev <= 1  # lev 0 possible: deleting from/inserting into
        # a run of equal chars reproduces a one-edit-neutral string


def test_blocking_is_not_all_pairs(spark):
    """Deletion-neighborhood blocking emits O(n · name_len) keys and the
    verified edge set stays linear in the registry — nowhere near the
    all-pairs n²/2."""
    recs = _registry(spark, SF)
    n = recs.count()
    out = customers_entity_resolution(spark, SF)
    # verified edges per record ≤ 2 planted + a handful of cross-serial
    # survivors; entity sizes ≤ 3 bounds the transitive closure directly
    max_size = out.agg(F.max("entity_size")).collect()[0][0]
    assert max_size <= 3
    assert out.count() == n


def test_hot_block_candidates_bounded(spark):
    """VERDICT r5 finding #1: a mass-duplicate registry ("john smith" ×
    5k) must NOT make the candidate join quadratic.  The rank cap bounds
    a B-member block at ≤ B·cap pairs; adjacent ranks keep the block
    connected (one component end to end)."""
    from agf_data_ingestion_spark.plans.entity import _ER_BLOCK_CAP, _er_candidates

    n = 5000
    recs = spark.range(n).select(
        F.col("id").alias("rec_id"), F.lit("john smith").alias("name")
    )
    cand = _er_candidates(recs)
    got = cand.count()
    # every record shares every key: uncapped would be n*(n-1)/2 ≈ 12.5M
    assert got == (n - _ER_BLOCK_CAP) * _ER_BLOCK_CAP + _ER_BLOCK_CAP * (
        _ER_BLOCK_CAP - 1
    ) // 2
    assert got < n * _ER_BLOCK_CAP  # the O(n·cap) bound
    # adjacent ranks connect the block: rank-neighbor pairs all present
    adj = cand.filter(F.col("rb") - F.col("ra") == 1).count()
    assert adj == n - 1


def test_honest_blocks_keep_full_clique(spark):
    """Blocks at or under cap+1 members are untouched by the guard."""
    from agf_data_ingestion_spark.plans.entity import _ER_BLOCK_CAP, _er_candidates

    m = _ER_BLOCK_CAP + 1
    recs = spark.range(m).select(
        F.col("id").alias("rec_id"), F.lit("jane doe").alias("name")
    )
    assert _er_candidates(recs).count() == m * (m - 1) // 2
