"""KMV distinct-count sketch: estimator accuracy + merge property.

Oracle parity (bit-identity vs DuckDB) is covered in test_entry_oracle.py;
these tests assert the *statistical* contract — the estimate is actually
close to the truth, and merging per-group sketches loses nothing — which a
value-hash check alone cannot express.
"""

from __future__ import annotations

import pytest

from agf_data_ingestion_spark.plans.sketches import (
    _K,
    events_kmv_distinct,
    events_kmv_merged,
)

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_estimate_within_error_bound(spark):
    rows = events_kmv_distinct(spark, SF_DIR).collect()
    assert rows, "sketch produced no groups"
    for r in rows:
        if r.n_kept < _K:
            # below k the sketch is exhaustive: estimate must be exact
            assert r.est_users == pytest.approx(float(r.exact_users))
            assert r.n_kept == r.exact_users
        else:
            # KMV standard error is ~1/sqrt(k); allow 4 sigma
            rel_err = abs(r.est_users - r.exact_users) / r.exact_users
            assert rel_err < 4.0 / (_K**0.5), (r.event_type, r.est_users, r.exact_users)


def test_kmv_merged_matches_direct_global_sketch(spark):
    """k-min over the union of per-type sketches must equal the k-min the
    sketch would produce over the raw stream — the merge property that
    makes KMV tree-reducible at scale."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.sketches import _HASH_HEX, _k_min, _user_hashes

    merged = events_kmv_merged(spark, SF_DIR).collect()[0]

    e = t(spark, SF_DIR, "events")
    direct_hashes = (
        e.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, _HASH_HEX), 16, 10
            )
            .cast("long")
            .alias("h")
        )
        .distinct()
        .withColumn("g", F.lit(1))
    )
    direct = (
        _k_min(direct_hashes, ["g"])
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
        .collect()[0]
    )
    assert merged.n_kept == direct.n_kept
    assert merged.kth_hash == direct.kth_hash


def test_kmv_setops_estimates_track_exact(spark):
    """Intersection/Jaccard estimates from merged sketches must stay within
    KMV error (~1/sqrt(k) per sketch, compounded by the ratio estimator) of
    the exact values — and be exact when the union fits inside k."""
    from tests.conftest import SF_SMOKE

    from agf_data_ingestion_spark.plans.sketches import events_kmv_setops

    df = events_kmv_setops(spark, SF_SMOKE).toPandas()
    assert len(df) == 10  # C(5,2) event-type pairs
    for r in df.itertuples():
        assert r.est_union > 0 and 0.0 <= r.est_jaccard <= 1.0
        if r.n_kept < 64:  # union fit in the sketch: estimator is exact
            assert r.est_inter == r.exact_inter
        else:  # generous 3-sigma-ish bound for k=64 ratio estimators
            assert abs(r.est_inter - r.exact_inter) / max(r.exact_inter, 1) < 0.75
