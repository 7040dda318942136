"""Local replica of the driver's correctness gate (verify surface 2).

Runs a representative subset of ``__spark_entry__.queries()`` against their
``oracle_sql()`` twins via DuckDB at sf0.001 (full catalog parity is run by
``scripts/check_oracle.py`` at sf0.01; this test keeps the suite fast while
guarding the contract wiring and the determinism toolkit end-to-end).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q13_custdist",
    "q21_sole_blame_supplier",
    "events_latest_per_user",
    "customers_without_orders",
    "docs_dedup_exact",
    "docs_minhash_lsh",
    "emb_cosine_topk",
    # round-2 additions: sketches, behavior analytics, chunking, mix weights
    "events_kmv_distinct",
    "events_kmv_merged",
    "events_funnel_stages",
    "events_retention_cohorts",
    "events_alarm_transitions",
    "docs_chunked",
    "docs_mix_weights",
    "events_quantile_sketch",
    "docs_bm25_search",
    "events_daily_full_outer",
    # round-5: iterative BPE tokenizer training (vocab-level rounds)
    "docs_bpe_train",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype == "float64":
            out[c] = col.map(lambda v: repr(float(v)) if pd.notna(v) else "NULL")
        else:
            out[c] = col.map(
                lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)
            )
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_every_query_has_callable():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # the vast majority must carry a SQL oracle (rows-only is the exception)
    assert len(oracles) >= len(qs) - 3


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(sdf) == len(ddf)
    assert sorted(sdf.columns) == sorted(ddf.columns)
    pd.testing.assert_frame_equal(_canon(sdf), _canon(ddf))


def test_oracles_contain_no_nondeterministic_constructs():
    """Static lint: every oracle must avoid engine-varying functions —
    rand/now/current_*/ln/exp and engine hash() (md5 is the only
    sanctioned hash; see plans/base.py determinism rules)."""
    import re

    from agf_data_ingestion_spark.plans import QUERIES

    banned = re.compile(
        r"\b(rand|random|now|current_timestamp|current_date|ln|exp|log|log2|log10|hash)\s*\(",
        re.IGNORECASE,
    )
    for name, spec in QUERIES.items():
        if spec.oracle:
            m = banned.search(spec.oracle)
            assert m is None, (name, m.group(0))


def test_canon_compare_is_order_insensitive_and_ulp_strict():
    """Harness sanity: the driver-replica comparator must ignore row order
    and column order but catch a SINGLE-ULP float drift — the strictness
    the whole determinism toolkit is built against."""
    import importlib.util
    import math
    import os

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "check_oracle.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    a = pd.DataFrame({"x": [1.0, 2.0, 3.5], "k": [1, 2, 3]})
    shuffled = a.iloc[::-1].reset_index(drop=True)[["k", "x"]]
    assert mod._canon(a).equals(mod._canon(shuffled))

    drift = a.copy()
    drift.loc[1, "x"] = math.nextafter(2.0, 3.0)  # one ulp
    assert not mod._canon(a).equals(mod._canon(drift))

    nulled = a.copy().astype({"x": "float64"})
    nulled.loc[2, "x"] = float("nan")
    assert not mod._canon(a).equals(mod._canon(nulled))


def test_catalog_integrity_and_priority_names():
    """Every QuerySpec is well-formed, and every name in the witness-window
    priority list actually exists in the catalog — a typo there would
    SILENTLY drop a query from the driver's ~50-row CORRECTNESS sample
    (the setdefault fallback hides it)."""
    import agf_data_ingestion_spark.plans as plans

    for name, spec in plans.QUERIES.items():
        assert callable(spec.fn), name
        assert spec.oracle is None or isinstance(spec.oracle, str), name
        assert spec.ops and all(op.startswith("OP-") for op in spec.ops), name
    missing = [n for n in plans._PRIORITY if n not in plans.QUERIES]
    assert not missing, f"priority names not in catalog: {missing}"
    # the driver samples ~50 rows: every query that still NEEDS driver
    # certification (new this round, plan changed this round, or added
    # late last round and never witnessed) must sit inside the window;
    # long-green tail entries rotate out (they were all driver-certified
    # in r6's CORRECTNESS window and stay local-replica-covered)
    order = list(plans.QUERIES)
    must_certify = [
        # r7 additions
        "docs_quality_train", "docs_quality_apply",
        "docs_domain_reweight", "docs_source_overlap",
        # r7 plan changes — re-certify
        "docs_url_curation", "docs_langid_apply",
        # late-r6 additions the r6 window never recorded
        "docs_decontam_spans",
        # r6 additions first witnessed in r6 — keep one more round
        "docs_langid_train", "docs_pii_redaction",
        "customers_entity_resolution",
    ]
    late = {n: order.index(n) for n in must_certify if order.index(n) >= 50}
    assert not late, f"queries outside the driver witness window: {late}"
