"""Release-to-release diff (operators/curation.py `release_diff`, r10 —
VERDICT r9 ask #7): the release-notes artifact between two published txn
ids.  Pins: an incremental append shows up as per-source `added` rows
and exact composition/token/total deltas; a forget shows up (against
CURRENT state — eq-delete commits carry no txn marker) as `removed`
rows; funnel deltas carry the batch's stage counts; a release diffed
against itself is all-zero.  The catalog twin `docs_release_diff`
(plans/training_data.py) is oracle-hash-checked by the driver gate."""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.curation import (
    _DOC_COLS,
    curate_full,
    curate_incremental,
    pick_cut_tile,
    release_diff,
    release_forget,
    stage_decontam,
    stage_exact_dedup,
    stage_neardup,
    stage_quality_cut,
    stage_rule_gate,
)
from agf_data_ingestion_spark.sources.snapshots import snapshot_read
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("diff_rel"))
    rel = curate_full(spark, SF_SMOKE, out, budget_tokens=2000, seed="0")

    # a batch of docs that provably pass every frozen gate: WFQ-cut
    # survivors re-labeled with fresh ids (the incremental-test recipe)
    from agf_data_ingestion_spark.plans.base import t

    docs = t(spark, SF_SMOKE, "documents")
    docs = stage_rule_gate(spark, SF_SMOKE, docs)
    docs = stage_exact_dedup(docs)
    docs = stage_neardup(spark, SF_SMOKE, docs)
    docs = stage_decontam(spark, SF_SMOKE, docs)
    cut = pick_cut_tile(spark, SF_SMOKE)
    survivors, _ = stage_quality_cut(spark, SF_SMOKE, docs, cut)
    survivors = {r["doc_id"]: r for r in survivors.collect()}
    published = {
        r["doc_id"]: r
        for r in snapshot_read(spark, rel["tables"]["shards"])
        .select(*_DOC_COLS)
        .collect()
    }
    good = sorted(
        (v for k, v in survivors.items() if k not in published),
        key=lambda r: r["doc_id"],
    )[:6]
    assert good, "need WFQ-cut survivors for the append batch"
    rows = [
        (1_000_000 + i, g["text"], g["lang"], g["source"], len(g["text"]))
        for i, g in enumerate(good)
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    inc = curate_incremental(
        spark, batch, out, batch_label="d1", seed="0", budget_tokens=2000
    )
    return {
        "out": out,
        "rel": rel,
        "inc": inc,
        "published": published,
        "batch_sources": Counter(r[3] for r in rows),
    }


def _by_key(rows):
    return {(r["section"], r["key"]): (r["a"], r["b"], r["delta"]) for r in rows}


def test_self_diff_is_zero(spark, setup):
    rows = release_diff(
        spark, setup["out"], setup["rel"]["txn"]["id"], setup["rel"]["txn"]["id"]
    ).collect()
    assert rows
    assert all(r["delta"] == 0 and r["a"] == r["b"] for r in rows)
    sections = {r["section"] for r in rows}
    assert {"composition", "tokens", "lang", "policy", "funnel", "total"} <= sections
    # self-diff has no churn rows at all
    assert not sections & {"added", "removed"}


def test_append_diff(spark, setup):
    d = _by_key(
        release_diff(
            spark, setup["out"], setup["rel"]["txn"]["id"], setup["inc"]["txn"]["id"]
        ).collect()
    )
    appended = {
        r["doc_id"]: r["source"]
        for r in snapshot_read(spark, setup["rel"]["tables"]["shards"])
        .select("doc_id", "source")
        .collect()
        if r["doc_id"] >= 1_000_000
    }
    n_new = len(appended)
    assert n_new > 0
    # totals move by exactly the appended docs
    a, b, delta = d[("total", "docs")]
    assert a == len(setup["published"]) and delta == n_new and b == a + n_new
    # per-source churn: added rows match the appended docs, none removed
    added = {k: v for (s, k), v in d.items() if s == "added"}
    assert {k: v[1] for k, v in added.items()} == dict(Counter(appended.values()))
    assert not any(s == "removed" for s, _ in d)
    # the batch funnel landed in the diff (absent at txn_a -> a = 0)
    fk = [
        (s, k) for (s, k) in d if s == "funnel" and k.startswith("funnel_inc:d1")
    ]
    assert fk and all(d[x][0] == 0 and d[x][1] >= 0 for x in fk)
    # frozen policy: row counts identical across the txns
    assert all(v[2] == 0 for (s, _), v in d.items() if s == "policy")


def test_forget_diff_against_current(spark, setup):
    victims = sorted(setup["published"])[:3]
    vic_src = Counter(setup["published"][v]["source"] for v in victims)
    rep = release_forget(spark, setup["out"], victims)
    assert rep["found"] == len(victims)
    d = _by_key(
        release_diff(spark, setup["out"], setup["inc"]["txn"]["id"], None).collect()
    )
    removed = {k: v for (s, k), v in d.items() if s == "removed"}
    assert {k: v[0] for k, v in removed.items()} == dict(vic_src)
    assert d[("total", "docs")][2] == -len(victims)
    assert not any(s == "added" for s, _ in d)


def test_diff_cli(spark, setup, capsys):
    spec = importlib.util.spec_from_file_location(
        "agf_pipeline",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "agf_pipeline.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.cmd_curate(
        argparse.Namespace(
            out=setup["out"],
            diff_releases=[setup["rel"]["txn"]["id"], "current"],
        )
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["section"] for r in rows} >= {"composition", "total"}
    got = {(r["section"], r["key"]): r["delta"] for r in rows}
    want = {
        (r["section"], r["key"]): r["delta"]
        for r in release_diff(
            spark, setup["out"], setup["rel"]["txn"]["id"], None
        ).collect()
    }
    assert got == want
