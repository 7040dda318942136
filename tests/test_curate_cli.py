"""The curate subcommand: quality gate → exact dedup → near-dup reps,
checked against independently-computed per-stage survivor sets."""

from __future__ import annotations

import argparse
import importlib.util
import json
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "agf_pipeline",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts", "agf_pipeline.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)


def test_curate_funnel(spark, tmp_path, capsys):
    out = str(tmp_path / "curated")
    rc = _mod.cmd_curate(argparse.Namespace(docs=SF, out=out))
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.text import (
        docs_dedup_exact,
        docs_dup_clusters,
        docs_quality_gate,
    )

    docs = t(spark, SF, "documents")
    assert report["input"] == docs.count()
    gate_ids = {r.doc_id for r in docs_quality_gate(spark, SF).filter(F.col("keep")).collect()}
    assert report["after_quality_gate"] == len(gate_ids)
    exact_ids = {r.doc_id for r in docs_dedup_exact(spark, SF).collect()}
    rep_ids = {
        r.doc_id
        for r in docs_dup_clusters(spark, SF).filter(F.col("doc_id") == F.col("cluster_id")).collect()
    }
    expected_final = gate_ids & exact_ids & rep_ids
    assert report["after_neardup"] == len(expected_final)

    written = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert written == expected_final
    # the funnel only narrows
    assert (
        report["input"]
        >= report["after_quality_gate"]
        >= report["after_exact_dedup"]
        >= report["after_neardup"]
        > 0
    )
