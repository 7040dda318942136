"""End-to-end batch ingest over the synthetic lake fixtures.

Oracle: an independent plain-Python reimplementation of the reference's
documented semantics (FIXTURES.md), run over the same JSON files.
"""

from __future__ import annotations

import datetime as dt
import glob
import hashlib
import json
import os

from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.ingest import (
    experiments_from_manifests,
    file_inventory_from_experiment_manifests,
    file_inventory_from_run_manifests,
    quarantine_bad_checksums,
    split_valid,
    sync_runs_from_run_manifests,
)
from agf_data_ingestion_spark.sources.manifests import (
    read_experiment_manifests,
    read_run_manifests,
)

NOW = dt.datetime(2024, 6, 1, 0, 0, 0)


def _py_parse_ts(s):
    if not s:
        return NOW
    try:
        t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        return t.replace(tzinfo=None) if t.tzinfo else t
    except ValueError:
        return NOW


def _iter_manifests(root, suffix):
    for p in sorted(glob.glob(os.path.join(root, "raw", "**", suffix), recursive=True)):
        key = os.path.relpath(p, root)
        with open(p) as fh:
            yield key, json.load(fh)


def test_sync_runs_matches_python_oracle(spark, lake):
    root = lake["root"]
    runs = read_run_manifests(spark, root)
    valid, bad = split_valid(runs, required=["computer_name", "files_in_batch"])
    assert bad.count() == 0
    df = sync_runs_from_run_manifests(valid, now=NOW)
    got = {r["run_id"]: r.asDict() for r in df.collect()}
    assert len(got) == lake["n_runs"]

    for key, doc in _iter_manifests(root, "run.json"):
        parts = key.split("/")
        run_id = parts[5]
        row = got[run_id]
        assert row["instrument_id"] == parts[1]
        assert row["computer_name"] == doc["computer_name"]
        assert row["files_count"] == doc["files_in_batch"]
        expected_bytes = doc.get("total_size_bytes")
        if expected_bytes is None:
            expected_bytes = sum(f.get("size", 0) for f in doc.get("file_manifest", []))
        assert row["total_bytes"] == expected_bytes
        assert sorted(row["staff_names"]) == sorted(doc["files_by_staff"].keys())
        assert row["sync_timestamp"] == _py_parse_ts(doc.get("sync_timestamp", ""))
        assert row["date"] == dt.date(int(parts[2]), int(parts[3]), int(parts[4]))
        assert row["s3_key"] == key
        assert row["processing_status"] == "completed"
        assert row["processed_at"] == NOW


def test_file_inventory_from_runs_matches_python_oracle(spark, lake):
    root = lake["root"]
    runs = read_run_manifests(spark, root)
    valid, _ = split_valid(runs, required=["computer_name", "files_in_batch"])
    inv = file_inventory_from_run_manifests(valid, now=NOW)
    ok, bad = quarantine_bad_checksums(inv)
    got = {(r["run_id"], r["file_path"]): r.asDict() for r in ok.collect()}
    n_bad = bad.count()

    expected_bad = 0
    expected = {}
    for key, doc in _iter_manifests(root, "run.json"):
        parts = key.split("/")
        run_id, inst = parts[5], parts[1]
        base = "/".join(key.split("/")[:-1])
        for f in doc.get("file_manifest", []):
            clean = f["checksum"].replace("sha256:", "").strip()
            if len(clean) != 64:
                expected_bad += 1
                continue
            pp = f["path"].split("/")
            staff = f.get("staff_name", pp[0])
            if len(pp) >= 2 and pp[1] != pp[-1]:
                exp_id = f"{pp[1]}_{staff}"
            else:
                exp_id = f"standalone_{staff}_{run_id}"
            if len(pp) > 1:
                s3_path = f"{pp[0]}/payload/{'/'.join(pp[1:])}"
            else:
                s3_path = f"{pp[0]}/payload/{f['path'].split('/')[-1]}"
            name = f["path"].split("/")[-1]
            expected[(run_id, f["path"])] = {
                "experiment_id": exp_id,
                "file_name": name,
                "s3_key": f"{base}/{s3_path}",
                "file_size_bytes": f["size"],
                "file_type": name.split(".")[-1].lower() if "." in name else "unknown",
                "checksum_sha256": clean.lower(),
                "modified_at": _py_parse_ts(f.get("file_date", "")),
                "staff_name": staff,
                "instrument_id": inst,
                "is_update": f.get("is_update", False),
            }

    assert n_bad == expected_bad
    assert set(got) == set(expected)
    for k, exp_row in expected.items():
        for col, v in exp_row.items():
            assert got[k][col] == v, (k, col, got[k][col], v)


def test_experiments_and_exp_files(spark, lake):
    root = lake["root"]
    exps = read_experiment_manifests(spark, root)
    valid, bad = split_valid(exps, required=["experiment_id", "experiment_folder"])
    assert bad.count() == 0
    edf = experiments_from_manifests(valid, now=NOW)
    rows = {(r["experiment_id"], r["s3_experiment_json_key"]): r.asDict() for r in edf.collect()}
    assert len(rows) == lake["n_exps"]

    fdf = file_inventory_from_experiment_manifests(valid, now=NOW)
    ok, _ = quarantine_bad_checksums(fdf)
    finv = {(r["s3_key"]): r.asDict() for r in ok.collect()}

    for key, doc in _iter_manifests(root, "experiment.json"):
        row = rows[(doc["experiment_id"], key)]
        assert row["update_count"] == doc.get("update_count", 1)
        assert row["auto_detected"] is doc.get("auto_detected", True)
        assert row["sync_version"] == doc.get("sync_version", "1.0")
        assert row["total_bytes"] == doc["total_size_bytes"]
        assert row["last_updated"] == _py_parse_ts(doc.get("last_updated", ""))
        params = doc.get("parameters")
        assert row["parameters"] == params
        base = "/".join(key.split("/")[:-1])
        for f in doc.get("files", []):
            clean = f["checksum"].replace("sha256:", "").strip()
            if len(clean) != 64:
                continue
            r = finv[f"{base}/{f['relative_path']}"]
            assert r["experiment_id"] == doc["experiment_id"]
            assert r["file_name"] == f["name"]
            assert r["file_size_bytes"] == f["size"]
            assert r["run_id"] == "from_experiment_json"
            assert r["modified_at"] == _py_parse_ts(f.get("modified", ""))


def test_regex_metachar_lake_root_strips_keys_cleanly(spark, tmp_path):
    """A lake root containing regex metacharacters must still yield clean
    bucket-relative s3_keys (root is stripped by length, not regexp —
    ADVICE r1)."""
    from fixtures.generate import generate

    root = str(tmp_path / "lake+v2 (prod)")
    generate(root, instruments=1, days=1, runs_per_day=1)
    runs = read_run_manifests(spark, root)
    keys = [r["s3_key"] for r in runs.select("s3_key").collect()]
    assert keys
    for k in keys:
        assert k.startswith("raw/"), k
        assert "(" not in k.split("raw/", 1)[0]


def test_regex_metachar_root_in_storage_listing(spark, tmp_path):
    from agf_data_ingestion_spark.operators.reconcile import list_storage_keys
    from fixtures.generate import generate

    root = str(tmp_path / "lake+v2 (prod)")
    generate(root, instruments=1, days=1, runs_per_day=1)
    keys = [r["key"] for r in list_storage_keys(spark, root).collect()]
    assert keys
    for k in keys:
        assert k.startswith("raw/"), k


def test_invalid_rows_quarantined_not_fatal(spark, tmp_path):
    """Corrupt JSON, bad path, and missing required fields are isolated
    (OP-STRM-ERR / OP-SINK-DLQ) — the batch never fails."""
    bad_dir = tmp_path / "raw" / "instX" / "2024" / "xx" / "01" / "r9"
    bad_dir.mkdir(parents=True)
    (bad_dir / "run.json").write_text('{"computer_name": "PC", "files_in_batch": 1}')
    ok_dir = tmp_path / "raw" / "instX" / "2024" / "03" / "01" / "r1"
    ok_dir.mkdir(parents=True)
    (ok_dir / "run.json").write_text('{"computer_name": "PC", "files_in_batch": 2}')
    corrupt_dir = tmp_path / "raw" / "instX" / "2024" / "03" / "02" / "r2"
    corrupt_dir.mkdir(parents=True)
    (corrupt_dir / "run.json").write_text("{not json at all")
    missing_dir = tmp_path / "raw" / "instX" / "2024" / "03" / "03" / "r3"
    missing_dir.mkdir(parents=True)
    (missing_dir / "run.json").write_text('{"files_in_batch": 3}')

    runs = read_run_manifests(spark, str(tmp_path))
    valid, bad = split_valid(runs, required=["computer_name", "files_in_batch"])
    assert valid.count() == 1
    assert bad.count() == 3
    out = sync_runs_from_run_manifests(valid, now=NOW).collect()
    assert out[0]["run_id"] == "r1"
