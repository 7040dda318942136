#!/usr/bin/env python
"""Per-trigger Spark-job census for curate_incremental (VERDICT r12 ask
#5): enumerate every Spark job a single incremental trigger runs, with
description and duration, via the local UI REST API — the evidence line
for the gates_and_probes job-floor work.

Protocol: bench warmup, one curate_full publish (builds the release the
trigger probes), then N curate_incremental triggers; for each trigger,
the jobs whose jobId is new since the trigger started are listed.

Usage: python scripts/r13_trigger_jobs.py [triggers]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return json.load(r)


def main() -> None:
    triggers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.curation import (
        curate_full,
        curate_incremental,
    )
    from agf_data_ingestion_spark.plans import QUERIES
    from agf_data_ingestion_spark.session import get_spark

    # the session factory disables the UI; the job census needs its REST API
    spark = get_spark(
        "agf-r13-trigger-jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s, "long")
    spark.range(1000).select(_warm(col("id"))).localCheckpoint(eager=True).count()

    pipe_dir = tempfile.mkdtemp(prefix="agf_r13_trigger_")
    rep = curate_full(spark, sf_dir, pipe_dir, budget_tokens=4000)
    print(
        json.dumps({"curate_full_wall_s": rep["wall_s"], "stages": rep["stages"]}),
        flush=True,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for ti in range(triggers):
        batch = docs.filter(F.col("doc_id") < 500).withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000_000 + ti * 1_000_000)
        )
        before_ids = {j["jobId"] for j in _jobs(spark)}
        t0 = time.time()
        inc = curate_incremental(spark, batch, pipe_dir, batch_label=f"t{ti}")
        wall = round(time.time() - t0, 3)
        time.sleep(0.5)  # let the UI catch up
        new = [j for j in _jobs(spark) if j["jobId"] not in before_ids]
        new.sort(key=lambda j: j["jobId"])
        print(
            json.dumps(
                {
                    "trigger": ti,
                    "wall_s": wall,
                    "segments": inc.get("segments"),
                    "stages": inc["stages"],
                    "n_jobs": len(new),
                    "jobs": [
                        {
                            "id": j["jobId"],
                            "desc": (j.get("description") or j.get("name", ""))[:110],
                            "dur_ms": _dur(j),
                            "tasks": j.get("numTasks"),
                        }
                        for j in new
                    ],
                }
            ),
            flush=True,
        )
    print(json.dumps({"load_avg": list(os.getloadavg())}))

    import shutil

    shutil.rmtree(pipe_dir, ignore_errors=True)


def _dur(j: dict) -> int | None:
    try:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        st = datetime.strptime(j["submissionTime"].replace("GMT", ""), fmt.replace("%Z", ""))
        en = datetime.strptime(j["completionTime"].replace("GMT", ""), fmt.replace("%Z", ""))
        return int((en - st).total_seconds() * 1000)
    except Exception:
        return None


if __name__ == "__main__":
    main()
