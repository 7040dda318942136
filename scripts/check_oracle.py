#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every catalog query in Spark AND its DuckDB oracle on the same
testdata, compares row count, column names, and an order-insensitive value
hash.  Usage::

    python scripts/check_oracle.py [sf_dir] [query ...] [--json OUT.json]

``--json`` additionally writes a driver-shaped correctness artifact (the
CORRECTNESS_r0N.json row format) so rounds can commit local-replica
evidence for queries outside the driver's ~50-row witness window
(ADVICE r2).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize value repr: everything to strings, floats via repr (bit-faithful)
    out = pd.DataFrame()
    # collision-free null marker: the printable token "NULL" would make a
    # real NULL compare equal to the literal 4-char string 'NULL'
    _NULL = "\x00<null>\x00"
    for c in df.columns:
        col = df[c]
        if col.dtype == "float64":
            out[c] = col.map(lambda v: repr(float(v)) if pd.notna(v) else _NULL)
        else:
            out[c] = col.map(lambda v: _NULL if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [sf_dir] [query ...] [--json OUT.json]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    # every remaining path-like argument must BE the sf_dir — a path typo
    # (or sf_dir passed after the query names) silently checking the
    # default directory would fabricate evidence for the wrong scale
    strays = [a for a in args if "/" in a and a != sf_dir]
    if strays:
        print(f"unrecognized argument(s): {strays} (sf_dir must come first)")
        return 2
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)

    from agf_data_ingestion_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for tname in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{sf_dir}/{tname}.parquet')"
        )

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            results[name] = _row(None, None, None, None, None, f"spark: {exc}"[:200])
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            results[name] = _row(None, None, None, len(sdf), None, "no_oracle")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            results[name] = _row(None, None, None, len(sdf), None, f"duckdb: {exc}"[:200])
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            cs, cd = _canon(sdf), _canon(ddf)
            if not cs.equals(cd):
                neq = (cs != cd).any(axis=1)
                idx = list(cs.index[neq])[:3]
                detail = [
                    f"row {i}: spark={cs.loc[i].to_dict()} duck={cd.loc[i].to_dict()}" for i in idx
                ]
                problems.append(f"{int(neq.sum())} mismatched rows; " + " | ".join(detail))
        rows_ok = len(sdf) == len(ddf)
        schema_ok = sorted(sdf.columns) == sorted(ddf.columns)
        hash_ok = rows_ok and schema_ok and not problems
        results[name] = _row(
            rows_ok, schema_ok, hash_ok, len(sdf), len(ddf),
            "; ".join(problems)[:200] or None,
        )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=2)
    return 1 if n_fail else 0


def _row(rows_match, schema_match, hash_match, spark_rows, oracle_rows, err):
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": spark_rows,
        "oracle_rows": oracle_rows,
        "err": err,
    }


if __name__ == "__main__":
    raise SystemExit(main())
