"""Deterministic synthetic manifest fixtures (FIXTURES.md §2-3, §5).

Writes a miniature data lake:
    <root>/raw/{instrument}/{YYYY}/{MM}/{DD}/{run_id}/run.json
    <root>/raw/.../{run_id}/{staff}/payload/{exp}/experiment.json

Seeded RNG; edge cases from the FIXTURES.md matrix are injected at fixed
ratios (missing/garbage timestamps, sha256: prefixes, uppercase hex,
missing total_size_bytes, single-segment paths).
"""

from __future__ import annotations

import hashlib
import json
import os
import random

STAFF = ["Alex_Chen", "Priya_Nair", "Sam_OBrien", "Mika_Tanaka"]
EXTS = ["csv", "fastq", "ab1", "xlsx", "txt"]


def _checksum(rng: random.Random, text: str) -> str:
    h = hashlib.sha256(text.encode()).hexdigest()
    roll = rng.random()
    if roll < 0.1:
        return "sha256:" + h          # prefixed variant
    if roll < 0.2:
        return h.upper()              # uppercase variant
    if roll < 0.25:
        return h[:63]                 # INVALID: 63 chars → quarantine
    return h


def _ts(rng: random.Random, y: int, m: int, d: int) -> str:
    roll = rng.random()
    if roll < 0.05:
        return ""                     # empty → lenient fallback
    if roll < 0.1:
        return "not-a-date"           # garbage → lenient fallback
    suffix = "Z" if rng.random() < 0.5 else "+00:00"
    return f"{y:04d}-{m:02d}-{d:02d}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}{suffix}"


def generate(root: str, instruments: int = 3, days: int = 5, runs_per_day: int = 2, seed: int = 7):
    rng = random.Random(seed)
    n_runs = 0
    n_exps = 0
    for i in range(instruments):
        inst = f"inst{i:02d}"
        for d in range(days):
            y, m, day = 2024, 3, d + 1
            for r in range(runs_per_day):
                run_id = f"run_{inst}_{y}{m:02d}{day:02d}_{r}"
                run_dir = os.path.join(root, "raw", inst, f"{y:04d}", f"{m:02d}", f"{day:02d}", run_id)
                staff_files: dict[str, int] = {}
                manifest = []
                for fi in range(rng.randrange(5, 15)):
                    staff = rng.choice(STAFF)
                    if rng.random() < 0.12:
                        path = f"{staff}/loose_{fi}.{rng.choice(EXTS)}"  # single-exp-less path
                    else:
                        exp = f"EXP{rng.randrange(4)}"
                        path = f"{staff}/{exp}/data_{fi}.{rng.choice(EXTS)}"
                    size = rng.randrange(100, 5_000_000)
                    entry = {
                        "path": path,
                        "size": size,
                        "checksum": _checksum(rng, path + run_id),
                    }
                    if rng.random() < 0.8:
                        entry["file_date"] = _ts(rng, y, m, day)
                    if rng.random() < 0.3:
                        entry["staff_name"] = staff
                    if rng.random() < 0.2:
                        entry["is_update"] = rng.random() < 0.5
                    manifest.append(entry)
                    staff_files[staff] = staff_files.get(staff, 0) + 1
                run_doc = {
                    "sync_timestamp": _ts(rng, y, m, day),
                    "computer_name": f"PC-{inst}",
                    "files_in_batch": len(manifest),
                    "files_by_staff": staff_files,
                    "file_manifest": manifest,
                }
                if rng.random() < 0.7:  # 30%: derived from manifest sum
                    run_doc["total_size_bytes"] = sum(f["size"] for f in manifest)
                os.makedirs(run_dir, exist_ok=True)
                with open(os.path.join(run_dir, "run.json"), "w") as fh:
                    json.dump(run_doc, fh)
                n_runs += 1

                # one experiment manifest per run for a random staff/exp
                staff = rng.choice(STAFF)
                exp_folder = f"EXP{rng.randrange(4)}"
                exp_dir = os.path.join(run_dir, staff, "payload", exp_folder)
                files = []
                for fi in range(rng.randrange(2, 8)):
                    name = f"result_{fi}.{rng.choice(EXTS)}"
                    files.append(
                        {
                            "relative_path": f"{exp_folder}/{name}" if rng.random() < 0.5 else name,
                            "name": name,
                            "size": rng.randrange(100, 1_000_000),
                            "checksum": _checksum(rng, name + run_id),
                            "modified": _ts(rng, y, m, day),
                        }
                    )
                exp_doc = {
                    "experiment_id": f"{exp_folder}_{staff}",
                    "created": _ts(rng, y, m, day),
                    "last_updated": _ts(rng, y, m, day),
                    "experiment_folder": exp_folder,
                    "staff_name": staff,
                    "instrument": inst,
                    "computer": f"PC-{inst}",
                    "file_count": len(files),
                    "total_size_bytes": sum(f["size"] for f in files),
                    "s3_location": f"s3://lake/raw/{inst}",
                    "files": files,
                }
                if rng.random() < 0.5:
                    exp_doc["update_count"] = rng.randrange(1, 5)
                if rng.random() < 0.3:
                    exp_doc["parameters"] = {"temp": "37C", "medium": "LB"}
                os.makedirs(exp_dir, exist_ok=True)
                with open(os.path.join(exp_dir, "experiment.json"), "w") as fh:
                    json.dump(exp_doc, fh)
                n_exps += 1
    return n_runs, n_exps


if __name__ == "__main__":
    import sys

    print(generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/agf_lake"))
