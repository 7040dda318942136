"""Export utilities: zip-archive assembly and presigned-URL generation.

Reference parity:
* ``lambda/agf_zip_generator_lambda.py`` — N objects → one zip with size
  guards (≤1 GB/file, ≤5 GB/batch, :27-28,60-80), duplicate-name
  numbering (:95,106-114), and a files-count metadata tag (:151-158).
  Engine shape: ``applyInPandas`` per export group — each task assembles
  one archive from its group's rows, so N exports parallelize across the
  cluster instead of one-Lambda-per-request.
* ``lambda/agf_ingestion_lambda.py:457-470`` — presigned GET URLs.  The
  boto3 signer is not available here; the deterministic HMAC-style stub
  keeps the column contract (url, expiry) testable.

Determinism: zip entries are written in sorted-path order with a fixed
ZipInfo timestamp, so an archive's bytes — and its sha256 — are a pure
function of its contents.
"""

from __future__ import annotations

import hashlib
import io
import os
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_FILE_BYTES = 1 << 30  # 1 GB per file   (reference :27)
MAX_BATCH_BYTES = 5 << 30  # 5 GB per batch  (reference :28)
_ZIP_EPOCH = (2024, 1, 1, 0, 0, 0)

ZIP_RESULT_SCHEMA = StructType(
    [
        StructField("export_group", StringType(), False),
        StructField("status", StringType(), False),
        StructField("file_count", LongType(), True),
        StructField("total_bytes", LongType(), True),
        StructField("zip_bytes", LongType(), True),
        StructField("zip_sha256", StringType(), True),
    ]
)


def _dedup_name(name: str, used: set[str]) -> str:
    """Duplicate-basename numbering (reference :95,106-114): second 'x.txt'
    becomes 'x_1.txt', third 'x_2.txt'.  Mirrors the reference exactly:
    os.path.splitext semantics (a leading-dot basename like '.env' is all
    stem → '.env_1', NOT '_1.env') and a while-loop over names already
    USED — a synthesized name must not collide with a literal input name
    ('x.txt', 'x_1.txt', 'x.txt' must not produce two 'x_1.txt' entries,
    which would silently overwrite on extraction)."""
    if name not in used:
        used.add(name)
        return name
    stem, ext = os.path.splitext(name)
    n = 1
    while f"{stem}_{n}{ext}" in used:
        n += 1
    out = f"{stem}_{n}{ext}"
    used.add(out)
    return out


def _zip_group(
    pdf: pd.DataFrame,
    max_file_bytes: int = MAX_FILE_BYTES,
    max_batch_bytes: int = MAX_BATCH_BYTES,
    output_dir: str | None = None,
) -> pd.DataFrame:
    group = pdf["export_group"].iloc[0]
    total = int(pdf["content"].map(len).sum())
    if (pdf["content"].map(len) > max_file_bytes).any():
        return pd.DataFrame(
            [[group, "rejected_file_too_large", len(pdf), total, None, None]],
            columns=[f.name for f in ZIP_RESULT_SCHEMA.fields],
        )
    if total > max_batch_bytes:
        return pd.DataFrame(
            [[group, "rejected_batch_too_large", len(pdf), total, None, None]],
            columns=[f.name for f in ZIP_RESULT_SCHEMA.fields],
        )
    buf = io.BytesIO()
    seen: set[str] = set()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for _, row in pdf.sort_values("path", kind="mergesort").iterrows():
            base = str(row["path"]).rsplit("/", 1)[-1]
            info = zipfile.ZipInfo(_dedup_name(base, seen), date_time=_ZIP_EPOCH)
            zf.writestr(info, bytes(row["content"]))
    data = buf.getvalue()
    if output_dir:
        # each group task writes its own artifact (the reference uploads
        # one zip per request; here one file per group, cluster-parallel)
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, f"{group}.zip"), "wb") as fh:
            fh.write(data)
    return pd.DataFrame(
        [[group, "ok", len(pdf), total, len(data), hashlib.sha256(data).hexdigest()]],
        columns=[f.name for f in ZIP_RESULT_SCHEMA.fields],
    )


def export_zip_groups(
    df: DataFrame,
    *,
    group: Column,
    path: Column,
    content: Column,
    max_file_bytes: int = MAX_FILE_BYTES,
    max_batch_bytes: int = MAX_BATCH_BYTES,
    output_dir: str | None = None,
) -> DataFrame:
    """One zip archive per export group (OP-UDF-ZIP).

    Input: any DataFrame; ``group`` names the archive, ``path``/``content``
    the members.  Output: one row per group with size-guard status and the
    archive digest.  Each group is assembled by a single task
    (``applyInPandas``), mirroring the reference's one-request-one-zip
    isolation while scaling groups across executors.
    """
    prepared = df.select(
        group.alias("export_group"), path.alias("path"), content.alias("content")
    )
    return prepared.groupBy("export_group").applyInPandas(
        lambda pdf: _zip_group(pdf, max_file_bytes, max_batch_bytes, output_dir),
        schema=ZIP_RESULT_SCHEMA,
    )


def presigned_url(bucket: Column, key: Column, *, expires_s: int = 3600) -> Column:
    """Presigned-GET-URL column (OP-UDF-URL stub).

    Deterministic signature stand-in (md5 of bucket/key/expiry); the real
    deployment swaps in a boto3 ``generate_presigned_url`` pandas UDF with
    the identical column contract (reference :457-470, 3600 s expiry).
    """
    sig = F.md5(F.concat_ws("|", bucket, key, F.lit(str(expires_s))))
    return F.concat(
        F.lit("https://"),
        bucket,
        F.lit(".s3.example/"),
        key,
        F.lit(f"?X-Amz-Expires={expires_s}&X-Amz-Signature="),
        F.substring(sig, 1, 16),
    )
