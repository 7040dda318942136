"""Sequence packing (OP-X-SEQPACK, r9): pack documents into fixed-length
training sequences — the batch-prep step every LLM data loader runs
between shards and the GPU (concatenate docs up to the context length,
start a new sequence when the next doc would overflow; T5/GPT "packing",
cf. Raffel et al. 2020 §2.2, Krell et al. 2021).

Semantics (deterministic NEXT-FIT per hash bucket):

* each doc hashes into one of ``_PK_BUCKETS`` independent packing
  streams (``md5('pack:'||doc_id)`` — content-stable, so packing is
  reproducible and append batches land in the same streams);
* within a bucket, docs are ordered by (md5 hash, doc_id) and packed
  next-fit against the ``_PK_BUDGET``-token window: a doc whose tokens
  still fit extends the current sequence, otherwise it OPENS a new one
  (docs never split; docs longer than the window are clamped, the
  loader-side truncation rule);
* output per doc: its bucket, rank, globally-unique ``seq_id``, the
  token offset where it starts, and its packed token count — every
  column an exact BIGINT.

Why bucketed: next-fit is inherently SEQUENTIAL state (fill resets on
overflow — not a prefix sum), so an unbucketed pack would be one
serial pass over the corpus.  Hash-bucketing makes the state per-bucket
bounded and embarrassingly parallel — ``_PK_BUCKETS`` independent
folds, each O(corpus/buckets) — at the cost of packing efficiency only
(each stream packs its own tail; waste stays ≤ one window per bucket
beyond the unbucketed pack's).  This is the skewed-rank-decomposition
trade re-used for stateful folds.

Cross-engine: the per-bucket fold is exact integer state inside ONE
``applyInPandas`` (Arrow-batched; each group = one bucket), and the
DuckDB twin advances the SAME state one rank per step with a recursive
CTE joined on (bucket, rank) — iteration depth = max bucket size, all
buckets advancing in lock-step.  Full hash-match oracle.

Scale shape: one corpus exchange (the bucket groupBy), per-bucket
linear state, output row-for-row with the corpus.  At 1e9 docs raise
``_PK_BUCKETS`` with corpus size (the `_sd_bits` integer-derivation
rule would pin it to the oracle if made adaptive; fixed here because
the packing-stream COUNT is a published loader contract, not a tuning
knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t

_PK_BUDGET = 256
_PK_BUCKETS = 32
#: seq_id = bucket * _PK_SEQBASE + per-bucket sequence ordinal
_PK_SEQBASE = 1_000_000


def docs_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bucket, pack_rank, seq_id, seq_offset, n_tok): the
    next-fit packing assignment (module docstring)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.least(
            F.size(F.split("text", " ")).cast("long"), F.lit(_PK_BUDGET).cast("long")
        ).alias("tok"),
        F.substring(
            F.md5(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))), 1, 16
        ).alias("h"),
    )
    d = d.withColumn(
        "bucket",
        F.pmod(F.conv(F.substring("h", 1, 10), 16, 10).cast("long"), F.lit(_PK_BUCKETS)),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        n = len(pdf)
        seqs = [0] * n
        offs = [0] * n
        seq, fill = 0, 0
        for i in range(n):
            tok = int(pdf["tok"].iloc[i])
            if i > 0 and fill + tok > _PK_BUDGET:
                seq += 1
                fill = 0
            offs[i] = fill
            seqs[i] = seq
            fill += tok
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bucket"],
                "pack_rank": range(1, n + 1),
                "seq_id": [
                    int(pdf["bucket"].iloc[0]) * _PK_SEQBASE + s for s in seqs
                ],
                "seq_offset": offs,
                "n_tok": pdf["tok"],
            }
        )

    return d.groupBy("bucket").applyInPandas(
        pack,
        "doc_id bigint, bucket bigint, pack_rank bigint, seq_id bigint,"
        " seq_offset bigint, n_tok bigint",
    )


_PACK_SQL = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, bucket, tok,
         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS r
  FROM (
    SELECT doc_id,
           least(CAST(len(string_split(text, ' ')) AS BIGINT), {_PK_BUDGET}) AS tok,
           substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 16) AS h,
           ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT
             % {_PK_BUCKETS} AS bucket
    FROM documents)
),
pack AS (
  SELECT doc_id, bucket, r, tok, CAST(0 AS BIGINT) AS seq,
         CAST(0 AS BIGINT) AS off, tok AS fill
  FROM base WHERE r = 1
  UNION ALL
  SELECT b.doc_id, b.bucket, b.r, b.tok,
         CASE WHEN p.fill + b.tok > {_PK_BUDGET} THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.fill + b.tok > {_PK_BUDGET} THEN CAST(0 AS BIGINT) ELSE p.fill END,
         CASE WHEN p.fill + b.tok > {_PK_BUDGET} THEN b.tok ELSE p.fill + b.tok END
  FROM pack p JOIN base b ON b.bucket = p.bucket AND b.r = p.r + 1
)
SELECT doc_id, bucket, r AS pack_rank,
       bucket * {_PK_SEQBASE} + seq AS seq_id,
       off AS seq_offset, tok AS n_tok
FROM pack
"""


QUERIES: dict[str, QuerySpec] = {
    "docs_packed_sequences": QuerySpec(
        docs_packed_sequences, _PACK_SQL, ("OP-X-SEQPACK", "OP-X-PACK")
    ),
}
