"""Sequence packing (OP-X-SEQPACK, r9): pack documents into fixed-length
training sequences — the batch-prep step every LLM data loader runs
between shards and the GPU (concatenate docs up to the context length,
start a new sequence when the next doc would overflow; T5/GPT "packing",
cf. Raffel et al. 2020 §2.2, Krell et al. 2021).

Semantics (deterministic NEXT-FIT per hash bucket):

* each doc hashes into one of ``n_buckets`` independent packing
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
bounded and embarrassingly parallel — ``n_buckets`` independent
folds, each O(corpus/buckets) — at the cost of packing efficiency only
(each stream packs its own tail; waste stays ≤ one window per bucket
beyond the unbucketed pack's).  This is the skewed-rank-decomposition
trade re-used for stateful folds.

Bucket count (r10, VERDICT r9 ask #5): ADAPTIVE — ``greatest(32,
least(65536, corpus_docs DIV 128))``, the `_sd_bits`-style integer-only
rule both engines compute identically, so a 1e9-doc corpus gets 65536
streams (~15k docs per serial fold) instead of serializing corpus/32
per bucket.  32 stays the published floor: any corpus ≤ 4096 docs packs
exactly as the r9 fixed-32 layout did.  ``_packed`` also takes an
explicit ``n_buckets`` for loaders that pin the stream count as a
contract; the within-bucket fold is a pure function of the bucket's doc
set, so changing the count only RE-BUCKETS — it never changes how a
given doc set packs (pinned in tests/test_packing.py).

``seq_id`` encoding (r10, ADVICE r9): ``seq * n_buckets + bucket`` —
injective for ANY per-bucket sequence count (bucket = seq_id % n_buckets,
ordinal = seq_id DIV n_buckets).  The r9 form ``bucket * 1e6 + seq``
silently collided once a bucket emitted >1M sequences (~3e7 docs per
bucket at 256-token windows).

Cross-engine: the per-bucket fold is exact integer state inside ONE
``applyInPandas`` (Arrow-batched; each group = one bucket), and the
DuckDB twin advances the SAME state one rank per step with a recursive
CTE joined on (bucket, rank) — iteration depth = max bucket size, all
buckets advancing in lock-step.  Full hash-match oracle (the bucket
count lives in a 1-row CTE both engines fold identically).

Scale shape: one corpus exchange (the bucket groupBy feeding
applyInPandas), per-bucket linear state, output row-for-row with the
corpus; the bucket-count aggregate is a 1-row map-combined broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t

_PK_BUDGET = 256
#: adaptive stream-count rule (integer-only; `tot` = corpus doc count):
#: floor 32 = the published default, cap 65536, target ~128 docs/stream
_PK_MIN_BUCKETS = 32
_PK_MAX_BUCKETS = 65536
_PK_DOCS_PER_BUCKET = 128
_PK_BUCKETS_EXPR = (
    f"greatest({_PK_MIN_BUCKETS}, "
    f"least({_PK_MAX_BUCKETS}, tot DIV {_PK_DOCS_PER_BUCKET}))"
)


def _packed(d: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Next-fit pack of a (doc_id, tok, h) frame.  ``n_buckets=None``
    derives the stream count adaptively (module docstring); an explicit
    count pins it (the loader-contract escape hatch).  One corpus
    exchange; the per-bucket fold is a pure function of the bucket's
    (h, doc_id)-ordered doc set — independent of the bucket count."""
    if n_buckets is None:
        tot = d.agg(F.count("*").cast("long").alias("tot"))
        d = (
            d.crossJoin(F.broadcast(tot))
            .withColumn("nb", F.expr(_PK_BUCKETS_EXPR).cast("long"))
            .drop("tot")
        )
    else:
        d = d.withColumn("nb", F.lit(int(n_buckets)).cast("long"))
    d = d.withColumn(
        "bucket",
        F.pmod(F.conv(F.substring("h", 1, 10), 16, 10).cast("long"), F.col("nb")),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        n = len(pdf)
        nb = int(pdf["nb"].iloc[0]) if n else 0
        bucket = int(pdf["bucket"].iloc[0]) if n else 0
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
                "seq_id": [s * nb + bucket for s in seqs],
                "seq_offset": offs,
                "n_tok": pdf["tok"],
            }
        )

    return d.groupBy("bucket").applyInPandas(
        pack,
        "doc_id bigint, bucket bigint, pack_rank bigint, seq_id bigint,"
        " seq_offset bigint, n_tok bigint",
    )


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
    return _packed(d)


_PACK_SQL = f"""
WITH RECURSIVE nbq AS (
  SELECT greatest({_PK_MIN_BUCKETS},
                  least({_PK_MAX_BUCKETS},
                        CAST(COUNT(*) AS BIGINT) // {_PK_DOCS_PER_BUCKET})) AS nb
  FROM documents
),
base AS (
  SELECT doc_id, bucket, tok,
         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS r
  FROM (
    SELECT doc_id,
           least(CAST(len(string_split(text, ' ')) AS BIGINT), {_PK_BUDGET}) AS tok,
           substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 16) AS h,
           ('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT
             % nb AS bucket
    FROM documents, nbq)
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
       seq * nb + bucket AS seq_id,
       off AS seq_offset, tok AS n_tok
FROM pack, nbq
"""


QUERIES: dict[str, QuerySpec] = {
    "docs_packed_sequences": QuerySpec(
        docs_packed_sequences, _PACK_SQL, ("OP-X-SEQPACK", "OP-X-PACK")
    ),
}
