"""Trained language identification (OP-X-LANGID, r6): a fastText-style
hashed-character-bigram linear classifier, trained and applied as catalog
queries with bit-identical DuckDB oracles.

Every public corpus pipeline (CCNet, Dolma, RefinedWeb) gates documents
on a TRAINED language classifier, not a heuristic — `docs_lang_id`
(plans/text.py) is the heuristic rung; this is the trained rung.  The
reference system has no text surface (SURVEY §2.9 extension).

The 3-language corpus is PLANTED deterministically inside the query (the
entity/pii planted-corpus pattern): md5('lid:'||doc_id) assigns each
document a language ∈ {0,1,2} and an 80/20 train/held-out split; its text
is 12 pseudo-words built by ``translate``-mapping md5 hex digits through a
LANGUAGE-SPECIFIC 16-letter alphabet map.  The three alphabets are
overlapping 10-letter windows (a–j / g–p / m–v), so bigram distributions
overlap realistically but remain separable — both engines derive the
bit-identical corpus, and accuracy is a planted truth the pytest pins at
≥ 95% (measured 100%).

Model (exact-integer end-to-end — the CLAUDE.md no-log rule):

* features = character bigrams of the text, md5-hashed into ``_D`` buckets
  (md5-derived only — never engine ``hash()``);
* training is ONE closed-form counting pass: weight(bucket, lang) =
  occurrences-per-million of the bucket within the language's training
  bigrams, as truncating integer division (Spark ``DIV`` ≡ DuckDB ``//``);
* scoring: score(doc, lang) = Σ_buckets count_doc(bucket) ·
  weight(bucket, lang) — a pure int64 dot product (≤ 2^40 here), argmax
  via the verified struct-min pattern ``min(struct(-score, lang)).lang``
  with the lowest language id breaking exact ties.

Scale shape: training is one corpus scan (bigram explode + plain
aggregates — map-side partials shrink each partition to ≤ _D·3 rows) into
a CONSTANT-size model (≤ _D·3 rows, KiBs) — the model side of the apply
join is ``F.broadcast`` by the filter-first-then-broadcast rule; the
corpus side never shuffles except the two doc-keyed aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agf_data_ingestion_spark.plans.base import QuerySpec, t

#: hashed-feature buckets (fastText uses 2^21 at web scale; 4096 keeps the
#: model tiny while leaving ~2 bigrams/bucket at the planted alphabet size)
_D = 4096
#: per-word count and the language alphabet maps — 16 hex digits each, an
#: overlapping 10-letter window per language (4 letters shared with the
#: neighboring language)
_WORDS = 12
_MAPS = ["abcdefghijabcdef", "ghijklmnopghijkl", "mnopqrstuvmnopqr"]


def _b(prefix: str):
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string"))), 1, 10
            ),
            16,
            10,
        )
        .cast("long")
    )


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, is_train, text): the planted 3-language corpus."""
    d = t(spark, sf_dir, "documents").select("doc_id")
    b = _b("lid:")
    words = []
    for i in range(1, _WORDS + 1):
        h = F.md5(F.concat(F.lit(f"lid:w{i}:"), F.col("doc_id").cast("string")))
        raw = F.substring(h, 1, 4 + (i % 3))
        # translate the hex digits through the language's alphabet map
        word = (
            F.when(F.col("lang") == 0, F.translate(raw, "0123456789abcdef", _MAPS[0]))
            .when(F.col("lang") == 1, F.translate(raw, "0123456789abcdef", _MAPS[1]))
            .otherwise(F.translate(raw, "0123456789abcdef", _MAPS[2]))
        )
        words.append(word)
    return (
        d.select("doc_id", (b % 3).alias("lang"), ((b % 5) != 0).alias("is_train"))
        .select("doc_id", "lang", "is_train", F.concat_ws(" ", *words).alias("text"))
    )


def _bigrams(c: DataFrame) -> DataFrame:
    """(doc_id, lang, is_train, bucket): one row per character bigram,
    md5-hashed into ``_D`` buckets.  Char-array form (r10): ``substr``
    per exploded position scans codepoints from the string start —
    O(len^2) per doc; split-once + O(1) element_at is byte-identical
    (see plans/quality_model._bigrams)."""
    return (
        c.filter(F.length("text") >= 2)
        .select(
            "doc_id",
            "lang",
            "is_train",
            F.split("text", "").alias("cs"),
        )
        .select(
            "doc_id",
            "lang",
            "is_train",
            "cs",
            F.explode(F.sequence(F.lit(1), F.size("cs") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            "lang",
            "is_train",
            F.concat(
                F.element_at("cs", F.col("i")),
                F.element_at("cs", F.col("i") + 1),
            ).alias("bg"),
        )
        .select(
            "doc_id",
            "lang",
            "is_train",
            (
                F.conv(F.substring(F.md5("bg"), 1, 6), 16, 10).cast("long") % _D
            ).alias("bucket"),
        )
    )


def _weights(bg: DataFrame) -> DataFrame:
    """(bucket, lang, n, weight): occurrences-per-million of the bucket in
    the language's TRAINING bigrams — the closed-form integer model."""
    train = bg.filter(F.col("is_train"))
    counts = train.groupBy("bucket", "lang").agg(F.count("*").alias("n"))
    totals = train.groupBy("lang").agg(F.count("*").alias("tot"))
    return counts.join(F.broadcast(totals), "lang").select(
        "bucket", "lang", "n", F.expr("(n * 1000000) DIV tot").alias("weight")
    )


def _bg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CACHED labeled bigram rows — narrow scalar columns only (the
    r4 cache rule).  ``docs_langid_apply`` consumed this subtree twice
    (the `_weights` counts/totals side + the held-out side) and
    ``docs_langid_train`` shares the canonicalized plan, so the
    CacheManager serves the whole family from one corpus explode (the
    quality_model `_bg` pattern, r12)."""
    return _bigrams(_corpus(spark, sf_dir)).cache()


def docs_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained model table: per (feature bucket, language), the raw
    training count and the per-million integer weight."""
    return _weights(_bg(spark, sf_dir)).select(
        "bucket", "lang", "n", "weight"
    )


def docs_langid_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify the HELD-OUT 20%: integer dot product of the document's
    bucket counts with each language's weights, argmax with lowest-lang
    tie-break; ``correct`` is the planted self-evaluation (pytest pins
    accuracy ≥ 95%).

    Scale shape (r7, VERDICT r6 finding #4): the r6 form computed
    per-(doc, lang) score rows and LEFT-joined them back to the held-out
    corpus — TWO corpus exchanges on doc_id feeding a SortMergeJoin.
    Languages are a fixed model constant, so the per-language scores are
    now conditional sums in ONE ``groupBy(doc_id)`` over the
    broadcast-joined bigram rows (map-side partials collapse each doc to
    one row before the wire — a doc's bigrams never leave their input
    partition), and the argmin runs in the projection over the
    ``len(_MAPS)``-element (−score, lang) struct array (interpreted
    higher-order ops on a 3-element array, never corpus-sized — the
    CLAUDE.md lambda rule).  One corpus exchange carrying ~1 row/doc,
    no join, no window (plan-shape test pins it).  A bigram bucket
    absent from the training weights keeps its doc alive through the
    LEFT join (all-null scores → pred −1), preserving the r6 left-join
    semantics exactly — the DuckDB twin keeps its clearer
    feats/scores/argmin/left-join form and hash-matches bit-for-bit."""
    bg = _bg(spark, sf_dir)  # r12: cached — see _bg
    w = _weights(bg)
    held = bg.filter(~F.col("is_train")).select(
        "doc_id", F.col("lang").alias("true_lang"), "bucket"
    )
    joined = held.join(
        F.broadcast(w.select("bucket", "lang", "weight")), "bucket", "left"
    )
    langs = range(len(_MAPS))
    scores = joined.groupBy("doc_id", "true_lang").agg(
        *[
            F.sum(F.when(F.col("lang") == i, F.col("weight"))).alias(f"s{i}")
            for i in langs
        ]
    )
    # argmin over the languages that matched ≥1 trained bucket (null score
    # = unmatched): the verified struct-min rule, lowest lang breaks ties
    cands = F.array(
        *[
            F.struct((-F.col(f"s{i}")).alias("d"), F.lit(i).cast("long").alias("l"))
            for i in langs
        ]
    )
    pred = F.array_min(F.filter(cands, lambda x: x["d"].isNotNull()))["l"]
    return scores.select(
        "doc_id",
        "true_lang",
        F.coalesce(pred, F.lit(-1)).alias("pred_lang"),
        (F.coalesce(pred, F.lit(-1)) == F.col("true_lang")).alias("correct"),
    )


def _word_sql(i: int) -> str:
    raw = f"substr(md5('lid:w{i}:' || CAST(doc_id AS VARCHAR)), 1, {4 + (i % 3)})"
    return (
        f"CASE lang WHEN 0 THEN translate({raw}, '0123456789abcdef', '{_MAPS[0]}')"
        f" WHEN 1 THEN translate({raw}, '0123456789abcdef', '{_MAPS[1]}')"
        f" ELSE translate({raw}, '0123456789abcdef', '{_MAPS[2]}') END"
    )


_CORPUS_CTES = f"""base AS (
  SELECT doc_id,
         ('0x' || substr(md5('lid:' || CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT AS b
  FROM documents
),
corpus AS (
  SELECT doc_id, b % 3 AS lang, (b % 5) <> 0 AS is_train,
         concat_ws(' ', {", ".join(_word_sql(i) for i in range(1, _WORDS + 1))}) AS text
  FROM base
),
bg AS (
  SELECT doc_id, lang, is_train,
         ('0x' || substr(md5(substr(text, i, 2)), 1, 6))::BIGINT % {_D} AS bucket
  FROM (SELECT *, UNNEST(range(1, length(text))) AS i FROM corpus)
),
w AS (
  SELECT bucket, lang, n, (n * 1000000) // tot AS weight
  FROM (SELECT bucket, lang, COUNT(*) AS n FROM bg WHERE is_train GROUP BY 1, 2) c
  JOIN (SELECT lang AS tl, COUNT(*) AS tot FROM bg WHERE is_train GROUP BY 1) t
    ON c.lang = t.tl
)"""

_TRAIN_SQL = f"""
WITH {_CORPUS_CTES}
SELECT bucket, lang, n, weight FROM w
"""

_APPLY_SQL = f"""
WITH {_CORPUS_CTES},
feats AS (
  SELECT doc_id, lang AS true_lang, bucket, COUNT(*) AS cnt
  FROM bg WHERE NOT is_train GROUP BY 1, 2, 3
),
scores AS (
  SELECT f.doc_id, f.true_lang, w.lang, SUM(f.cnt * w.weight) AS score
  FROM feats f JOIN w ON f.bucket = w.bucket
  GROUP BY 1, 2, 3
),
preds AS (
  SELECT doc_id, true_lang,
         (MIN({{'d': -score, 'l': lang}})).l AS pred_lang
  FROM scores GROUP BY 1, 2
)
SELECT d.doc_id, d.lang AS true_lang,
       coalesce(p.pred_lang, -1) AS pred_lang,
       coalesce(p.pred_lang, -1) = d.lang AS correct
FROM corpus d LEFT JOIN preds p ON d.doc_id = p.doc_id
WHERE NOT d.is_train
"""


QUERIES: dict[str, QuerySpec] = {
    "docs_langid_train": QuerySpec(docs_langid_train, _TRAIN_SQL, ("OP-X-LANGID",)),
    "docs_langid_apply": QuerySpec(docs_langid_apply, _APPLY_SQL, ("OP-X-LANGID",)),
}
