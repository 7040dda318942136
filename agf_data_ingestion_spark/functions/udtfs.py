"""Python UDTF surface (Spark 4 table-generating functions).

The engine's rule stands: table-generating logic belongs in native
explode/transform (JVM-side, codegen'd) whenever expressible — see
plans/text.py `docs_chunked` / `docs_pmi_bigrams` for the native shapes.
The UDTF path exists for the cases a row-to-rows expansion genuinely
needs imperative Python (stateful tokenizers, third-party parsers), and
this module pins the API pattern so such operators slot in with the same
determinism discipline:

* UDTF handles are created lazily (a module-level ``@udtf`` would bind at
  import, and — like module-level ``pandas_udf`` — the registration path
  may touch the active session; same trap documented in CLAUDE.md).
* Every UDTF here has a NATIVE DataFrame twin, and the test suite asserts
  row-level equality — the UDTF is the extensibility demo, the native
  plan is the production path (UDTFs run in the Python worker: per-batch
  serialization, no codegen — the ~10-100× Pandas-UDF-vs-builtin gap
  applies to UDTFs too).

Reference mapping: the reference's only row-expanding operation is the
manifest file-list explode (SURVEY.md §2.4, `agf_ingestion_lambda.py`
files_in_batch loop); `sentence_spans` generalizes it to text
segmentation with source offsets — the row shape RAG chunkers and span
de-dupers consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SENTENCE_SCHEMA = "sent_idx int, start_pos int, end_pos int, sentence string"


def _sentence_spans_impl(text: str | None):
    """Split on '.', '!', '?' runs; yield (idx, start, end, sentence) with
    end-exclusive character offsets into the ORIGINAL string.  Pure
    function of the input → deterministic under any partitioning.

    Whitespace contract: only the SPACE character delimits (strip/rstrip
    are space-only) — tabs/newlines are sentence content.  This matches
    the native twin exactly (Spark's ``trim`` and the ``' +$'`` regexp
    are space-only too); an all-whitespace convention would silently
    diverge row-by-row."""
    if not text:
        return
    n = len(text)
    idx = 0
    start = 0
    i = 0
    while i < n:
        if text[i] in ".!?":
            while i < n and text[i] in ".!?":
                i += 1
            sent = text[start:i].strip(" ")
            if sent:
                yield (idx, start, i, sent)
                idx += 1
            while i < n and text[i] == " ":
                i += 1
            start = i
        else:
            i += 1
    body = text[start:n].rstrip(" ")
    sent = body.strip(" ")
    if sent:
        yield (idx, start, start + len(body), sent)


def sentence_spans_udtf():
    """Lazily-constructed UDTF handle (register per session / use inline)."""
    from pyspark.sql.functions import udtf

    class SentenceSpans:
        def eval(self, text: str):  # noqa: A002 - UDTF argument name
            yield from _sentence_spans_impl(text)

    return udtf(SentenceSpans, returnType=SENTENCE_SCHEMA)


def segment_sentences(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """UDTF-powered segmentation: one output row per sentence with offsets.

    ``LATERAL JOIN``-shaped: the UDTF is applied per input row and its
    output rows are joined back to the row's id (Spark plans this as a
    single Python-worker pass — no shuffle beyond the scan)."""
    fn = sentence_spans_udtf()
    spark = docs.sparkSession
    spark.udtf.register("sentence_spans", fn)
    docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).createOrReplaceTempView(
        "_seg_in"
    )
    return spark.sql(
        "SELECT doc_id, s.sent_idx, s.start_pos, s.end_pos, s.sentence "
        "FROM _seg_in, LATERAL sentence_spans(text) s"
    )


def segment_sentences_native(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The JVM-native twin: same output via regexp_extract_all over a
    pattern capturing (sentence)(terminator run) — stays in codegen.
    Offsets are rebuilt from cumulative lengths with a running window
    inside the array (aggregate-free: transform over the prefix).

    Native-vs-UDTF equality is pinned by tests/test_udtf.py; this is the
    path a production plan should take.
    """
    # pieces: every maximal run "<body><.!? run><spaces>"; offsets derive
    # from cumulative piece lengths
    pieces = F.expr(
        "regexp_extract_all(text, '[^.!?]*[.!?]+ *|[^.!?]+$', 0)"
    )
    exploded = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(pieces).alias("piece_idx", "piece"),
            # char offset where each piece starts: sum of prior piece lengths
            pieces.alias("_pieces"),
        )
        .withColumn(
            "start_pos",
            F.expr(
                "aggregate(slice(_pieces, 1, piece_idx), 0, (acc, p) -> acc + length(p))"
            ),
        )
        .drop("_pieces")
    )
    body = F.regexp_replace(F.col("piece"), " +$", "")  # strip trailing spaces
    sent = F.trim(F.col("piece"))
    out = exploded.select(
        "doc_id",
        "piece_idx",
        "start_pos",
        (F.col("start_pos") + F.length(body)).alias("end_pos"),
        sent.alias("sentence"),
    ).filter(F.length("sentence") > 0)
    w = F.row_number().over(Window.partitionBy("doc_id").orderBy("piece_idx"))
    return out.select(
        "doc_id",
        (w - 1).alias("sent_idx"),
        "start_pos",
        "end_pos",
        "sentence",
    )
