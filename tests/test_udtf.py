"""Python UDTF (Spark 4) sentence segmentation vs its JVM-native twin:
identical rows on the documents corpus and on adversarial edge cases.
The native plan is the production path; the UDTF pins the extension API
(lazy handle creation, LATERAL join shape, deterministic eval)."""

from __future__ import annotations

from pyspark.sql import functions as F

from agf_data_ingestion_spark.functions.udtfs import (
    _sentence_spans_impl,
    segment_sentences,
    segment_sentences_native,
)
from tests.conftest import SF_SMOKE

EDGE_CASES = [
    (1, "One. Two! Three?"),
    (2, "No terminator at all"),
    (3, "Trailing spaces after tail   "),
    (4, "Multi... terminators?! Yes."),
    (5, " leading space. and. more."),
    (6, "..."),
    (7, ""),
    (8, "a. . b"),
    (9, "Tight.Packed.Sentences"),
    (10, "tab\tinside. and\ttrailing\t"),
    (11, "newline\nbody. tail\n"),
]


def _rows(df):
    return sorted(
        (r["doc_id"], r["sent_idx"], r["start_pos"], r["end_pos"], r["sentence"])
        for r in df.collect()
    )


def test_udtf_matches_native_on_edge_cases(spark):
    docs = spark.createDataFrame(EDGE_CASES, "doc_id long, text string")
    assert _rows(segment_sentences(docs)) == _rows(segment_sentences_native(docs))


def test_udtf_matches_native_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id", "text")
    got_udtf = _rows(segment_sentences(docs))
    got_native = _rows(segment_sentences_native(docs))
    assert got_udtf == got_native
    assert len(got_udtf) > 0


def test_spans_reconstruct_source_slices():
    """Offsets must index the ORIGINAL string: text[start:end] reproduces
    the sentence up to surrounding whitespace."""
    for _, text in EDGE_CASES:
        for idx, start, end, sent in _sentence_spans_impl(text):
            assert text[start:end].strip(" ") == sent
            assert 0 <= start < end <= len(text)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" .!?abcdef\t\n", max_size=80))
def test_span_laws_fuzz(text):
    """Fuzzed invariants of the segmentation: spans are in-order and
    non-overlapping, indices are valid, every non-space non-terminator
    character of the input is covered by exactly one span, and sentence
    text reconstructs from the original string."""
    spans = list(_sentence_spans_impl(text))
    prev_end = -1
    covered = set()
    for idx, (i, start, end, sent) in enumerate(spans):
        assert i == idx
        assert 0 <= start < end <= len(text)
        assert start > prev_end or idx == 0 or start >= prev_end
        assert text[start:end].strip(" ") == sent
        assert sent != ""
        prev_end = end
        covered.update(range(start, end))
    for pos, ch in enumerate(text):
        if ch not in " .!?":
            assert pos in covered, (pos, ch, spans)
    # space-only whitespace contract: tabs/newlines are sentence content
    for _, start, end, sent in spans:
        assert sent == text[start:end].strip(" ")
