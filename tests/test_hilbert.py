"""Hilbert layout key (OP-X-HILBERT): mathematical pins for the curve
itself plus the locality claim over Morton, and a data-path check that the
catalog query's hkey is exactly the numpy twin's output (the DuckDB twin
is hash-checked by the oracle gate at three scales).

Why Hilbert beats Morton for file layout: cut either curve into equal-size
key runs (file groups).  At power-of-4-ALIGNED cuts both give square
blocks, but real cuts are byte/row-budget driven and land anywhere — a
misaligned Morton run straddles a quadrant jump and its bounding box
explodes, while every Hilbert run stays a compact blob (adjacent steps
only).  The tests pin both facts numerically.
"""

from __future__ import annotations

import numpy as np

from agf_data_ingestion_spark.functions.zorder import _H_BITS, hilbert_np

N = 1 << _H_BITS


def _grid():
    xs = np.repeat(np.arange(N, dtype=np.int64), N)
    ys = np.tile(np.arange(N, dtype=np.int64), N)
    return xs, ys


def _morton(xs, ys, bits=_H_BITS):
    d = np.zeros(len(xs), dtype=np.int64)
    for i in range(bits):
        d |= ((xs >> i) & 1) << (2 * i)
        d |= ((ys >> i) & 1) << (2 * i + 1)
    return d


def test_hilbert_is_a_space_filling_curve():
    """Bijective onto [0, N²) with every consecutive pair grid-adjacent —
    the defining property (Manhattan step distance exactly 1)."""
    xs, ys = _grid()
    d = hilbert_np(xs, ys)
    assert d.min() == 0 and d.max() == N * N - 1
    assert len(np.unique(d)) == N * N
    order = np.argsort(d)
    steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (steps == 1).all()


def test_morton_jumps_hilbert_does_not():
    """Morton's total walk length over the full grid is far longer —
    the quadrant-jump cost the Hilbert rotation removes."""
    xs, ys = _grid()
    order = np.argsort(_morton(xs, ys))
    steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert steps.max() > 1  # jumps exist (largest spans a full side)
    assert steps.sum() > 1.9 * (N * N - 1)  # vs hilbert's exact N²-1


def test_misaligned_file_cuts_hilbert_tighter_boxes():
    """Cut both curves into 37 equal key runs (a deliberately
    non-power-of-4 file budget): the mean bounding-box semi-perimeter of
    Hilbert runs is strictly smaller — the pruning win, since a file's
    parquet min/max on BOTH dims is exactly its bounding box."""
    xs, ys = _grid()
    nb = 37

    def mean_span(keys):
        b = (keys.astype(np.int64) * nb) // (N * N)
        spans = []
        for i in range(nb):
            m = b == i
            spans.append(
                (xs[m].max() - xs[m].min()) + (ys[m].max() - ys[m].min())
            )
        return float(np.mean(spans))

    h = mean_span(hilbert_np(xs, ys))
    z = mean_span(_morton(xs, ys))
    assert h < z


def test_catalog_query_matches_numpy_twin(spark):
    from agf_data_ingestion_spark.plans.windows import events_hilbert_layout

    out = events_hilbert_layout(spark, "/root/testdata/sf0.001").collect()
    assert out
    cx = np.array([r["cx"] for r in out])
    cy = np.array([r["cy"] for r in out])
    hk = np.array([r["hkey"] for r in out])
    assert (hilbert_np(cx, cy) == hk).all()
    assert ((cx >= 0) & (cx < N) & (cy >= 0) & (cy < N)).all()
    assert all(r["h_bucket"] == r["hkey"] >> 8 for r in out)
