"""Multimodal column support (SURVEY.md §2.9 OP-X-MULTIMODAL).

Media assets are opaque ``binary`` columns with a typed metadata struct —
the pattern a 100 TB training-data lake uses: content stays columnar (or an
object-store reference), metadata is queryable, and all per-item Python
work runs through Arrow-batched ``mapInPandas`` so the exchange cost is one
columnar batch, never per-row pickling.

The actual codecs (PIL / libav) are NOT available in this environment, so
``decode`` is stubbed two ways, clearly marked:

* ``backend="fake"`` (default): a deterministic md5-derived decoder — real
  Spark plumbing (schema, batching, partitioning) with reproducible output,
  so the pipeline is testable end-to-end and oracle-checkable.
* ``backend="pil"``: the real import path, raising ``NotImplementedError``
  with guidance when the library is missing.

Scale notes: ``mapInPandas`` preserves the input partitioning (no shuffle);
batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
Feature vectors come back as ``array<float>`` ready for the similarity
operators (plans/similarity.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the lake-wide media column layout: content plus typed metadata
MEDIA_STRUCT = StructType(
    [
        StructField("path", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("content", BinaryType(), True),
    ]
)

IMAGE_META_FIELDS = [
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("n_channels", LongType(), True),
]


def attach_media(df: DataFrame, *, path: Column, mime: Column, content: Column) -> DataFrame:
    """Pack loose columns into the canonical ``media`` struct column."""
    return df.withColumn(
        "media",
        F.struct(
            path.alias("path"),
            mime.alias("mime"),
            F.length(content).cast("long").alias("size_bytes"),
            content.alias("content"),
        ),
    )


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real image header parse: dimensions are
    derived from the content's md5 (stable across engines and runs)."""
    h = hashlib.md5(content).hexdigest()
    return 1 + int(h[:4], 16) % 1024, 1 + int(h[4:8], 16) % 1024, 3


def _pil_dims(content: bytes) -> tuple[int, int, int]:
    """Real header parse via Pillow (same (width, height, n_channels)
    contract as the fake backend).  Imported lazily INSIDE the executor
    task — the driver gate in decode_image_meta already verified the
    library exists before shipping the plan."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(content)) as im:
        w, h = im.size
        n = len(im.getbands())
    return w, h, n


def decode_image_meta(df: DataFrame, *, backend: str = "fake") -> DataFrame:
    """media struct → per-image metadata columns via ``mapInPandas``.

    Output schema = input schema (minus content) + width/height/n_channels.
    """
    if backend == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env has no PIL
            raise NotImplementedError(
                "real image decode requires Pillow; install it on the cluster "
                "or use backend='fake' for plumbing tests"
            ) from exc
    elif backend != "fake":
        raise ValueError(f"unknown backend {backend!r}")

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "media"]
        + [
            StructField("path", StringType(), True),
            StructField("mime", StringType(), True),
            StructField("size_bytes", LongType(), True),
        ]
        + IMAGE_META_FIELDS
    )

    dims_fn = _pil_dims if backend == "pil" else _fake_dims

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf["media"]
            dims = [
                dims_fn(bytes(m["content"])) if m is not None and m["content"] is not None
                else (None, None, None)
                for m in media
            ]
            out = pdf.drop(columns=["media"])
            out["path"] = [m["path"] if m is not None else None for m in media]
            out["mime"] = [m["mime"] if m is not None else None for m in media]
            out["size_bytes"] = [m["size_bytes"] if m is not None else None for m in media]
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["n_channels"] = [d[2] for d in dims]
            yield out

    return df.mapInPandas(batches, schema=out_schema)


AUDIO_META_FIELDS = [
    StructField("n_channels", LongType(), True),
    StructField("sample_rate", LongType(), True),
    StructField("n_frames", LongType(), True),
]


def encode_wav_pcm16(samples: list[int], *, sample_rate: int = 8000) -> bytes:
    """Integer samples → a real PCM16 WAV container (stdlib ``wave`` —
    pure Python, no external codec).  Test/fixture helper: the audio
    twin of planting a real PNG for the PIL path (r11, VERDICT r10 ask
    #5)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _wave_meta(content: bytes) -> tuple[int, int, int]:
    """Real WAV header parse via the stdlib ``wave`` module (same
    (n_channels, sample_rate, n_frames) contract as the fake backend)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        return w.getnchannels(), w.getframerate(), w.getnframes()


def _fake_audio_meta(content: bytes) -> tuple[int, int, int]:
    h = hashlib.md5(content).hexdigest()
    return 1 + int(h[:2], 16) % 2, 8000, 1 + int(h[2:8], 16) % 100_000


def decode_wav_samples(content: bytes) -> list[int]:
    """Real PCM16 WAV decode → integer samples (mono; first channel of
    multi-channel input)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV is supported")
        n, ch = w.getnframes(), w.getnchannels()
        raw = struct.unpack(f"<{n * ch}h", w.readframes(n))
    return list(raw[::ch])


def gradient_fingerprint(samples: list[int], *, stride: int = 4) -> int:
    """The chromaprint-shaped temporal-gradient bitmap over decoded
    samples: bit j = (sample[j] > sample[j+stride]) — the EXACT bit rule
    of the catalog query ``media_audio_fingerprint`` (plans/media.py),
    so a real-decode path cross-validates the synthetic pipeline."""
    fp = 0
    for j in range(len(samples) - stride):
        if samples[j] > samples[j + stride]:
            fp |= 1 << j
    return fp


def decode_audio_meta(df: DataFrame, *, backend: str = "fake") -> DataFrame:
    """media struct → per-clip audio metadata via ``mapInPandas``.

    ``backend="wave"`` is a REAL container decode (stdlib ``wave`` —
    always present, unlike PIL/libav); ``backend="fake"`` is the
    md5-derived stand-in matching the image-path policy.  Output schema
    = input schema (minus content) + n_channels/sample_rate/n_frames.
    """
    if backend not in ("fake", "wave"):
        raise ValueError(f"unknown backend {backend!r}")
    meta_fn = _wave_meta if backend == "wave" else _fake_audio_meta

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "media"]
        + [
            StructField("path", StringType(), True),
            StructField("mime", StringType(), True),
            StructField("size_bytes", LongType(), True),
        ]
        + AUDIO_META_FIELDS
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf["media"]
            metas = [
                meta_fn(bytes(m["content"]))
                if m is not None and m["content"] is not None
                else (None, None, None)
                for m in media
            ]
            out = pdf.drop(columns=["media"])
            out["path"] = [m["path"] if m is not None else None for m in media]
            out["mime"] = [m["mime"] if m is not None else None for m in media]
            out["size_bytes"] = [
                m["size_bytes"] if m is not None else None for m in media
            ]
            out["n_channels"] = [m[0] for m in metas]
            out["sample_rate"] = [m[1] for m in metas]
            out["n_frames"] = [m[2] for m in metas]
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def extract_features(df: DataFrame, *, dim: int = 16) -> DataFrame:
    """media struct → ``array<float>`` feature vector (deterministic stub).

    The fake featurizer hashes content into ``dim`` floats in [-1, 1); the
    real one would run a vision/audio encoder over the same batches — the
    Arrow exchange shape is identical, which is what this validates.
    """
    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField("features", ArrayType(FloatType()), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for m in pdf["media"]:
                if m is None or m["content"] is None:
                    feats.append(None)
                    continue
                h = hashlib.sha256(bytes(m["content"])).digest()
                raw = (h * ((dim * 2) // len(h) + 1))[: dim * 2]
                feats.append(
                    [
                        (int.from_bytes(raw[2 * i : 2 * i + 2], "big") - 32768) / 32768.0
                        for i in range(dim)
                    ]
                )
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, *, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling stub: emits one row per sampled "frame" offset
    (deterministic byte-stride placeholder for keyframe extraction).

    Real implementation would demux with libav inside the same
    ``mapInPandas`` loop; the explode shape (one input row → N frame rows)
    is the part the engine owns and tests."""
    out_schema = StructType(
        [
            StructField("path", StringType(), True),
            StructField("frame_index", LongType(), True),
            StructField("byte_offset", LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for m in pdf["media"]:
                if m is None or m["size_bytes"] is None:
                    continue
                # ceil(size/stride): every emitted offset lies INSIDE the
                # content (size//stride + 1 put an offset at exactly
                # `size` for stride-multiple files — one past the last
                # valid byte, where a real demuxer would seek past EOF)
                sz = int(m["size_bytes"])
                n = min(max_frames, max(1, (sz + every_n_bytes - 1) // every_n_bytes))
                for i in range(n):
                    rows.append((m["path"], i, i * every_n_bytes))
            yield pd.DataFrame(rows, columns=["path", "frame_index", "byte_offset"])

    return df.select("media").mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# DCT perceptual hash (r4): the REAL pHash algorithm over the media struct
# ---------------------------------------------------------------------------

_PHASH_SIDE = 32  # resize target; DCT runs on 32x32
_PHASH_LOW = 8  # low-frequency block kept (8x8 -> 63 bits after DC drop)


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis as a matrix: ``C @ X @ C.T`` is the 2-D
    DCT.  Pure numpy — no scipy dependency."""
    import numpy as np

    k = np.arange(n)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    C[0, :] = np.sqrt(1.0 / n)
    return C


def _pool_matrix(src: int, dst: int):
    """(dst x src) area-mean pooling matrix: row b averages the source
    indices whose bin ``i*dst//src`` is b — exact mean-pool resize for any
    source size, as two matmuls."""
    import numpy as np

    bins = (np.arange(src) * dst) // src
    P = np.zeros((dst, src))
    P[bins, np.arange(src)] = 1.0
    counts = P.sum(axis=1, keepdims=True)
    return P / np.maximum(counts, 1.0)


def dct_phash_array(img) -> int:
    """63-bit DCT perceptual hash of a 2-D grayscale array: mean-pool to
    32x32, 2-D DCT, keep the low 8x8 block minus DC, threshold at the
    median.  The classic pHash construction (same shape as the reference
    detector's banding expects: near-identical images differ in a few
    bits, unrelated images in ~half)."""
    import numpy as np

    X = np.asarray(img, dtype=np.float64)
    Pr = _pool_matrix(X.shape[0], _PHASH_SIDE)
    Pc = _pool_matrix(X.shape[1], _PHASH_SIDE)
    small = Pr @ X @ Pc.T
    C = _dct_matrix(_PHASH_SIDE)
    freq = C @ small @ C.T
    v = freq[:_PHASH_LOW, :_PHASH_LOW].ravel()[1:]  # drop DC
    med = float(np.median(v))
    h = 0
    for i, x in enumerate(v):
        if x > med:
            h |= 1 << i
    return h


def dct_phash_media(
    df: DataFrame,
    *,
    width_col: str = "width",
    height_col: str = "height",
    backend: str = "raw-gray",
) -> DataFrame:
    """media struct (+ dimension columns) → ``phash`` bigint per item via
    Arrow-batched ``mapInPandas`` — the real DCT backend the SimHash
    stand-in in plans/media.py documents as its swap point.

    ``backend="raw-gray"``: content bytes are a row-major uint8 grayscale
    buffer of (height, width) — the synthetic-fixture contract (no codec
    needed).  ``backend="pil"``: decode any real image format to
    grayscale first (gated on Pillow being installed, same policy as
    decode_image_meta).  Undecodable/missing content yields NULL.
    """
    if backend == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env has no PIL
            raise NotImplementedError(
                "real image decode requires Pillow; install it on the "
                "cluster or use backend='raw-gray' for raw buffers"
            ) from exc
    elif backend != "raw-gray":
        raise ValueError(f"unknown backend {backend!r}")

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "media"]
        + [StructField("phash", LongType(), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            hashes = []
            for m, w, h in zip(pdf["media"], pdf[width_col], pdf[height_col]):
                if m is None or m["content"] is None:
                    hashes.append(None)
                    continue
                try:
                    if backend == "pil":  # pragma: no cover - env has no PIL
                        import io

                        import PIL.Image

                        with PIL.Image.open(io.BytesIO(bytes(m["content"]))) as im:
                            img = np.asarray(im.convert("L"), dtype=np.float64)
                    else:
                        img = np.frombuffer(
                            bytes(m["content"]), dtype=np.uint8, count=int(w) * int(h)
                        ).reshape(int(h), int(w))
                    hashes.append(dct_phash_array(img))
                except (ValueError, OSError, TypeError):
                    # TypeError: NULL width/height with non-null content
                    hashes.append(None)
            out = pdf.drop(columns=["media"])
            out["phash"] = pd.array(hashes, dtype="Int64")
            yield out

    return df.mapInPandas(batches, schema=out_schema)


def banded_hamming_pairs(
    items: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    n_bands: int = 4,
    band_bits: int = 15,
    max_hamming: int = 12,
) -> DataFrame:
    """Backend-agnostic banded Hamming near-dup join: the LSH-band →
    exact-verify pipeline of plans/media.py media_phash_neardup, factored
    so any per-item hash (SimHash stand-in, DCT pHash) plugs in.  Bands
    use div/% only (&/<< precedence is a cross-engine trap), the band
    self-join is shuffle-hash pinned (corpus-sized sides are never
    broadcast), and candidates are verified with exact
    ``bit_count(xor) <= max_hamming``."""
    band_mod = 1 << band_bits
    bands = items.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"({hash_col} div {band_mod**b}L) % {band_mod}"
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_h", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.hint("shuffle_hash").alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias(f"{id_col}_a"),
            F.col("b._id").alias(f"{id_col}_b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(f"{id_col}_a", f"{id_col}_b", "hamming")
    )
