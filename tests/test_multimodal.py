"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas with a stubbed decode kernel."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from db_cdc_poc_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"fake-image-bytes", ("image", "png", 64, 64, None, None)),
        (2, b"fake-audio-bytes-longer", ("audio", "wav", None, None, 5000, 16000)),
        (3, b"fake-video", ("video", "mp4", 320, 240, 3500, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_plumbing(spark, media):
    out = {r.media_id: r for r in mm.extract_features(media, dim=8).collect()}
    assert set(out) == {1, 2, 3}
    for mid, r in out.items():
        assert len(r.features) == 8
        assert all(0.0 <= x < 1.0 for x in r.features)
    assert out[1].content_sha256 == hashlib.sha256(b"fake-image-bytes").hexdigest()
    assert out[2].n_bytes == len(b"fake-audio-bytes-longer")


def test_extract_features_deterministic(spark, media):
    a = sorted(mm.extract_features(media, dim=4).collect())
    b = sorted(mm.extract_features(media, dim=4).collect())
    assert a == b


def test_real_decode_raises_decode_unavailable(spark, media):
    # eager: raised at plan-build time, not wrapped in an executor
    # exception at first action (and never silently skipped on empty
    # input). Only meaningful in codec-less containers — with a codec
    # importable the real path activates instead (tested below).
    if mm._image_codec() is not None or mm._audio_codec() is not None:
        pytest.skip("a media codec is importable: real decode active")
    with pytest.raises(mm.DecodeUnavailable):
        mm.extract_features(media, fake_decode=False)


def test_frame_sample_plan(spark, media):
    rows = mm.frame_sample_plan(media, every_ms=1000).collect()
    # only the video row (3.5 s) expands: frames at 0, 1000, 2000 ms
    assert {r.media_id for r in rows} == {3}
    assert sorted(r.frame_ts_ms for r in rows) == [0, 1000, 2000]


def test_media_stats_prunes_binary_column(spark, media):
    # pruning is visible on a file scan (ReadSchema), not a local
    # relation — stage the table as parquet first
    import tempfile

    path = tempfile.mkdtemp(prefix="media_") + "/media"
    media.write.parquet(path)
    stats = mm.media_stats(spark.read.parquet(path))
    assert {r.media_type: r.n for r in stats.collect()} == {
        "image": 1, "audio": 1, "video": 1,
    }
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all(
        "content" not in ln for ln in read_schema
    ), "binary column must be pruned from metadata scans"


def test_resize_images_only_images_and_sized_output(spark, media):
    out = {r.media_id: r for r in mm.resize_images(media, 8, 8).collect()}
    # only the image row survives the pre-Python filter
    assert set(out) == {1}
    r = out[1]
    assert (r.width, r.height) == (8, 8)
    assert r.n_bytes == 3 * 8 * 8
    assert len(bytes(r.content)) == r.n_bytes
    # deterministic kernel
    again = {r.media_id: bytes(r.content) for r in mm.resize_images(media, 8, 8).collect()}
    assert again[1] == bytes(r.content)


def test_resize_real_decode_raises(spark, media):
    if mm._image_codec() is not None:
        pytest.skip("Pillow is importable: real decode active")
    with pytest.raises(mm.DecodeUnavailable):
        mm.resize_images(media, 8, 8, fake_decode=False)
    # eager even when the input has no image rows at all
    no_images = media.filter(F.col("meta.media_type") == "audio")
    with pytest.raises(mm.DecodeUnavailable):
        mm.resize_images(no_images, 8, 8, fake_decode=False)


def _png_bytes(w: int, h: int) -> bytes:
    """A tiny real PNG via Pillow (caller importorskips)."""
    import io

    from PIL import Image

    im = Image.new("RGB", (w, h), (200, 30, 90))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()


def test_resize_images_real_pil_roundtrip(spark):
    # runs wherever Pillow exists (skipped in codec-less containers);
    # the fake-kernel tests above pin the plumbing either way
    pytest.importorskip("PIL")
    png = _png_bytes(32, 20)
    df = spark.createDataFrame(
        [(1, png, ("image", "png", 32, 20, None, None))], mm.MEDIA_SCHEMA
    )
    [r] = mm.resize_images(df, 8, 8, fake_decode=False).collect()
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(bytes(r.content))) as im:
        assert im.size == (8, 8)
    assert (r.width, r.height) == (8, 8)


def test_extract_features_real_pil(spark):
    pytest.importorskip("PIL")
    png = _png_bytes(16, 16)
    df = spark.createDataFrame(
        [(1, png, ("image", "png", 16, 16, None, None)),
         (2, b"not-an-image", ("image", "png", 1, 1, None, None)),
         (3, b"some-video", ("video", "mp4", 8, 8, 1000, None))],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r.features for r in mm.extract_features(
        df, dim=8, fake_decode=False).collect()}
    assert len(out[1]) == 8 and all(0.0 <= x <= 1.0 for x in out[1])
    assert out[2] is None  # failed decode -> NULL, not a job abort
    assert out[3] is None  # undecodable type -> NULL


def test_audio_chunk_plan(spark, media):
    rows = mm.audio_chunk_plan(media, chunk_ms=2000).collect()
    # only the audio row (5000 ms) -> chunks [0,2000),[2000,4000),[4000,5000)
    assert {r.media_id for r in rows} == {2}
    chunks = sorted((r.chunk_no, r.start_ms, r.end_ms, r.n_samples) for r in rows)
    assert chunks == [
        (0, 0, 2000, 32000),
        (1, 2000, 4000, 32000),
        (2, 4000, 5000, 16000),
    ]


def test_audio_chunk_plan_never_reads_blob(spark, media):
    # pruning is visible on a file scan (ReadSchema), not a local relation
    import tempfile

    path = tempfile.mkdtemp(prefix="media_chunk_") + "/media"
    media.write.parquet(path)
    plan = (
        mm.audio_chunk_plan(spark.read.parquet(path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("content" not in ln for ln in read_schema)


def test_audio_chunk_plan_excludes_null_and_nonpositive_durations(spark):
    rows = [
        (10, b"x", ("audio", "wav", None, None, None, 16000)),    # NULL dur
        (11, b"y", ("audio", "wav", None, None, -100, 16000)),    # corrupt
        (12, b"z", ("audio", "wav", None, None, 0, 16000)),       # zero
        (13, b"w", ("audio", "wav", None, None, 1000, 16000)),    # good
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.audio_chunk_plan(df, chunk_ms=2000).collect()
    assert {r.media_id for r in out} == {13}
    [r] = out
    assert (r.start_ms, r.end_ms, r.n_samples) == (0, 1000, 16000)


def test_audio_chunk_plan_null_sample_rate_yields_null_n_samples(spark):
    # unknown/corrupt sample rate: time boundaries are still planned
    # (they are decodable downstream) but n_samples must be NULL, never
    # fabricated from a NULL or non-positive rate
    rows = [
        (20, b"a", ("audio", "wav", None, None, 3000, None)),   # NULL sr
        (21, b"b", ("audio", "wav", None, None, 3000, 0)),      # zero sr
        (22, b"c", ("audio", "wav", None, None, 3000, -8000)),  # negative sr
        (23, b"d", ("audio", "wav", None, None, 3000, 8000)),   # good
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.audio_chunk_plan(df, chunk_ms=2000).collect()
    assert {r.media_id for r in out} == {20, 21, 22, 23}
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    for mid in (20, 21, 22):
        assert all(r.n_samples is None for r in by_id[mid])
        assert sorted((r.start_ms, r.end_ms) for r in by_id[mid]) == [
            (0, 2000),
            (2000, 3000),
        ]
    assert sorted((r.start_ms, r.end_ms, r.n_samples) for r in by_id[23]) == [
        (0, 2000, 16000),
        (2000, 3000, 8000),
    ]


def _wav_bytes(samples, rate=16000, width=2):
    """Pure-stdlib PCM WAV encoder: the fixture that lets the REAL
    audio kernel run without the C soundfile library (VERDICT r5 #8).
    ``samples`` are floats in [-1, 1)."""
    import struct
    import wave
    from io import BytesIO

    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(
            b"".join(struct.pack("<h", int(s * 32767)) for s in samples)
        )
    return buf.getvalue()


def test_extract_features_real_audio_wav(spark):
    """The real audio kernel (RMS envelope per chunk) on a stdlib-
    encoded WAV: first half silence, second half full-scale square
    wave — the envelope must be ~0 then ~1, decoded for real (no
    soundfile needed: the stdlib-wave shim carries PCM WAV)."""
    n = 1600
    samples = [0.0] * n + [0.999 if i % 2 == 0 else -0.999 for i in range(n)]
    wav = _wav_bytes(samples)
    df = spark.createDataFrame(
        [(1, wav, ("audio", "wav", None, None, 200, 16000)),
         (2, b"not-audio", ("audio", "wav", None, None, 10, 16000))],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r.features for r in mm.extract_features(
        df, dim=8, fake_decode=False).collect()}
    feats = out[1]
    assert len(feats) == 8
    assert all(f < 0.01 for f in feats[:4]), feats
    assert all(0.95 < f <= 1.0 for f in feats[4:]), feats
    assert out[2] is None  # undecodable bytes -> NULL, not a job abort


def test_stdlib_wav_shim_matches_contract():
    """The shim's read() output shape/normalization matches what the
    kernel expects from soundfile: float array in [-1, 1), sample rate
    as the second element; stereo reshapes to (n, 2)."""
    from io import BytesIO

    import numpy as np

    mono = _wav_bytes([0.5, -0.5, 0.25, -0.25], rate=8000)
    data, rate = mm._StdlibWavCodec.read(BytesIO(mono))
    assert rate == 8000
    assert data.ndim == 1 and len(data) == 4
    assert abs(data[0] - 0.5) < 1e-3 and abs(data[1] + 0.5) < 1e-3

    # stereo: interleaved frames reshape to (n_frames, channels)
    import struct
    import wave

    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 16384, -16384, 8192, -8192))
    data, rate = mm._StdlibWavCodec.read(BytesIO(buf.getvalue()))
    assert data.shape == (2, 2)
    assert abs(float(np.mean(np.abs(data))) - 0.375) < 1e-3
