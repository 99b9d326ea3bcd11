"""Streaming ETL (CloudTrail shape) and multimodal plumbing tests."""

from __future__ import annotations

import json

from data_pipelines_examples_spark.operators.multimodal import (
    extract_features,
    metadata_filter,
    sample_frames,
)
from data_pipelines_examples_spark.streaming.pipeline import (
    flatten_records,
    read_file_stream,
    write_partitioned_stream,
)

EVENT_SCHEMA = (
    "Records array<struct<eventTime:string, eventType:string, eventSource:string,"
    " eventName:string, requestParameters:map<string,string>>>"
)


def _write_event_files(path, n_files=3, per_file=4):
    path.mkdir(parents=True, exist_ok=True)
    for f in range(n_files):
        recs = [
            {
                "eventTime": f"2024-01-0{f+1}T00:0{i}:00",
                "eventType": "AwsApiCall",
                "eventSource": "s3.amazonaws.com",
                "eventName": "PutObject",
                "requestParameters": {"bucketName": f"b{i}"},
            }
            for i in range(per_file)
        ]
        (path / f"part-{f}.json").write_text(
            "\n".join(json.dumps({"Records": recs}) for _ in range(1))
        )


def test_stream_etl_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    _write_event_files(src)
    stream = read_file_stream(spark, str(src), EVENT_SCHEMA, max_files_per_trigger=2)
    assert stream.isStreaming
    flat = flatten_records(stream)
    q = write_partitioned_stream(
        flat,
        str(tmp_path / "sink"),
        str(tmp_path / "ckpt"),
        trigger_seconds=1,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == 12  # 3 files × 4 records
    assert "date" in out.columns
    # concurrent batch query over the live sink path (ST4)
    assert out.groupBy("eventName").count().first()["count"] == 12


def test_flatten_records_batch_equivalence(spark, tmp_path):
    """Same transform code works on a batch read (stream/batch unification)."""
    src = tmp_path / "src"
    _write_event_files(src, n_files=1)
    batch = spark.read.schema(EVENT_SCHEMA).json(str(src))
    flat = flatten_records(batch)
    rows = flat.collect()
    assert len(rows) == 4 and all(r.date is not None for r in rows)


def test_windowed_distinct_users_stream(spark, tmp_path):
    """ST5: watermarked sliding-window approx-distinct on a stream."""
    import json as _json

    from data_pipelines_examples_spark.streaming.pipeline import windowed_distinct_users

    src = tmp_path / "ev"
    src.mkdir()
    rows = [
        {"user_id": u, "timestamp": f"2024-01-01T00:{m:02d}:00"}
        for m, u in [(0, 1), (1, 2), (2, 1), (12, 3)]
    ]
    (src / "a.json").write_text("\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("user_id bigint, timestamp timestamp").json(str(src))
    agg = windowed_distinct_users(stream, window="10 minutes", slide="5 minutes")
    # complete mode: emit current state of every window (append would hold
    # windows back until the watermark passes their end — correct for
    # production, inconvenient for a single-batch test)
    q = (
        agg.writeStream.format("memory")
        .queryName("wdu")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r.window.start.isoformat(), r.approx_users)
        for r in spark.table("wdu").collect()
    }
    # sliding 10min/5min: the 23:55-00:05 window holds users {1,2};
    # 00:00-00:10 holds {1,2}; 00:05-00:15 holds {3}
    assert ("2023-12-31T23:55:00", 2) in out
    assert ("2024-01-01T00:00:00", 2) in out
    assert ("2024-01-01T00:05:00", 1) in out


def _media(spark):
    rows = [
        (1, b"image-bytes-aaaa", "image", 64, 48, None, "png"),
        (2, b"video-bytes-" + bytes(range(40)), "video", 640, 480, 3000, "h264"),
        (3, b"tiny", "image", 8, 8, None, "png"),
    ]
    from data_pipelines_examples_spark.operators.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(spark):
    df = _media(spark)
    out1 = extract_features(df).collect()
    out2 = extract_features(df).collect()
    assert sorted(map(str, out1)) == sorted(map(str, out2))
    by_id = {r.media_id: r for r in out1}
    assert by_id[1].n_bytes == 16
    assert len(by_id[1].feature) == 8
    assert all(0.0 <= v <= 1.0 for v in by_id[1].feature)


def test_sample_frames(spark):
    out = sample_frames(_media(spark), every_ms=1000).collect()
    assert {r.media_id for r in out} == {2}
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 1, 2]
    assert b"".join(r.frame for r in sorted(out, key=lambda r: r.frame_idx)) == (
        b"video-bytes-" + bytes(range(40))
    )


def test_metadata_filter_prunes_without_decode(spark):
    out = metadata_filter(_media(spark), min_width=32)
    assert sorted(r.media_id for r in out.collect()) == [1, 2]


def test_resize_images_aspect_preserving(spark):
    from data_pipelines_examples_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(_media(spark), 32, 32).collect()}
    # only image rows; video excluded before any blob is touched
    assert set(out) == {1, 3}
    # 64x48 scaled by min(32/64, 32/48) = 0.5 -> 32x24
    assert (out[1].width, out[1].height) == (32, 24)
    # payload shrunk proportionally to pixel count (stub codec)
    assert 0 < len(out[1].content) < 16
    # already within bounds: untouched
    assert (out[3].width, out[3].height) == (8, 8)
    assert out[3].content == b"tiny"


def test_codec_capability_probe(caplog):
    """In this env PIL is absent: the probe reports 'stub', warns exactly
    once per process (cached), and _decode dispatches accordingly."""
    import importlib
    import logging

    from data_pipelines_examples_spark.operators import multimodal as mm

    importlib.reload(mm)  # reset the per-process cache for the test
    with caplog.at_level(logging.WARNING, logger=mm.__name__):
        assert mm.codec_capability() == "stub"
        assert mm.codec_capability() == "stub"
    warnings = [r for r in caplog.records if "byte-stub" in r.message]
    assert len(warnings) == 1, "stub fallback must be logged exactly once"
    # dispatch honors a (faked) real codec
    mm._CODEC = "pil"
    called = []
    orig = mm._decode_pil
    mm._decode_pil = lambda c: called.append(c) or {"n_bytes": 1, "byte_entropy": 0.0}
    try:
        assert mm._decode(b"xx")["n_bytes"] == 1 and called == [b"xx"]
    finally:
        mm._decode_pil = orig
        mm._CODEC = None


def _ppm_bytes(pixels):
    """pixels: list of rows of (r,g,b)."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(c for row in pixels for px in row for c in px)
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + body


def _bmp_bytes(pixels):
    """24-bit BI_RGB bottom-up BMP of the same pixel grid."""
    h, w = len(pixels), len(pixels[0])
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for row in reversed(pixels):  # bottom-up
        r = bytes(c for (rr, gg, bb) in row for c in (bb, gg, rr))  # BGR
        rows.append(r + b"\x00" * (stride - len(r)))
    body = b"".join(rows)
    off = 54
    size = off + len(body)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def test_numpy_decode_real_pixels_ppm_bmp_agree(spark):
    """The pure-numpy decoder must be a REAL pixel decode: the same pixel
    grid encoded as PPM and as BMP (different byte layouts, padding,
    row order, channel order) must yield IDENTICAL pixel-entropy — while
    the byte-stub over those same blobs would differ (headers/padding)."""
    from data_pipelines_examples_spark.operators.multimodal import (
        _decode_numpy,
        _decode_stub,
        extract_features,
    )

    import random

    rng = random.Random(5)
    pixels = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(5)]
        for _ in range(4)
    ]
    ppm, bmp = _ppm_bytes(pixels), _bmp_bytes(pixels)
    d_ppm, d_bmp = _decode_numpy(ppm), _decode_numpy(bmp)
    assert d_ppm is not None and d_bmp is not None
    assert d_ppm["byte_entropy"] == d_bmp["byte_entropy"]  # same pixels
    assert d_ppm["n_bytes"] == len(ppm) and d_bmp["n_bytes"] == len(bmp)
    # byte-stub on the raw blobs disagrees — proof the decode is pixel-level
    assert _decode_stub(ppm)["byte_entropy"] != _decode_stub(bmp)["byte_entropy"]
    # compressed magic (JPEG SOI) is not claimed by the numpy tier
    assert _decode_numpy(b"\xff\xd8\xff\xe0" + b"\x00" * 64) is None

    # end-to-end through the Arrow pipeline
    rows = [
        (1, ppm, "image", 5, 4, None, "ppm"),
        (2, bmp, "image", 5, 4, None, "bmp"),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, content binary, media_type string, width int,"
        " height int, duration_ms int, codec string",
    )
    out = {r.media_id: r.byte_entropy for r in extract_features(df).collect()}
    assert out[1] == out[2] == d_ppm["byte_entropy"]


def test_resize_real_pixels_for_decodable_blobs(spark):
    """A decodable blob gets a REAL nearest-neighbor resize: output is a
    P6 whose pixels equal index-sampling of the source grid."""
    from data_pipelines_examples_spark.operators.multimodal import (
        _decode_numpy_pixels,
        resize_images,
    )

    # 8×6 gradient image: pixel (x, y) = (x*30, y*40, 7)
    pixels = [[(x * 30, y * 40, 7) for x in range(8)] for y in range(6)]
    ppm = _ppm_bytes(pixels)
    df = spark.createDataFrame(
        [(1, ppm, "image", 8, 6, None, "ppm")],
        "media_id bigint, content binary, media_type string, width int,"
        " height int, duration_ms int, codec string",
    )
    out = resize_images(df, max_width=4, max_height=4).collect()[0]
    assert (out.width, out.height) == (4, 3)
    rgb = _decode_numpy_pixels(bytes(out.content))
    assert rgb is not None and rgb.shape == (3, 4, 3)
    # nearest-neighbor: out[y, x] = src[y*6//3, x*8//4]
    for y in range(3):
        for x in range(4):
            assert tuple(rgb[y, x]) == pixels[y * 6 // 3][x * 8 // 4]
    # already-small image passes through untouched
    small = resize_images(df, max_width=16, max_height=16).collect()[0]
    assert bytes(small.content) == ppm


def _wav_bytes(rate, samples16, channels=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples16)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_audio_features_real_wav_decode(spark):
    import math

    # 100 Hz square wave at 8 kHz, 0.5 amplitude, 400 samples (50 ms)
    rate, n = 8000, 400
    sq = [16384 if (i // 40) % 2 == 0 else -16384 for i in range(n)]
    wav = _wav_bytes(rate, sq)
    # stereo: same wave on both channels -> identical mono features
    stereo = _wav_bytes(rate, [s for s in sq for _ in (0, 1)], channels=2)
    from data_pipelines_examples_spark.operators.multimodal import audio_features

    rows = [
        (1, wav, "audio", None, None, 50, "wav"),
        (2, stereo, "audio", None, None, 50, "wav"),
        (3, b"\xffnotawav" + b"\x00" * 40, "audio", None, None, 10, "opus"),
        (4, wav, "image", None, None, None, "wav"),  # wrong type -> pruned
    ]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, content binary, media_type string, width int,"
        " height int, duration_ms int, codec string",
    )
    out = {r.media_id: r for r in audio_features(df).collect()}
    assert set(out) == {1, 2, 3}
    r1 = out[1]
    assert (r1.sample_rate, r1.n_samples, r1.duration_ms) == (8000, 400, 50)
    assert math.isclose(r1.rms, 0.5, rel_tol=1e-9)  # square wave RMS = amplitude
    assert math.isclose(r1.peak, 0.5, rel_tol=1e-9)
    # square wave at 100 Hz: 10 sign flips in 400 samples -> zcr ~ 9/399
    assert math.isclose(r1.zero_crossing_rate, 9 / 399, rel_tol=1e-9)
    r2 = out[2]
    assert (r2.rms, r2.peak, r2.zero_crossing_rate) == (r1.rms, r1.peak, r1.zero_crossing_rate)
    assert out[3].sample_rate is None  # non-WAV -> null row, not fake numbers


# ---------------------------------------------------------------------------
# Round-6: real PNG decode (stdlib zlib + five-filter reconstruction)
# ---------------------------------------------------------------------------


def _png_bytes(pixels, filters=None, color_type=2, interlace=0, depth=8):
    """Spec-compliant PNG encoder for tests: per-scanline filter choice
    (0-4, applied per PNG spec §9 so the decoder must INVERT them), real
    CRCs, single IDAT. pixels: rows of (r,g,b) or (r,g,b,a) or gray int."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    ch = {0: 1, 2: 3, 6: 4}[color_type]

    def px_bytes(p):
        return bytes([p]) if ch == 1 else bytes(p[:ch])

    rows = [b"".join(px_bytes(p) for p in row) for row in pixels]
    filters = filters or [0] * h
    bpp = ch
    raw = bytearray()
    prev = bytes(len(rows[0]))
    for f, row in zip(filters, rows):
        raw.append(f)
        out = bytearray()
        for i in range(len(row)):
            x = row[i]
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                out.append(x)
            elif f == 1:
                out.append((x - a) & 0xFF)
            elif f == 2:
                out.append((x - b) & 0xFF)
            elif f == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
        raw += out
        prev = row

    def chunk(cid, body):
        return (
            struct.pack(">I", len(body)) + cid + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _rand_pixels(seed, w=7, h=5, ch=3):
    import random

    rng = random.Random(seed)
    if ch == 1:
        return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    return [
        [tuple(rng.randrange(256) for _ in range(ch)) for _ in range(w)]
        for _ in range(h)
    ]


def test_png_decode_inverts_every_filter_exactly():
    """Each scanline filter (None/Sub/Up/Average/Paeth) must reconstruct
    the EXACT source pixels — compared array-to-array, not via stats."""
    import numpy as np

    from data_pipelines_examples_spark.operators.multimodal import (
        _decode_numpy_pixels,
    )

    pixels = _rand_pixels(1)
    want = np.array(pixels, dtype=np.uint8)
    for f in range(5):
        got = _decode_numpy_pixels(_png_bytes(pixels, filters=[f] * 5))
        assert got is not None, f"filter {f} not decoded"
        assert np.array_equal(got, want), f"filter {f} pixels differ"
    # mixed filters per row (what real encoders emit)
    got = _decode_numpy_pixels(_png_bytes(pixels, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(got, want)


def test_png_gray_and_rgba_decode():
    import numpy as np

    from data_pipelines_examples_spark.operators.multimodal import (
        _decode_numpy_pixels,
    )

    gray = _rand_pixels(2, ch=1)
    got = _decode_numpy_pixels(_png_bytes(gray, color_type=0, filters=[4] * 5))
    want = np.repeat(np.array(gray, np.uint8)[..., None], 3, axis=2)
    assert np.array_equal(got, want)
    rgba = _rand_pixels(3, ch=4)
    got = _decode_numpy_pixels(_png_bytes(rgba, color_type=6, filters=[1] * 5))
    want = np.array(rgba, np.uint8)[..., :3]
    assert np.array_equal(got, want)


def test_png_entropy_matches_ppm_twin():
    """The r5 verdict's done-criterion: the same pixel grid as PNG and as
    PPM must produce IDENTICAL pixel-entropy through _decode_numpy."""
    from data_pipelines_examples_spark.operators.multimodal import _decode_numpy

    pixels = _rand_pixels(4, w=9, h=6)
    png = _png_bytes(pixels, filters=[4, 3, 2, 1, 0, 4])
    ppm = _ppm_bytes(pixels)
    d_png, d_ppm = _decode_numpy(png), _decode_numpy(ppm)
    assert d_png is not None and d_ppm is not None
    assert d_png["byte_entropy"] == d_ppm["byte_entropy"]
    assert d_png["n_bytes"] == len(png)


def test_png_unsupported_shapes_fall_through():
    """Adam7, 16-bit, and corrupt deflate must return None (stub tier),
    never a wrong pixel array or an exception."""
    from data_pipelines_examples_spark.operators.multimodal import (
        _decode_numpy_pixels,
        _decode_stub,
    )

    pixels = _rand_pixels(5)
    assert _decode_numpy_pixels(_png_bytes(pixels, interlace=1)) is None
    assert _decode_numpy_pixels(_png_bytes(pixels, depth=16)) is None
    blob = bytearray(_png_bytes(pixels))
    blob[40] ^= 0xFF  # corrupt inside the IDAT deflate stream
    assert _decode_numpy_pixels(bytes(blob)) is None
    # and the stub still yields schema-stable stats for such blobs
    assert _decode_stub(bytes(blob))["n_bytes"] == len(blob)


def test_resize_png_goes_through_real_pixel_path(spark):
    """A >max PNG must be resized from its ACTUAL pixels (nearest-
    neighbor, re-encoded as P6) — identical output to the PPM twin."""
    from data_pipelines_examples_spark.operators.multimodal import resize_images

    pixels = _rand_pixels(6, w=8, h=6)
    png, ppm = _png_bytes(pixels, filters=[2] * 6), _ppm_bytes(pixels)
    df = spark.createDataFrame(
        [(1, png, "image", 8, 6, None, "png"), (2, ppm, "image", 8, 6, None, "ppm")],
        "media_id bigint, content binary, media_type string, width int,"
        " height int, duration_ms int, codec string",
    )
    out = {
        r.media_id: r
        for r in resize_images(df, max_width=4, max_height=4).collect()
    }
    assert (out[1].width, out[1].height) == (4, 3)
    assert bytes(out[1].content) == bytes(out[2].content)  # same pixels in, same P6 out
