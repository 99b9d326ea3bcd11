"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched pandas iterators.

LLM-pipeline extension (BASELINE.json north star). The Spark-side design
is fully real — schemas, partition-aware batch iteration, mapInPandas
signatures, metadata propagation. The codec is tiered: PIL when
importable; a REAL pure-numpy pixel decoder for formats that need no
media library — PPM P6 and 24-bit BMP (raw pixel arrays behind public
headers) and, since r6, non-interlaced 8-bit PNG (gray/RGB/RGBA:
stdlib zlib inflate + full five-filter scanline reconstruction per the
PNG spec §9) — so decode and nearest-neighbor resize are pixel-real
for the dominant lossless format; a clearly-labeled deterministic
byte-stub only for the remaining compressed codecs (JPEG/video) in
this library-less environment.

Scale notes: media bytes never leave the executor — mapInPandas streams
Arrow record batches through Python, so per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; metadata-only operations
(filtering by width, sampling by duration) are pure column expressions and
never touch the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata schema carried next to every media blob.
MEDIA_SCHEMA = (
    "media_id bigint, content binary, media_type string, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_SCHEMA = (
    "media_id bigint, media_type string, n_bytes bigint, "
    "byte_entropy double, feature array<float>"
)

FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_ms int, frame binary"
)


_CODEC: str | None = None


def codec_capability() -> str:
    """Probe the available image codec ONCE per process: ``"pil"`` when a
    real decoder is importable, else ``"stub"`` — logged (not silent) so a
    pipeline run on a stub-decoding cluster is visibly flagged in the
    executor logs exactly once, not per batch.

    The probe runs independently on the driver and on each Python worker
    (module globals are per-process); both cache the answer."""
    global _CODEC
    if _CODEC is None:
        try:
            import PIL.Image  # noqa: F401

            _CODEC = "pil"
        except ImportError:
            _CODEC = "stub"
            import logging

            logging.getLogger(__name__).warning(
                "multimodal codec: PIL not importable — PPM P6, 24-bit BMP "
                "and non-interlaced 8-bit PNG still decode for real via the "
                "pure-numpy path; remaining compressed codecs (JPEG/video) "
                "fall back to the deterministic byte-stub (features "
                "byte-derived, not pixel-derived)"
            )
    return _CODEC


def _decode(content: bytes) -> dict:
    """Dispatch: PIL when importable; else the pure-numpy decoder for
    UNCOMPRESSED formats (PPM P6, 24-bit BMP) — a real pixel decode, no
    media library needed; else the byte-stub (compressed codecs only)."""
    if codec_capability() == "pil":
        return _decode_pil(content)
    if content is not None:
        decoded = _decode_numpy(content)
        if decoded is not None:
            return decoded
    return _decode_stub(content)


def _luma_stats(rgb, n_bytes: int) -> dict:
    """Grayscale conversion + entropy, replicating PIL's convert("L")
    integer luminance (ITU-R 601-2: L = (299R + 587G + 114B) // 1000) so
    the numpy and PIL tiers produce identical stats on the same pixels."""
    import numpy as np

    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    luma = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8).ravel()
    n = max(luma.size, 1)
    counts = np.bincount(luma, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum()) if p.size else 0.0
    return {"n_bytes": n_bytes, "byte_entropy": entropy}


def _decode_numpy(content: bytes) -> dict | None:
    """Pure-numpy pixel decode for library-free image formats — PPM (P6,
    8-bit), BMP (24-bit, BI_RGB), and non-interlaced 8-bit PNG (stdlib
    zlib). No media library is required; the decode is REAL (pixel-level
    stats, not byte-level). Returns None for anything else (JPEG/video →
    PIL tier or the labeled stub)."""
    rgb = _decode_numpy_pixels(content)
    return None if rgb is None else _luma_stats(rgb, len(content))


def _decode_numpy_pixels(content: bytes):
    """The pixel-array core of the numpy tier: h×w×3 uint8 RGB, or None
    when the blob isn't an uncompressed format this tier understands."""
    import numpy as np

    try:
        if content[:2] == b"P6":
            pos, vals = 2, []
            while len(vals) < 3:
                while pos < len(content) and content[pos : pos + 1].isspace():
                    pos += 1
                if content[pos : pos + 1] == b"#":
                    pos = content.index(b"\n", pos) + 1
                    continue
                start = pos
                while pos < len(content) and not content[pos : pos + 1].isspace():
                    pos += 1
                vals.append(int(content[start:pos]))
            pos += 1  # the single whitespace byte after maxval
            w, h, maxval = vals
            if maxval != 255 or w <= 0 or h <= 0:
                return None
            rgb = np.frombuffer(content, np.uint8, count=w * h * 3, offset=pos)
            return rgb.reshape(h, w, 3)
        if content[:8] == _PNG_SIG:
            return _decode_png_pixels(content)
        if content[:2] == b"BM":
            off = int.from_bytes(content[10:14], "little")
            w = int.from_bytes(content[18:22], "little", signed=True)
            h = int.from_bytes(content[22:26], "little", signed=True)
            bpp = int.from_bytes(content[28:30], "little")
            comp = int.from_bytes(content[30:34], "little")
            if bpp != 24 or comp != 0 or w <= 0 or h == 0:
                return None
            stride = (w * 3 + 3) // 4 * 4
            rows = abs(h)
            raw = np.frombuffer(content, np.uint8, count=stride * rows, offset=off)
            bgr = raw.reshape(rows, stride)[:, : w * 3].reshape(rows, w, 3)
            if h > 0:  # bottom-up storage
                bgr = bgr[::-1]
            return np.ascontiguousarray(bgr[..., ::-1])
    except (ValueError, IndexError):
        return None  # truncated/corrupt header — not decodable here
    return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_pixels(content: bytes):
    """Real PNG decode with no media library: stdlib zlib inflate + the
    five scanline filters of PNG spec §9 (None/Sub/Up/Average/Paeth).
    Supports the dominant archival shapes — non-interlaced, 8-bit depth,
    color types 0 (gray), 2 (truecolor), 6 (truecolor+alpha; alpha is
    dropped, matching PIL's RGB conversion before convert("L")). Returns
    h×w×3 uint8 or None (Adam7/16-bit/palette → PIL tier or stub).

    Sub is vectorized as a wrapping per-byte-lane cumsum and Up as one
    row add; Average/Paeth carry a true left-and-up recurrence, so those
    rows reconstruct via a per-byte loop — real decode beats fake speed
    in this library-less tier, and PIL takes over when importable."""
    import zlib

    import numpy as np

    pos = 8
    w = h = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(content):
        size = int.from_bytes(content[pos : pos + 4], "big")
        cid = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"IHDR":
            if len(body) < 13:
                return None
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, comp, filt, interlace = body[8:13]
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                return None
            channels = {0: 1, 2: 3, 6: 4}.get(ctype)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + size  # length + type + body + crc
    if not channels or not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None  # truncated/corrupt deflate stream
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    bpp = channels
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    at = 0
    for y in range(h):
        f = raw[at]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=at + 1)
        at += stride + 1
        if f == 0:
            line = row.copy()
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] — a wrapping
            # cumsum along each byte lane (mod-256 addition is associative)
            lanes = row.reshape(w, bpp).astype(np.uint64)
            line = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 add wraps natively
            line = row + prev
        elif f == 3:  # Average — left-dependency forces the scalar loop
            line = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(row[i]) + pred) & 0xFF
        else:
            return None  # invalid filter byte — corrupt stream
        recon[y] = line
        prev = line
    px = recon.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def _decode_pil(content: bytes) -> dict:  # pragma: no cover — PIL absent here
    """Real decode path: pixel-level stats via PIL. Same output keys as the
    stub so the Spark-side schema is identical either way."""
    if content is None:
        raise NotImplementedError("cannot decode a NULL blob")
    import io

    import numpy as np
    from PIL import Image

    with Image.open(io.BytesIO(content)) as img:
        arr = np.asarray(img.convert("L"), dtype=np.uint8).ravel()
    n = max(arr.size, 1)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum()) if p.size else 0.0
    return {"n_bytes": len(content), "byte_entropy": entropy}


def _decode_stub(content: bytes) -> dict:
    """Deterministic fake decode — stands in for PIL/ffmpeg (not installed
    here). Derives stable pseudo-features from the raw bytes so tests are
    reproducible. Replace with a real codec in production.

    The per-byte work is numpy-vectorized (bincount + masked log2): the
    Python interpreter touches each BLOB once, never each byte."""
    if content is None:
        raise NotImplementedError("real media decoding requires PIL/ffmpeg")
    import numpy as np

    arr = np.frombuffer(content, dtype=np.uint8)
    n = max(arr.size, 1)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum()) if p.size else 0.0
    return {"n_bytes": len(content), "byte_entropy": entropy}


AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples bigint, duration_ms int, "
    "rms double, zero_crossing_rate double, peak double"
)


def _decode_wav(content: bytes):
    """Pure-numpy decode of uncompressed PCM WAV (RIFF, format 1, 16-bit):
    (sample_rate, mono float64 samples in [-1, 1]) or None when the blob
    isn't such a WAV. Like PPM/BMP, PCM WAV is a raw sample array behind
    a public chunked header — real audio decode, no ffmpeg required.
    Multi-channel input is averaged to mono (the standard feature prep)."""
    import numpy as np

    try:
        if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
            return None
        pos, rate, channels, bits, data = 12, None, None, None, None
        while pos + 8 <= len(content):
            cid = content[pos : pos + 4]
            size = int.from_bytes(content[pos + 4 : pos + 8], "little")
            body = content[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                if int.from_bytes(body[0:2], "little") != 1:  # PCM only
                    return None
                channels = int.from_bytes(body[2:4], "little")
                rate = int.from_bytes(body[4:8], "little")
                bits = int.from_bytes(body[14:16], "little")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or data is None or bits != 16 or not channels:
            return None
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        if channels > 1:
            samples = samples[: len(samples) // channels * channels]
            samples = samples.reshape(-1, channels).mean(axis=1)
        return rate, samples
    except (ValueError, IndexError):
        return None


def audio_features(df: DataFrame) -> DataFrame:
    """Per-blob audio features via mapInPandas: sample rate, duration,
    RMS level, zero-crossing rate, peak — the audio-quality filters a
    speech/music curation pipeline runs before transcription. REAL for
    PCM WAV via the numpy tier; non-WAV blobs yield a null feature row
    (schema-stable) rather than fake numbers, so downstream filters can
    route them to a transcoder."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "duration_ms",
                "rms", "zero_crossing_rate", "peak",
            )}
            for media_id, content in zip(
                pdf["media_id"].tolist(), pdf["content"].tolist()
            ):
                decoded = None if content is None else _decode_wav(content)
                out["media_id"].append(media_id)
                if decoded is None:
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "rms", "zero_crossing_rate", "peak"):
                        out[k].append(None)
                    continue
                rate, s = decoded
                n = len(s)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(int(n * 1000 / rate) if rate else None)
                out["rms"].append(float(np.sqrt(np.mean(s * s))) if n else 0.0)
                out["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                    if n > 1
                    else 0.0
                )
                out["peak"].append(float(np.abs(s).max()) if n else 0.0)
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("media_type") == "audio")
        .select("media_id", "content")
        .mapInPandas(batches, AUDIO_SCHEMA)
    )


def extract_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Per-blob feature extraction via mapInPandas (Arrow-batched).

    Emits (media_id, media_type, n_bytes, byte_entropy, feature) where
    ``feature`` is a deterministic pseudo-embedding of the bytes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Columnar batch construction: one Python-level pass per blob for
        # the codec call (unavoidable — a real decoder is per-blob too),
        # numpy for all per-byte math, no iterrows/per-cell dict building.
        for pdf in it:
            contents = pdf["content"].tolist()
            stats = [_decode(c) for c in contents]
            seeds = [
                int.from_bytes((c or b"\x00")[:8].ljust(8, b"\x00"), "big")
                for c in contents
            ]
            features = [
                [((s >> (8 * (i % 8))) & 0xFF) / 255.0 for i in range(feature_dim)]
                for s in seeds
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": [s["n_bytes"] for s in stats],
                    "byte_entropy": [s["byte_entropy"] for s in stats],
                    "feature": features,
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled frame.

    The stub emits byte-slices as fake frames; the row-explosion shape,
    schema, and batch iteration are the real production plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, mss, frames = [], [], [], []
            for media_id, duration, content in zip(
                pdf["media_id"].tolist(), pdf["duration_ms"].tolist(), pdf["content"].tolist()
            ):
                duration = int(duration or 0)
                content = content or b""
                n_frames = max(duration // every_ms, 1)
                for i in range(n_frames):
                    lo = (i * len(content)) // n_frames
                    hi = ((i + 1) * len(content)) // n_frames
                    ids.append(media_id)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    frames.append(content[lo:hi])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_ms": mss, "frame": frames}
            )

    return df.filter(F.col("media_type") == "video").mapInPandas(batches, FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, media_type string, content binary, width int, height int"
)


def _encode_ppm(rgb) -> bytes:
    """Minimal P6 encode of an h×w×3 uint8 array — the numpy tier's
    output format (raw pixels, public header, re-decodable by this same
    module)."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def resize_images(df: DataFrame, max_width: int = 256, max_height: int = 256) -> DataFrame:
    """Aspect-preserving image resize via mapInPandas (Arrow-batched).

    Blobs the pure-numpy tier can decode (PPM P6 / 24-bit BMP) are
    resized for REAL — nearest-neighbor index sampling on the pixel
    array, re-encoded as P6 — with dimensions taken from the actual
    pixels, not the metadata. Compressed codecs fall back to the
    deterministic byte-slice stub (standing in for PIL, not installed
    here); the schema, batch iteration, and aspect math are identical
    either way. Only image rows are touched; the scan prunes other media
    types before any blob is read.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, blobs, widths, heights = [], [], [], [], []
            for media_id, mtype, content, w, h in zip(
                pdf["media_id"].tolist(),
                pdf["media_type"].tolist(),
                pdf["content"].tolist(),
                pdf["width"].tolist(),
                pdf["height"].tolist(),
            ):
                rgb = None if content is None else _decode_numpy_pixels(content)
                if rgb is not None:
                    # trust the pixels over the metadata columns
                    h, w = rgb.shape[:2]
                w = int(w or 0)
                h = int(h or 0)
                if w <= max_width and h <= max_height:
                    new_w, new_h, blob = w, h, content
                else:
                    scale = min(max_width / max(w, 1), max_height / max(h, 1))
                    new_w, new_h = max(int(w * scale), 1), max(int(h * scale), 1)
                    if rgb is not None:
                        yi = (np.arange(new_h) * h) // new_h
                        xi = (np.arange(new_w) * w) // new_w
                        blob = _encode_ppm(rgb[yi][:, xi])
                    else:
                        # stub: shrink the byte payload proportionally to
                        # the pixel count; a real decoder re-encodes
                        content = content or b""
                        keep = max(
                            int(len(content) * (new_w * new_h) / max(w * h, 1)), 1
                        )
                        blob = content[:keep]
                ids.append(media_id)
                types.append(mtype)
                blobs.append(blob)
                widths.append(new_w)
                heights.append(new_h)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": types,
                    "content": blobs,
                    "width": widths,
                    "height": heights,
                }
            )

    return (
        df.filter(F.col("media_type") == "image")
        .select("media_id", "media_type", "content", "width", "height")
        .mapInPandas(batches, RESIZED_SCHEMA)
    )


def metadata_filter(
    df: DataFrame,
    min_width: int | None = None,
    min_height: int | None = None,
    max_duration_ms: int | None = None,
) -> DataFrame:
    """Metadata-only predicate — prunes blobs without reading them (column
    pruning keeps ``content`` out of the scan when downstream allows)."""
    out = df
    if min_width is not None:
        out = out.filter(F.col("width") >= min_width)
    if min_height is not None:
        out = out.filter(F.col("height") >= min_height)
    if max_duration_ms is not None:
        out = out.filter(F.col("duration_ms") <= max_duration_ms)
    return out
