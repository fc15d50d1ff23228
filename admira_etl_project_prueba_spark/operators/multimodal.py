"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry images/audio/video as ``binary`` columns with
a typed metadata struct alongside.  Decode coverage is tiered by what a
stdlib can honestly do:

* REAL decode (no native libs needed): WAV/PCM via ``wave``+``struct``
  (header + RMS/peak sample stats, :func:`decode_wav_features`), PNG
  via ``zlib``+``struct`` (chunk walk with CRC verification, IDAT
  inflate, scanline unfilter to pixel stats for 8-bit grayscale,
  :func:`decode_png_features`), and BASELINE SEQUENTIAL GRAYSCALE JPEG
  from scratch (segment walk, DHT canonical Huffman decode, dequant,
  numpy IDCT to pixel stats, :func:`decode_jpeg_features` — ITU T.81 is
  public; progressive scans and chroma components keep the honest
  raise); container headers (PNG/WAV/JPEG-SOF) additionally parse
  ENGINE-side with SQL byte ops (:func:`media_header_features`).
* STUBBED decode (needs PIL/ffmpeg): JPEG progressive/color, MP4
  frames — the deterministic fakes / ``NotImplementedError`` guards
  below, with the Spark-side plumbing (schema, Arrow-batched
  ``mapInPandas`` signature, batch shapes, partition behavior) real and
  tested: swapping a codec in changes only the body of the pandas
  function.

Why ``mapInPandas`` (not a scalar UDF): decode is 1→N (frames) or 1→large
(pixel tensors); an iterator of Arrow batches lets one task stream through
a partition of payloads without materializing it, the shape that survives
100 TB of video.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried next to every binary payload
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("sha256", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def documents_as_media(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Wrap the documents table as a media table (payload = utf-8 bytes).

    Stands in for `spark.read.format("binaryFile")` over an object store —
    same schema contract, derivable metadata, deterministic.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg/librosa.

    Real deployments replace this body with the native decode; everything
    around it (batching, schema, partitioning) is production-shaped.
    """
    n = len(payload)
    if media_type == "image":
        return {"width": 64 + n % 64, "height": 64 + n % 48, "n_frames": 1}
    if media_type == "video":
        return {"width": 320, "height": 240, "n_frames": 1 + n % 250}
    if media_type == "audio":
        return {"width": 0, "height": 0, "n_frames": 1 + n % 48000}
    raise NotImplementedError(f"no decoder for media_type={media_type!r}")


def extract_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Decode + featurize every payload via Arrow-batched ``mapInPandas``.

    The fake feature vector is a byte-histogram projection — deterministic,
    so tests can assert exact values; a real model swap keeps the shape.
    """

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            shapes = [
                _fake_decode(p, mt) for p, mt in zip(payloads, pdf["media_type"])
            ]
            # vectorized byte histogram: frombuffer + bincount per payload
            feats = []
            for p in payloads:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                feats.append((hist / max(len(p), 1)).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [len(p) for p in payloads],
                    "width": [s["width"] for s in shapes],
                    "height": [s["height"] for s in shapes],
                    "n_frames": [s["n_frames"] for s in shapes],
                    "feature": feats,
                },
                columns=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """1→N expansion: one row per sampled frame index (plumbing for video
    frame extraction).  Uses the decoded n_frames; the actual pixel fetch
    is the stubbed decode.  posexplode keeps the expansion declarative."""
    feats = extract_features(media)
    return feats.select(
        "doc_id",
        "media_type",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )


def media_header_features(media: DataFrame) -> DataFrame:
    """REAL container-header parsing with built-in SQL byte ops — no
    native decoder needed: PNG width/height (IHDR, big-endian at fixed
    offsets) and WAV sample-rate/channels (RIFF fmt chunk,
    little-endian) come straight out of ``substring``+``hex``+``conv``
    on the binary payload.  Row-local projection — scales like any
    other scan — and it upgrades the multimodal story from "all decode
    is stubbed" to "header metadata is engine-native; only pixel/sample
    decode awaits a real codec".

    JPEG dimensions live in a variable-position SOF segment, so they need
    a walk, not a fixed offset: a bounded ``aggregate`` over the segment
    chain (marker FF xx + big-endian length) advances pos → pos + 2 + len
    until it reaches an SOF marker (C0–CF minus the non-frame C4/C8/CC —
    baseline SOF0 and progressive SOF2 both included) and reads
    height/width from its payload.  Still row-local and exchange-free;
    the walk is capped at 32 segments and anything malformed (fill
    bytes, truncation, >32 header segments, SOS before SOF) falls back
    to honest NULL dimensions rather than a guess.
    """
    def be32(start: int) -> str:  # 1-based byte offset
        return f"CAST(conv(hex(substring(payload, {start}, 4)), 16, 10) AS INT)"

    def le(start: int, nbytes: int) -> str:
        parts = " || ".join(
            f"hex(substring(payload, {start + i}, 1))"
            for i in reversed(range(nbytes))
        )
        return f"CAST(conv({parts}, 16, 10) AS INT)"

    # SOF walk state: (pos, w, h); a terminal state parks pos at 2^30 so
    # every later iteration is a no-op (aggregate has no early exit)
    _be16 = "CAST(conv(hex(substring(payload, {p}, 2)), 16, 10) AS INT)"
    _mark = "hex(substring(payload, acc.pos + 1, 1))"
    _sof = "('C0','C1','C2','C3','C5','C6','C7','C9','CA','CB','CD','CE','CF')"
    _stop = "CAST(1073741823 AS INT)"
    jpeg_walk = f"""aggregate(
      sequence(1, 32),
      named_struct('pos', CAST(3 AS INT), 'w', CAST(NULL AS INT), 'h', CAST(NULL AS INT)),
      (acc, i) -> CASE
        WHEN acc.w IS NOT NULL OR acc.pos + 8 > length(payload)
             OR hex(substring(payload, acc.pos, 1)) <> 'FF'
             OR {_mark} IN ('DA', 'D9')
          THEN named_struct('pos', {_stop}, 'w', acc.w, 'h', acc.h)
        WHEN {_mark} IN {_sof}
          THEN named_struct('pos', {_stop},
                            'w', {_be16.format(p='acc.pos + 7')},
                            'h', {_be16.format(p='acc.pos + 5')})
        ELSE named_struct('pos', acc.pos + 2 + {_be16.format(p='acc.pos + 2')},
                          'w', CAST(NULL AS INT), 'h', CAST(NULL AS INT))
      END,
      acc -> acc)"""

    return media.selectExpr(
        "*",
        "CASE WHEN hex(substring(payload, 1, 4)) = '89504E47' THEN 'png' "
        "     WHEN hex(substring(payload, 1, 4)) = '52494646' "
        "      AND hex(substring(payload, 9, 4)) = '57415645' THEN 'wav' "
        "     WHEN hex(substring(payload, 1, 2)) = 'FFD8' THEN 'jpeg' "
        "     ELSE 'unknown' END AS container",
        f"CASE WHEN hex(substring(payload, 1, 2)) = 'FFD8' THEN {jpeg_walk} END AS _jpeg",
    ).selectExpr(
        "doc_id",
        "media_type",
        "container",
        f"CASE WHEN container = 'png' THEN {be32(17)} "
        "      WHEN container = 'jpeg' THEN _jpeg.w END AS width",
        f"CASE WHEN container = 'png' THEN {be32(21)} "
        "      WHEN container = 'jpeg' THEN _jpeg.h END AS height",
        f"CASE WHEN container = 'wav' THEN {le(25, 4)} END AS sample_rate",
        f"CASE WHEN container = 'wav' THEN {le(23, 2)} END AS n_channels",
        "length(payload) AS n_bytes",
    )


def audio_window_plan(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio analysis-window segmentation from engine-native WAV header
    fields — the audio twin of :func:`frame_sample_plan`: 1→N expansion
    of each clip into overlapping (window_ms, hop_ms) analysis windows,
    the layout every downstream feature extractor (spectrogram, VAD,
    embedding) consumes.  Only the canonical RIFF layout (16-byte fmt
    chunk, 'data' chunk immediately after) is parsed; anything else gets
    honest NULL audio fields and zero windows rather than a guess —
    the same contract as the JPEG SOF walk.

    n_samples derives from the data-chunk byte size over the frame size
    (block align); windows are emitted while start < duration, so a
    clip shorter than one window still yields its single partial
    window.  Row-local arithmetic + one explode — no exchange, scales
    like any scan.
    """
    def le(start: int, nbytes: int) -> str:
        parts = " || ".join(
            f"hex(substring(payload, {start + i}, 1))"
            for i in reversed(range(nbytes))
        )
        return f"CAST(conv({parts}, 16, 10) AS INT)"

    canonical = (
        "hex(substring(payload, 1, 4)) = '52494646'"
        " AND hex(substring(payload, 9, 4)) = '57415645'"
        f" AND {le(17, 4)} = 16"
        " AND hex(substring(payload, 37, 4)) = '64617461'"
    )
    parsed = media.selectExpr(
        "doc_id",
        f"CASE WHEN {canonical} THEN {le(25, 4)} END AS sample_rate",
        f"CASE WHEN {canonical} THEN {le(23, 2)} END AS n_channels",
        f"CASE WHEN {canonical} THEN {le(35, 2)} END AS bits_per_sample",
        f"CASE WHEN {canonical} THEN {le(41, 4)} END AS data_bytes",
    ).selectExpr(
        "doc_id",
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "CASE WHEN n_channels > 0 AND bits_per_sample > 0 THEN "
        "  CAST(data_bytes AS BIGINT) DIV (n_channels * (bits_per_sample DIV 8)) "
        "END AS n_samples",
    ).selectExpr(
        "*",
        "CASE WHEN sample_rate > 0 THEN "
        "  (n_samples * CAST(1000 AS BIGINT)) DIV sample_rate END AS duration_ms",
    )
    w, h = int(window_ms), int(hop_ms)
    return parsed.selectExpr(
        "*",
        "CASE WHEN duration_ms IS NOT NULL AND duration_ms > 0 THEN "
        f"  sequence(CAST(0 AS BIGINT), duration_ms - 1, {h}) "
        "  ELSE CAST(array() AS ARRAY<BIGINT>) END AS _starts",
    ).selectExpr(
        "doc_id",
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "n_samples",
        "duration_ms",
        "posexplode_outer(_starts) AS (window_index, start_ms)",
    ).selectExpr(
        "doc_id",
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "n_samples",
        "duration_ms",
        "window_index",
        "start_ms",
        f"CASE WHEN start_ms IS NOT NULL THEN least(start_ms + {w}, duration_ms) "
        "END AS end_ms",
    )


# ---------------------------------------------------------------------------
# REAL decoders (stdlib-only): WAV/PCM via wave+struct, PNG via zlib+struct,
# and (round-13) baseline sequential grayscale JPEG from scratch — Huffman
# entropy decode + dequant + numpy IDCT, per the public ITU T.81 spec.
# MP4 frames and JPEG progressive/chroma still require native codecs and
# keep the honest NotImplementedError.
# ---------------------------------------------------------------------------


def synthesize_wav(doc_id: int) -> bytes:
    """Deterministic 16-bit mono PCM fixture: a ±A square wave whose
    parameters are closed-form in doc_id — so an oracle can state the
    DECODED features (RMS = peak = A exactly, duration = n/8 ms) without
    ever touching the bytes.  The decode side sees only a normal WAV."""
    sr = 8000
    n = 800 + (doc_id % 7) * 160
    a = 1000 + (doc_id % 13) * 500
    import io
    import struct
    import wave

    frames = struct.pack(
        f"<{n}h", *[(a if i % 2 == 0 else -a) for i in range(n)]
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(frames)
    return buf.getvalue()


def synthesize_png(doc_id: int) -> bytes:
    """Deterministic grayscale-8 PNG fixture: pixel i = (i + doc_id) %
    256, filter 0 rows, one zlib IDAT — width/height/bit-depth and the
    pixel mean are closed-form in doc_id for the oracle."""
    import struct
    import zlib

    w = 8 + doc_id % 9
    h = 5 + doc_id % 7
    raw = b"".join(
        b"\x00" + bytes(((y * w + x + doc_id) % 256) for x in range(w))
        for y in range(h)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        body = typ + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav_features(payload: bytes) -> dict:
    """REAL WAV/PCM decode with the stdlib: header via ``wave``, sample
    statistics (RMS, peak) from the unpacked PCM frames.  16-bit mono/
    stereo PCM only — anything else raises rather than guessing."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        nf = w.getnframes()
        frames = w.readframes(nf)
    if sw != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got {sw*8}-bit")
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    return {
        "sample_rate": int(sr),
        "n_channels": int(nch),
        "n_samples": int(nf),
        "duration_ms": int(nf) * 1000 // int(sr) if sr else 0,
        "rms": rms,
        "peak": peak,
    }


def _png_unfilter(raw: bytes, w: int, h: int) -> "object":
    """Undo PNG scanline filters for 8-bit grayscale (bpp=1): returns the
    h×w pixel array.  All five filter types implemented (None/Sub/Up/
    Average/Paeth) — the fixture emits 0, but a real file may not."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    stride = w + 1
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).copy()
        prev = out[y - 1] if y else np.zeros(w, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, w):
                line[x] = (int(line[x]) + int(line[x - 1])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev) & 0xFF
            line = line.astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                line[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(w):
                a = int(line[x - 1]) if x else 0
                b = int(prev[x])
                c = int(out[y - 1, x - 1]) if x and y else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = line
    return out


def decode_png_features(payload: bytes) -> dict:
    """REAL PNG decode with the stdlib: chunk walk with CRC verification
    (``zlib.crc32``), IHDR geometry, and — for 8-bit non-interlaced
    grayscale — full IDAT inflate + scanline unfilter to pixel
    statistics.  Other color types keep geometry but raise on pixel
    decode, the honest boundary without a native codec."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    out = {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(depth),
        "color_type": int(color),
    }
    if color == 0 and depth == 8 and interlace == 0:
        import numpy as np

        px = _png_unfilter(zlib.decompress(idat), w, h)
        flat = px.astype(np.float64)
        out["px_mean"] = float(flat.mean())
        out["px_min"] = int(px.min())
        out["px_max"] = int(px.max())
    else:
        raise NotImplementedError(
            f"pixel decode only for 8-bit grayscale (color_type={color}, "
            f"depth={depth}, interlace={interlace})"
        )
    return out


# -- baseline JPEG (ITU T.81, sequential DCT, grayscale) ---------------------
#
# Everything below is from-scratch against the PUBLIC spec: the zigzag
# scan order (T.81 Figure A.6), the example luminance quantization table
# (Annex K.1) and Huffman tables (K.3.3.1/K.3.3.2), canonical code
# construction (C.2), and the F.2 entropy-decoding procedures.  The
# decoder trusts NOTHING from the encoder here — tables are read from the
# file's own DQT/DHT segments.

#: zigzag scan order: position k in the scan -> row-major index
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: T.81 Annex K.1 luminance quantization table (row-major)
_JPEG_QTABLE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: T.81 K.3.3.1: DC luminance code counts per length 1..16 + symbols
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))

#: T.81 K.3.3.2: AC luminance code counts + the 162 run/size symbols
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _jpeg_canonical_codes(bits: list, vals: list) -> dict:
    """T.81 C.2: canonical Huffman assignment — symbol -> (code, length).
    Lengths ascend; within a length, codes increment; moving to the next
    length left-shifts."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_dct_matrix():
    """Orthonormal 8×8 DCT-II matrix M: forward F = M·B·Mᵀ, inverse
    B = Mᵀ·F·M.  Matches T.81 A.3.3 up to the standard 1/4·C(u)C(v)
    factoring (the orthonormal form folds those constants into M)."""
    import math as _math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = _math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * _math.cos((2 * x + 1) * u * _math.pi / 16)
    return m


def _jpeg_bitcat(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a coefficient value — T.81 F.1.2.1:
    category = bit length of |v|; negative values append v + 2^s - 1."""
    s, a = 0, abs(v)
    while a:
        s += 1
        a >>= 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.out)


def encode_baseline_jpeg(pixels, qtable: list | None = None) -> bytes:
    """Baseline sequential GRAYSCALE JPEG encoder (fixture-grade, fully
    standard output): level shift → orthonormal DCT → quantize →
    zigzag → DC-differential/AC-run-length Huffman with the Annex K
    example tables.  ``pixels``: h×w uint8 array, sides padded to
    8-multiples by edge replication (the decoder crops back via the
    SOF dimensions).  Exists so decode tests/fixtures have REAL files
    whose generating parameters are known — production encode stays a
    native-codec concern."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    q = np.array(qtable if qtable is not None else _JPEG_QTABLE).reshape(8, 8)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(px, ((0, ph - h), (0, pw - w)), mode="edge")
    m = _jpeg_dct_matrix()
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    pred = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = np.rint(m @ block @ m.T / q).astype(int)
            zz = [int(coef.flat[_JPEG_ZIGZAG[k]]) for k in range(64)]
            s, extra = _jpeg_bitcat(zz[0] - pred)
            pred = zz[0]
            c, ln = dc_codes[s]
            bw.put(c, ln)
            if s:
                bw.put(extra, s)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]  # ZRL
                    bw.put(c, ln)
                    run -= 16
                s, extra = _jpeg_bitcat(zz[k])
                c, ln = ac_codes[(run << 4) | s]
                bw.put(c, ln)
                bw.put(extra, s)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]  # EOB
                bw.put(c, ln)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(
        0xFFDB,
        b"\x00" + bytes(int(q.flat[_JPEG_ZIGZAG[k]]) for k in range(64)),
    )
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bw.flush() + b"\xff\xd9"
    )


def synthesize_jpeg(doc_id: int) -> bytes:
    """Deterministic baseline-JPEG fixture: a CONSTANT image of even
    gray level g — chosen because a constant block quantizes to a lone
    DC coefficient round(8·(g−128)/16) = (g−128)/2 EXACTLY when g is
    even (q₀₀ = 16 in the K.1 table), so the decode round-trips to g
    bit-for-bit and the oracle can state width/height/px_mean
    closed-form from doc_id while the Spark side sees only bytes."""
    import numpy as np

    w = 8 * (1 + doc_id % 4)
    h = 8 * (1 + doc_id % 5)
    g = 2 * ((doc_id * 37) % 128)
    return encode_baseline_jpeg(np.full((h, w), g, dtype=np.uint8))


class _JpegBitReader:
    """MSB-first reader over UNSTUFFED entropy data (F.2.2.5)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_huff_decode(reader: "_JpegBitReader", table: dict) -> int:
    """One symbol via incremental canonical lookup — table maps
    (length, code) -> symbol; valid streams resolve within 16 bits."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(bits: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s appended bits to the signed value."""
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg_features(payload: bytes) -> dict:
    """REAL baseline-JPEG decode from scratch (numpy, no codec):
    segment walk (DQT/DHT/SOF0/SOS read from the FILE, never assumed),
    0xFF-unstuffed Huffman entropy decode, DC prediction + EXTEND,
    dequantize, dezigzag, orthonormal IDCT, level shift → pixel stats.
    Boundaries are honest raises, with working code around them:
    progressive (SOF2) and arithmetic coding are NotImplementedError,
    as are chroma scans (>1 component) and restart intervals; a
    malformed stream is a ValueError."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list] = {}
    htables: dict[tuple, dict] = {}
    sof = None
    comp_q = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = list(data[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1 : i + 17])
                n = sum(bits)
                vals = list(data[i + 17 : i + 17 + n])
                codes = _jpeg_canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (ln, c): sym for sym, (c, ln) in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    f"{ncomp}-component (chroma) scans need a native codec"
                )
            comp_q = data[8]
            sof = (h, w)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (non-baseline process)"
            )
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", data[:2])[0] != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            ns = data[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            td, ta = data[2] >> 4, data[2] & 0x0F
            # unstuff entropy data up to EOI; RSTn inside = unsupported
            raw = bytearray()
            i = pos + 2 + length
            while i < len(payload):
                b = payload[i]
                if b == 0xFF:
                    nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
                    if nxt == 0x00:
                        raw.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        raise NotImplementedError("restart markers")
                    break
                raw.append(b)
                i += 1
            scan = (td, ta, bytes(raw))
            break
        pos += 2 + length
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF0 or SOS")
    h, w = sof
    td, ta, raw = scan
    dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
    q = np.array(qtables[comp_q], dtype=np.float64)
    m = _jpeg_dct_matrix()
    bw, bh = -(-w // 8), -(-h // 8)
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    reader = _JpegBitReader(raw)
    pred = 0
    for bi in range(bw * bh):
        zz = np.zeros(64, dtype=np.float64)
        s = _jpeg_huff_decode(reader, dc_tab)
        pred += _jpeg_extend(reader.read_bits(s), s)
        zz[0] = pred * q[0]
        k = 1
        while k < 64:
            rs = _jpeg_huff_decode(reader, ac_tab)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            s = rs & 0x0F
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _jpeg_extend(reader.read_bits(s), s) * q[k]
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[_JPEG_ZIGZAG] = zz
        block = m.T @ coef.reshape(8, 8) @ m + 128.0
        y, x = (bi // bw) * 8, (bi % bw) * 8
        img[y : y + 8, x : x + 8] = np.clip(np.rint(block), 0, 255)
    px = img[:h, :w]
    flat = px.astype(np.float64)
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": 8,
        "px_mean": float(flat.mean()),
        "px_min": int(px.min()),
        "px_max": int(px.max()),
    }


MEDIA_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def synthesize_media_fixture(documents: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload) with REAL container bytes — WAV
    (doc_id % 3 == 0), PNG (== 1), and baseline JPEG (== 2) synthesized
    deterministically from doc_id.  Arrow-batched; the payloads are
    genuine files (the decoders below never see the parameters)."""

    def gen(d: int) -> bytes:
        if d % 3 == 0:
            return synthesize_wav(d)
        if d % 3 == 1:
            return synthesize_png(d)
        return synthesize_jpeg(d)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": [
                        "audio" if d % 3 == 0 else "image" for d in ids
                    ],
                    "payload": [gen(d) for d in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        run, "doc_id long, media_type string, payload binary"
    )


def media_decode_features(media: DataFrame) -> DataFrame:
    """REAL media decode via Arrow-batched ``mapInPandas``: WAV payloads
    through :func:`decode_wav_features` (stdlib ``wave`` + PCM sample
    stats), PNG payloads through :func:`decode_png_features` (chunk walk
    + CRC + inflate + unfilter to pixel stats), JPEG payloads through
    :func:`decode_jpeg_features` (from-scratch baseline Huffman +
    dequant + IDCT).  Container detected from magic bytes, never from
    metadata.  One output row per item; fields of the other modality
    are NULL.  Unknown containers raise — the documented boundary, not
    a silent guess."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                f.name: [] for f in MEDIA_DECODE_SCHEMA.fields
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                base = {f.name: None for f in MEDIA_DECODE_SCHEMA.fields}
                base["doc_id"] = int(doc_id)
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    d = decode_wav_features(payload)
                    base.update(
                        container="wav",
                        sample_rate=d["sample_rate"],
                        n_channels=d["n_channels"],
                        duration_ms=d["duration_ms"],
                        rms=d["rms"],
                        peak=d["peak"],
                    )
                elif payload[:8] == b"\x89PNG\r\n\x1a\n":
                    d = decode_png_features(payload)
                    base.update(
                        container="png",
                        width=d["width"],
                        height=d["height"],
                        bit_depth=d["bit_depth"],
                        px_mean=d.get("px_mean"),
                    )
                elif payload[:3] == b"\xff\xd8\xff":
                    d = decode_jpeg_features(payload)
                    base.update(
                        container="jpeg",
                        width=d["width"],
                        height=d["height"],
                        bit_depth=d["bit_depth"],
                        px_mean=d.get("px_mean"),
                    )
                else:
                    raise NotImplementedError(
                        "no stdlib decoder for this container"
                    )
                for k, v in base.items():
                    rows[k].append(v)
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_DECODE_SCHEMA.fields]
            )

    return media.mapInPandas(run, MEDIA_DECODE_SCHEMA)


# -- ISO-BMFF / MP4 container metadata (round 13) ----------------------------
#
# Real VIDEO-container decode with zero codecs: the ISO base-media file
# format (ISO/IEC 14496-12, the public MP4 spec) is a pure box tree —
# (size, fourcc, payload) records, containers nesting by convention.
# Everything a curation pipeline needs BEFORE touching pixels lives in
# metadata boxes: brand, timescale/duration (mvhd/mdhd), track handler
# (hdlr), codec fourcc + coded dimensions (stsd visual sample entry),
# and the frame count (stts/stsz).  Frame PIXEL decode still requires a
# native codec and keeps the honest raise.

#: box types that are pure containers — their payload is more boxes
_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _mp4_boxes(data: bytes, pos: int, end: int):
    """Iterate (fourcc, payload_start, payload_end) over a box run.
    Validates sizes — a box overrunning its parent is a malformed file,
    not a parse best-effort."""
    import struct

    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        head = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("MP4 truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            head = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"MP4 box {typ!r} overruns its parent")
        yield typ, pos + head, pos + size
        pos += size


def synthesize_mp4(doc_id: int) -> bytes:
    """Deterministic minimal-but-valid MP4 fixture: one video track,
    every structural box a real reader touches (ftyp/mvhd/tkhd/mdhd/
    hdlr/vmhd/dinf/stsd[avc1]/stts/stsz/stsc/stco), all parameters
    closed-form in doc_id so the oracle can state the decoded metadata
    without reading bytes.  timescale 1000, 40-unit frames (25 fps)."""
    import struct

    n_frames = 10 + doc_id % 50
    dur = 40 * n_frames
    w = 16 * (1 + doc_id % 20)
    h = 16 * (1 + doc_id % 11)

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)  # version/flags
        + struct.pack(">IIII", 0, 0, 1000, dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">I", 7)
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = box(
        b"mdhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, 1000, dur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = box(
        b"hdlr",
        struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 12
        + b"VideoHandler\x00",
    )
    avc1 = box(
        b"avc1",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),
    )
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + avc1)
    stts = box(b"stts", struct.pack(">IIII", 0, 1, n_frames, 40))
    stsz = box(
        b"stsz",
        struct.pack(">III", 0, 0, n_frames)
        + b"".join(struct.pack(">I", 100 + i % 7) for i in range(n_frames)),
    )
    stsc = box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n_frames, 1))
    stco = box(b"stco", struct.pack(">III", 0, 1, 0))
    url = box(b"url ", struct.pack(">I", 1))
    dref = box(b"dref", struct.pack(">II", 0, 1) + url)
    dinf = box(b"dinf", dref)
    vmhd = box(b"vmhd", struct.pack(">I", 1) + b"\x00" * 8)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    mdat = box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def decode_mp4_features(payload: bytes) -> dict:
    """REAL ISO-BMFF metadata decode from scratch: validated box walk
    (sizes checked against parents, 64-bit largesize handled), mvhd/
    mdhd v0+v1 timescale/duration, the FIRST video track's handler,
    codec fourcc and coded width/height from the stsd visual sample
    entry, and the frame count cross-checked between stts (sum of
    run-lengths) and stsz (sample_count) — a mismatch is a malformed
    file, not a guess.  Honest boundaries: fragmented movies (mvex) and
    encrypted sample entries (encv) raise NotImplementedError; frame
    PIXEL decode needs a native codec and is not pretended here."""
    import struct

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file")
    major_brand = payload[8:12].decode("latin-1")
    out: dict = {"container": "mp4", "major_brand": major_brand}
    moov = None
    for typ, s, e in _mp4_boxes(payload, 0, len(payload)):
        if typ == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("MP4 missing moov")

    def full(s):  # (version, flags-skipped) payload offset helper
        return payload[s], s + 4

    video = None
    for typ, s, e in _mp4_boxes(payload, *moov):
        if typ == b"mvhd":
            ver, p = full(s)
            if ver == 1:
                ts, dur = struct.unpack(">IQ", payload[p + 16 : p + 28])
            else:
                ts, dur = struct.unpack(">II", payload[p + 8 : p + 16])
            out["timescale"], out["duration"] = int(ts), int(dur)
        elif typ == b"mvex":
            raise NotImplementedError("fragmented MP4 (mvex/moof)")
        elif typ == b"trak" and video is None:
            video = _mp4_video_track(payload, s, e)
    if "timescale" not in out:
        raise ValueError("MP4 missing mvhd")
    if video is None:
        raise NotImplementedError("no video track (hdlr vide) in moov")
    out.update(video)
    out["duration_ms"] = (
        out["duration"] * 1000 // out["timescale"] if out["timescale"] else 0
    )
    return out


def _mp4_video_track(payload: bytes, s: int, e: int) -> dict | None:
    """Parse one trak; return its metadata dict if it is a video track
    (hdlr handler 'vide'), else None."""
    import struct

    handler = None
    info: dict = {}
    stts_frames = stsz_frames = None
    boxes = {t: (a, b) for t, a, b in _mp4_boxes(payload, s, e)}
    mdia = boxes.get(b"mdia")
    if mdia is None:
        return None
    for typ, a, b in _mp4_boxes(payload, *mdia):
        if typ == b"hdlr":
            handler = payload[a + 8 : a + 12]
        elif typ == b"mdhd":
            ver = payload[a]
            p = a + 4
            if ver == 1:
                ts, dur = struct.unpack(">IQ", payload[p + 16 : p + 28])
            else:
                ts, dur = struct.unpack(">II", payload[p + 8 : p + 16])
            info["media_timescale"], info["media_duration"] = int(ts), int(dur)
        elif typ == b"minf":
            for t2, c, d in _mp4_boxes(payload, a, b):
                if t2 != b"stbl":
                    continue
                for t3, f, g in _mp4_boxes(payload, c, d):
                    if t3 == b"stsd":
                        (n_entries,) = struct.unpack(
                            ">I", payload[f + 4 : f + 8]
                        )
                        if n_entries >= 1:
                            fourcc = payload[f + 12 : f + 16]
                            if fourcc in (b"encv", b"enca"):
                                raise NotImplementedError(
                                    "encrypted sample entries"
                                )
                            info["codec"] = fourcc.decode("latin-1")
                            # VisualSampleEntry: width/height at +24
                            # into the entry body (after 6 reserved +
                            # dri + 16 predefined/reserved)
                            info["width"], info["height"] = struct.unpack(
                                ">HH", payload[f + 40 : f + 44]
                            )
                    elif t3 == b"stts":
                        (n,) = struct.unpack(">I", payload[f + 4 : f + 8])
                        counts = struct.unpack(
                            ">" + "II" * n, payload[f + 8 : f + 8 + 8 * n]
                        )
                        stts_frames = sum(counts[0::2])
                    elif t3 == b"stsz":
                        (cnt,) = struct.unpack(">I", payload[f + 8 : f + 12])
                        stsz_frames = int(cnt)
    if handler != b"vide":
        return None
    if stts_frames is not None and stsz_frames is not None:
        if stts_frames != stsz_frames:
            raise ValueError(
                f"MP4 frame-count mismatch: stts={stts_frames} "
                f"stsz={stsz_frames}"
            )
    info["n_frames"] = int(stts_frames or stsz_frames or 0)
    return info


VIDEO_CONTAINER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("major_brand", T.StringType()),
        T.StructField("codec", T.StringType()),
        T.StructField("timescale", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def synthesize_video_fixture(documents: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload) with REAL MP4 container bytes —
    Arrow-batched like the audio/image fixture; the decoder never sees
    the generating parameters."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": ["video"] * len(ids),
                    "payload": [synthesize_mp4(d) for d in ids],
                }
            )

    return documents.select("doc_id").mapInPandas(
        run, "doc_id long, media_type string, payload binary"
    )


def video_container_features(media: DataFrame) -> DataFrame:
    """REAL MP4 container metadata via Arrow-batched ``mapInPandas`` —
    the decode a 100 TB video-curation pipeline runs BEFORE committing
    codec compute: brand, codec fourcc, coded dimensions, duration and
    frame count from the box tree alone (zero pixel work, ~KB of reads
    per asset when the source supports range requests).  Magic-sniffed
    (ftyp), one row per payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                f.name: [] for f in VIDEO_CONTAINER_SCHEMA.fields
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                d = decode_mp4_features(bytes(p))
                rows["doc_id"].append(int(doc_id))
                rows["container"].append(d["container"])
                rows["major_brand"].append(d["major_brand"])
                rows["codec"].append(d.get("codec"))
                rows["timescale"].append(d.get("timescale"))
                rows["duration_ms"].append(d.get("duration_ms"))
                rows["n_frames"].append(d.get("n_frames"))
                rows["width"].append(d.get("width"))
                rows["height"].append(d.get("height"))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in VIDEO_CONTAINER_SCHEMA.fields],
            )

    return media.mapInPandas(run, VIDEO_CONTAINER_SCHEMA)


def video_frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan over REAL container metadata: one row per
    every-``every_n``-th frame index, with ``n_frames`` coming from the
    genuine stts/stsz decode (:func:`video_container_features`), not a
    stub.  The expansion stays declarative (sequence + explode —
    row-local, no shuffle), so at 100 TB the planner sees an honest
    1→⌈n_frames/every_n⌉ multiplicity per asset; the per-frame PIXEL
    fetch remains the native-codec boundary."""
    feats = video_container_features(media)
    return feats.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("_fi"),
    ).select(
        "doc_id", "n_frames", F.col("_fi").cast("int").alias("frame_index")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, max_side: int = 64
) -> DataFrame:
    """Aspect-preserving resize plumbing via Arrow-batched
    ``mapInPandas`` — the preprocessing stage every vision pipeline runs
    before featurization.  The OUTPUT GEOMETRY is real (source dims from
    the deterministic stub decoder, scaled so the longer side equals
    ``max_side``, never upscaled, aspect ratio preserved with
    floor-rounding and a 1-px floor); the pixel work is a clearly-marked
    stub that emits a deterministic payload slice sized
    proportionally to the area reduction — a real codec swap changes
    only the pandas body, exactly like :func:`extract_features`.

    Scale shape: iterator-of-batches streaming, one task per partition,
    no shuffle — the resized payloads are strictly smaller than the
    inputs, so the stage SHRINKS the data in flight (the property that
    makes resize-early the right order at 100 TB).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in RESIZED_SCHEMA.fields}
            for doc_id, mt, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(p)
                shape = _fake_decode(payload, mt)
                sw, sh = shape["width"], shape["height"]
                scale = min(1.0, max_side / max(sw, sh))
                w, h = max(1, int(sw * scale)), max(1, int(sh * scale))
                # STUB pixel work: emit a payload slice proportional to
                # the area reduction (deterministic; a real resampler
                # replaces just these two lines)
                keep = max(1, int(len(payload) * (w * h) / (sw * sh)))
                out_payload = payload[:keep]
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["src_width"].append(sw)
                rows["src_height"].append(sh)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["payload"].append(out_payload)
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, RESIZED_SCHEMA)
