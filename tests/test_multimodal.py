"""Multimodal plumbing tests: binary columns, metadata, mapInPandas decode
stub, frame sampling."""

from __future__ import annotations

import hashlib

import pytest

from admira_etl_project_prueba_spark.operators import multimodal


def docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.documents_as_media(
        docs(spark, [(1, "hello world", "en"), (2, "spark at scale", "en")])
    )


def test_media_schema_and_metadata(media):
    rows = {r["doc_id"]: r for r in media.collect()}
    r = rows[1]
    assert bytes(r["payload"]) == b"hello world"
    assert r["meta"]["n_bytes"] == 11
    assert r["meta"]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_extract_features_deterministic(media):
    out = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    r = out[1]
    assert r["n_bytes"] == 11 and r["n_frames"] == 1
    assert r["width"] == 64 + 11 % 64
    # byte-histogram feature: exact, reproducible
    hist = [0.0] * 8
    for b in b"hello world":
        hist[b % 8] += 1.0
    assert [pytest.approx(h / 11) for h in hist] == list(r["feature"])
    again = {x["doc_id"]: x for x in multimodal.extract_features(media).collect()}
    assert list(again[1]["feature"]) == list(r["feature"])


def test_video_frame_sampling(spark):
    m = multimodal.documents_as_media(
        docs(spark, [(1, "x" * 100, "en")]), media_type="video"
    )
    frames = multimodal.frame_sample_plan(m, every_n=10).collect()
    n_frames = 1 + 100 % 250
    expected = list(range(0, n_frames, 10))
    assert sorted(r["frame_index"] for r in frames) == expected
    assert all(r["media_type"] == "video" for r in frames)


def test_unknown_media_type_raises(spark):
    m = multimodal.documents_as_media(docs(spark, [(1, "x", "en")]), media_type="hologram")
    with pytest.raises(Exception, match="hologram"):
        multimodal.extract_features(m).collect()


def test_media_header_features_parse_real_png_and_wav_headers(spark):
    """Engine-native header parsing: planted VALID PNG (IHDR 640x480)
    and WAV (44100 Hz stereo) byte layouts parse exactly; arbitrary
    bytes classify as unknown with NULL dimensions."""
    import struct

    from admira_etl_project_prueba_spark.operators.multimodal import (
        media_header_features,
    )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
    )
    junk = b"\x00\x01\x02\x03 not a media file"
    rows = [(1, "image", bytearray(png)), (2, "audio", bytearray(wav)),
            (3, "image", bytearray(junk))]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r for r in media_header_features(media).collect()}
    assert got[1]["container"] == "png"
    assert (got[1]["width"], got[1]["height"]) == (640, 480)
    assert got[1]["sample_rate"] is None
    assert got[2]["container"] == "wav"
    assert (got[2]["sample_rate"], got[2]["n_channels"]) == (44100, 2)
    assert got[2]["width"] is None
    assert got[3]["container"] == "unknown"
    assert got[3]["width"] is None and got[3]["sample_rate"] is None
    # row-local projection: no exchange in the plan
    plan = media_header_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_media_header_features_walk_jpeg_sof_segments(spark):
    """JPEG dimensions via the bounded segment walk: baseline SOF0 and
    progressive SOF2 parse through preceding variable-length segments;
    malformed chains (fill bytes / SOS first / truncation) stay honest
    NULL; the walk adds no exchange."""
    import struct

    from admira_etl_project_prueba_spark.operators.multimodal import (
        media_header_features,
    )

    def seg(marker, payload):  # length field includes itself
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sof(marker, w, h):
        # precision=8, 3 components (9 bytes of component specs)
        return seg(marker, struct.pack(">BHH", 8, h, w) + b"\x00" * 9)

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(range(64)))
    soi = b"\xff\xd8"
    baseline = soi + app0 + dqt + sof(0xC0, 1920, 1080) + seg(0xDA, b"\x00" * 10)
    progressive = soi + app0 + sof(0xC2, 320, 240)
    exif_heavy = soi + seg(0xE1, b"Exif\x00\x00" + b"\x55" * 700) + dqt + sof(0xC0, 12, 34)
    sos_first = soi + seg(0xDA, b"\x00" * 4) + sof(0xC0, 99, 99)  # dims after scan: unreachable
    truncated = soi + app0[:5]
    rows = [
        (1, "image", bytearray(baseline)),
        (2, "image", bytearray(progressive)),
        (3, "image", bytearray(exif_heavy)),
        (4, "image", bytearray(sos_first)),
        (5, "image", bytearray(truncated)),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {r["doc_id"]: r for r in media_header_features(media).collect()}
    for did in (1, 2, 3, 4, 5):
        assert got[did]["container"] == "jpeg"
        assert got[did]["sample_rate"] is None
    assert (got[1]["width"], got[1]["height"]) == (1920, 1080)
    assert (got[2]["width"], got[2]["height"]) == (320, 240)
    assert (got[3]["width"], got[3]["height"]) == (12, 34)
    assert got[4]["width"] is None and got[4]["height"] is None
    assert got[5]["width"] is None and got[5]["height"] is None
    plan = media_header_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_audio_window_plan_segments_canonical_wav(spark):
    """A canonical 44100 Hz stereo 16-bit WAV holding exactly 2.0 s of
    samples expands into (1000ms, 500ms) overlapping windows; the last
    window clamps to the clip end; junk rows yield one NULL-field row."""
    import struct

    from admira_etl_project_prueba_spark.operators.multimodal import (
        audio_window_plan,
    )

    n_samples = 2 * 44100
    data_bytes = n_samples * 2 * 2  # stereo, 16-bit
    wav = (
        b"RIFF" + struct.pack("<I", 36 + data_bytes) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", data_bytes)
    )
    rows = [(1, "audio", bytearray(wav)), (2, "audio", bytearray(b"junk"))]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = audio_window_plan(media).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    w1 = sorted(by_doc[1], key=lambda r: r["window_index"])
    assert w1[0]["sample_rate"] == 44100 and w1[0]["n_channels"] == 2
    assert w1[0]["n_samples"] == n_samples and w1[0]["duration_ms"] == 2000
    # starts at 0,500,1000,1500 — 4 windows; ends clamp to 2000
    assert [r["start_ms"] for r in w1] == [0, 500, 1000, 1500]
    assert [r["end_ms"] for r in w1] == [1000, 1500, 2000, 2000]
    # junk: one row, NULL fields, no windows
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["sample_rate"] is None
    assert by_doc[2][0]["window_index"] is None
    # row-local: no exchange in the plan
    plan = audio_window_plan(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_resize_media_geometry_and_determinism(spark):
    """Aspect-preserving geometry: longer side == max_side, never
    upscaled, deterministic payload; batching via mapInPandas (no
    exchange, no row UDF)."""
    from admira_etl_project_prueba_spark.operators.multimodal import (
        documents_as_media,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 500, "en", "s"), (2, "y" * 40, "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    media = documents_as_media(docs)
    out = {r["doc_id"]: r for r in resize_media(media, max_side=16).collect()}
    for r in out.values():
        assert max(r["width"], r["height"]) <= 16
        assert r["width"] >= 1 and r["height"] >= 1
        # aspect preserved within floor-rounding
        if max(r["src_width"], r["src_height"]) > 16:
            assert max(r["width"], r["height"]) == 16
        else:  # small sources are never upscaled
            assert (r["width"], r["height"]) == (r["src_width"], r["src_height"])
        assert len(bytes(r["payload"])) <= r["src_width"] * r["src_height"] * 100
    # deterministic across runs
    again = {r["doc_id"]: r for r in resize_media(media, max_side=16).collect()}
    assert {k: bytes(v["payload"]) for k, v in out.items()} == {
        k: bytes(v["payload"]) for k, v in again.items()
    }
    plan = resize_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_decode_wav_known_answer():
    """REAL WAV decode: the synthesized square wave's decoded stats are
    exactly the generating parameters (RMS = peak = A, duration = n/8
    ms) — and a hand-built stereo clip decodes with both channels'
    samples in the stats."""
    import io
    import struct
    import wave

    for doc_id in (0, 2, 6, 24, 1024):
        d = multimodal.decode_wav_features(multimodal.synthesize_wav(doc_id))
        a = 1000 + (doc_id % 13) * 500
        n = 800 + (doc_id % 7) * 160
        assert d["sample_rate"] == 8000 and d["n_channels"] == 1
        assert d["n_samples"] == n and d["duration_ms"] == n * 1000 // 8000
        assert d["rms"] == float(a) and d["peak"] == float(a)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<6h", 100, -200, 300, -400, 0, 0))
    d = multimodal.decode_wav_features(buf.getvalue())
    assert d["n_channels"] == 2 and d["sample_rate"] == 44100
    assert d["n_samples"] == 3 and d["peak"] == 400.0

    # 8-bit PCM is outside the stdlib decoder's contract: honest raise
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x80\x90")
    with pytest.raises(NotImplementedError, match="16-bit"):
        multimodal.decode_wav_features(buf8.getvalue())


def _png_with_filters(pixels, filters):
    """Forward-filter known pixel rows and wrap as a real PNG — the
    adversarial input for the unfilter: every row uses a DIFFERENT
    filter type."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    raw = bytearray()
    prev = [0] * w
    for y, ftype in enumerate(filters):
        row = pixels[y]
        raw.append(ftype)
        for x in range(w):
            a = row[x - 1] if x else 0
            b = prev[x]
            c = pixels[y - 1][x - 1] if x and y else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((row[x] - pred) & 0xFF)
        prev = row

    def chunk(typ, data):
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
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_known_answer_all_filters():
    """REAL PNG decode: geometry + pixel stats recovered exactly through
    every scanline filter type (0-4), CRC corruption rejected, and the
    synthesized fixture's mean matches its closed form."""
    pixels = [
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [200, 100, 50, 25],
        [0, 255, 128, 64],
        [7, 7, 7, 7],
    ]
    payload = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    d = multimodal.decode_png_features(payload)
    flat = [p for row in pixels for p in row]
    assert (d["width"], d["height"], d["bit_depth"]) == (4, 5, 8)
    assert d["px_mean"] == sum(flat) / len(flat)
    assert d["px_min"] == min(flat) and d["px_max"] == max(flat)

    for doc_id in (1, 3, 7, 123):
        d = multimodal.decode_png_features(multimodal.synthesize_png(doc_id))
        w, h = 8 + doc_id % 9, 5 + doc_id % 7
        want = sum((i + doc_id) % 256 for i in range(w * h)) / (w * h)
        assert (d["width"], d["height"]) == (w, h)
        assert d["px_mean"] == want

    corrupted = bytearray(payload)
    corrupted[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png_features(bytes(corrupted))
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png_features(b"GIF89a")


def test_decode_jpeg_known_answer():
    """REAL baseline-JPEG decode from scratch: constant even-gray
    fixtures round-trip EXACTLY (the lone DC coefficient survives
    quantization), a q=1 gradient reproduces its exact pixel mean
    through the full DCT/Huffman path, and every unsupported arm is an
    honest raise — progressive SOF, chroma scans, restart intervals,
    non-JPEG bytes."""
    import numpy as np

    for doc_id in (2, 5, 8, 11, 35, 122):
        d = multimodal.decode_jpeg_features(multimodal.synthesize_jpeg(doc_id))
        w, h = 8 * (1 + doc_id % 4), 8 * (1 + doc_id % 5)
        g = 2 * ((doc_id * 37) % 128)
        assert (d["width"], d["height"], d["bit_depth"]) == (w, h, 8)
        assert d["px_mean"] == float(g)
        assert d["px_min"] == g == d["px_max"]

    # non-constant image through a quant table of ones: DCT + Huffman +
    # IDCT must reproduce the exact mean/extremes (error only from
    # coefficient rounding, which the mean is insensitive to here)
    px = (np.arange(24 * 16).reshape(24, 16) % 256).astype(np.uint8)
    d = multimodal.decode_jpeg_features(
        multimodal.encode_baseline_jpeg(px, qtable=[1] * 64)
    )
    assert (d["width"], d["height"]) == (16, 24)
    assert abs(d["px_mean"] - px.mean()) < 0.01
    assert d["px_min"] == 0 and d["px_max"] == 255

    # standard table, structured content: lossy but close; odd sizes crop
    y, x = np.mgrid[0:32, 0:32]
    img = (128 + 100 * np.sin(x / 5) * np.cos(y / 7)).clip(0, 255)
    img = img.astype(np.uint8)[:29, :21]
    d = multimodal.decode_jpeg_features(multimodal.encode_baseline_jpeg(img))
    assert (d["width"], d["height"]) == (21, 29)
    assert abs(d["px_mean"] - img.mean()) < 3.0

    payload = multimodal.synthesize_jpeg(7)
    sof = payload.index(b"\xff\xc0")
    prog = payload[:sof] + b"\xff\xc2" + payload[sof + 2:]
    with pytest.raises(NotImplementedError, match="non-baseline"):
        multimodal.decode_jpeg_features(prog)
    chroma = bytearray(payload)
    chroma[sof + 9] = 3  # ncomp byte inside SOF0
    with pytest.raises(NotImplementedError, match="chroma"):
        multimodal.decode_jpeg_features(bytes(chroma))
    dri = payload[:2] + b"\xff\xdd\x00\x04\x00\x02" + payload[2:]
    with pytest.raises(NotImplementedError, match="restart"):
        multimodal.decode_jpeg_features(dri)
    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal.decode_jpeg_features(b"GIF89a")


def test_decode_mp4_container_known_answer():
    """REAL ISO-BMFF decode: the synthesized one-track MP4 round-trips
    every closed-form parameter (brand, codec, clocks, frame count,
    coded dimensions); malformed files fail loudly (box overrun,
    stts-vs-stsz mismatch, missing moov); fragmented and encrypted
    arms raise the honest NotImplementedError."""
    import struct

    for d in (0, 1, 7, 23, 49, 123):
        f = multimodal.decode_mp4_features(multimodal.synthesize_mp4(d))
        nf = 10 + d % 50
        assert f["major_brand"] == "isom" and f["codec"] == "avc1"
        assert f["n_frames"] == nf and f["duration_ms"] == 40 * nf
        assert (f["width"], f["height"]) == (
            16 * (1 + d % 20), 16 * (1 + d % 11)
        )
        assert f["timescale"] == 1000

    p = multimodal.synthesize_mp4(5)
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        multimodal.decode_mp4_features(b"\x00\x00\x00\x08free")
    bad = bytearray(p)
    i = p.index(b"stts") - 4
    bad[i : i + 4] = struct.pack(">I", 1 << 30)
    with pytest.raises(ValueError, match="overruns"):
        multimodal.decode_mp4_features(bytes(bad))
    bad2 = bytearray(p)
    i = p.index(b"stsz") + 4 + 8
    bad2[i : i + 4] = struct.pack(">I", 3)
    with pytest.raises(ValueError, match="frame-count mismatch"):
        multimodal.decode_mp4_features(bytes(bad2))
    ftyp = p[: p.index(b"moov") - 4]
    with pytest.raises(ValueError, match="missing moov"):
        multimodal.decode_mp4_features(ftyp)
    mvex = b"\x00\x00\x00\x08mvex"
    frag = ftyp + struct.pack(">I", 8 + len(mvex)) + b"moov" + mvex
    with pytest.raises(NotImplementedError, match="fragmented"):
        multimodal.decode_mp4_features(frag)
    enc = bytearray(p)
    j = p.index(b"avc1", p.index(b"stsd"))  # the stsd entry, not ftyp brands
    enc[j : j + 4] = b"encv"
    with pytest.raises(NotImplementedError, match="encrypted"):
        multimodal.decode_mp4_features(bytes(enc))


def test_video_container_features_frame(spark):
    """The Arrow-batched MP4 metadata stage end-to-end: fixture bytes →
    box-walk decode → typed rows matching the closed forms."""
    docs = spark.range(0, 9).selectExpr("id AS doc_id")
    rows = {
        r["doc_id"]: r
        for r in multimodal.video_container_features(
            multimodal.synthesize_video_fixture(docs)
        ).collect()
    }
    assert len(rows) == 9
    for d, r in rows.items():
        assert r["container"] == "mp4" and r["codec"] == "avc1"
        assert r["n_frames"] == 10 + d % 50
        assert r["duration_ms"] == 40 * (10 + d % 50)
        assert r["width"] == 16 * (1 + d % 20)

    # frame-sample plan over the REAL n_frames: every-10th index grid
    plan = multimodal.video_frame_sample_plan(
        multimodal.synthesize_video_fixture(docs), every_n=10
    )
    grid = {}
    for r in plan.collect():
        grid.setdefault(r["doc_id"], []).append(r["frame_index"])
    for d, idx in grid.items():
        assert sorted(idx) == list(range(0, 10 + d % 50, 10)), d


def test_media_decode_features_frame(spark):
    """The Arrow-batched decode stage end-to-end: synthesized fixture →
    real decode → typed feature rows, modality fields NULL on the other
    side, container detected from magic bytes only."""
    docs = spark.range(0, 12).selectExpr("id AS doc_id")
    media = multimodal.synthesize_media_fixture(docs)
    rows = {r["doc_id"]: r for r in multimodal.media_decode_features(media).collect()}
    assert len(rows) == 12
    for d, r in rows.items():
        if d % 3 == 0:
            assert r["container"] == "wav"
            assert r["rms"] == float(1000 + (d % 13) * 500)
            assert r["width"] is None and r["px_mean"] is None
        elif d % 3 == 1:
            assert r["container"] == "png"
            assert r["width"] == 8 + d % 9 and r["bit_depth"] == 8
            assert r["sample_rate"] is None and r["rms"] is None
        else:
            assert r["container"] == "jpeg"
            assert r["width"] == 8 * (1 + d % 4) and r["bit_depth"] == 8
            assert r["px_mean"] == float(2 * ((d * 37) % 128))
            assert r["sample_rate"] is None and r["rms"] is None
