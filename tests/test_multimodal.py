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
