"""Multimodal plumbing: binary columns, mapInPandas featurization and
frame sampling — Spark results cross-checked against driver-side
recomputation of the same deterministic math."""

from __future__ import annotations

import pytest

from mysql_postgres_debezium_cdc_spark.llm.multimodal import (
    decode_media,
    extract_features,
    media_table,
    sample_frames,
)
from tests.conftest import SF_DIR_SMOKE


def test_decode_media_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "image/png")


def test_fake_featurizer_math():
    feats = decode_media(b"\x00\x01\x08\x09", "application/octet-stream", fake=True)
    # bytes mod 8 → buckets {0: 2 (0x00,0x08), 1: 2 (0x01,0x09)}; features
    # are integer parts-per-million ratios (2/4 → 500000)
    assert feats[0] == 500000.0 and feats[1] == 500000.0 and sum(feats) == 1_000_000.0


def test_extract_features_matches_local_recompute(spark):
    media = media_table(spark, SF_DIR_SMOKE).limit(20)
    rows = media.collect()
    out = {r["doc_id"]: r["features"] for r in extract_features(media).collect()}
    assert len(out) == len(rows)
    for r in rows:
        assert out[r["doc_id"]] == decode_media(bytes(r["payload"]), r["media_type"], fake=True)


def test_sample_frames_shape_and_offsets(spark):
    media = media_table(spark, SF_DIR_SMOKE).limit(5)
    frames = sample_frames(media, frame_bytes=64, every_nth=4).collect()
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert frames
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f)
    for doc_id, fs in by_doc.items():
        fs.sort(key=lambda f: f["frame_no"])
        data = payloads[doc_id]
        expected_n = len(range(0, len(data), 64 * 4))
        assert len(fs) == expected_n
        for f in fs:
            assert f["frame_offset"] == f["frame_no"] * 64 * 4
            assert bytes(f["frame"]) == data[f["frame_offset"] : f["frame_offset"] + 64]


def test_resize_media_decimates_and_composes(spark):
    from mysql_postgres_debezium_cdc_spark.llm.multimodal import resize_media

    media = media_table(spark, SF_DIR_SMOKE).limit(10)
    originals = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    resized = resize_media(media, factor=4)
    rows = {r["doc_id"]: r for r in resized.collect()}
    assert rows.keys() == originals.keys()
    for doc_id, r in rows.items():
        expect = originals[doc_id][::4]
        assert bytes(r["payload"]) == expect
        assert r["resized_bytes"] == len(expect)
        assert r["orig_bytes"] == len(originals[doc_id])
    # composes with the featurizer: same math on the decimated payload
    feats = extract_features(
        resized.select(
            "doc_id", "media_type", "payload",
            resized["resized_bytes"].alias("n_bytes"),
        )
    )
    got = {r["doc_id"]: r["features"] for r in feats.collect()}
    for doc_id in originals:
        assert got[doc_id] == decode_media(originals[doc_id][::4], "text/plain", fake=True)
