"""Multimodal binary plumbing: schemas, batch shapes, explode semantics, and
determinism — the decode itself is stubbed (no media libs in sandbox) but
everything Spark-side is real."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from engine.multimodal import (
    decode_image,
    extract_binary_meta,
    resize_images,
    sample_frames,
    _HAS_PIL,
)


@pytest.fixture()
def payloads(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


def test_binary_meta_schema_and_values(spark, payloads):
    rows = extract_binary_meta(payloads).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["fake_width"] == r["n_bytes"] % 640
        assert len(r["payload_sha"]) == 64


def test_resize_produces_bounded_binary(spark, payloads):
    rows = resize_images(payloads, 32, 32).collect()
    for r in rows:
        assert len(r["thumb"]) <= 32 * 32
        assert r["thumb_sha"] == hashlib.sha256(bytes(r["thumb"])).hexdigest()
        assert (r["width"], r["height"]) == (32, 32)


def test_frame_sample_explodes_rows(spark, payloads):
    big = payloads.withColumn(
        "payload", F.expr("cast(repeat(cast(payload as string), 200) as binary)")
    )
    frames = sample_frames(big, every_n=5).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert any(len(v) > 1 for v in by_doc.values())  # 1 row -> N frame rows
    for idxs in by_doc.values():
        assert idxs == sorted(idxs)
        assert all(i % 5 == 0 for i in idxs)


def test_deterministic_across_runs(spark, payloads):
    a = sorted(map(tuple, resize_images(payloads).collect()))
    b = sorted(map(tuple, resize_images(payloads).collect()))
    assert a == b


def test_decode_stub_raises_without_pil():
    if _HAS_PIL:
        pytest.skip("PIL present in this environment")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")
