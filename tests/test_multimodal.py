"""Multimodal column plumbing tests (mapInPandas over binary payloads)."""

from __future__ import annotations

import hashlib

import pytest

from dataflow_example_spark.functions.multimodal import (
    as_media_table,
    decode_media,
    media_metadata,
    sample_frames,
)


@pytest.fixture
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello"), (1, "x"), (2, "frame sampling text")],
        "doc_id bigint, text string",
    )
    return as_media_table(docs)


def test_media_table_schema_and_types(media):
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,payload:binary,"
        "meta:struct<n_bytes:bigint>>"
    )
    types = {r.doc_id: r.media_type for r in media.collect()}
    assert types == {0: "image", 1: "audio", 2: "video"}


def test_media_metadata_digests(media):
    out = {r.doc_id: r for r in media_metadata(media).collect()}
    assert out[0].n_bytes == 5
    assert out[0].payload_md5 == hashlib.md5(b"hello").hexdigest()


def test_sample_frames_counts_and_hashes(media):
    rows = sample_frames(media).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # n_frames = len(payload) % 5 + 1
    assert len(by_doc[0]) == 1  # 5 % 5 + 1
    assert len(by_doc[1]) == 2  # 1 % 5 + 1
    assert by_doc[1][0].frame_md5 == hashlib.md5(b"x0").hexdigest()


def test_decode_requires_opt_in_without_codec(media):
    with pytest.raises(NotImplementedError):
        decode_media(media).collect()
    out = {r.doc_id: r for r in decode_media(media, allow_fake=True).collect()}
    d = hashlib.md5(b"hello").digest()
    assert (out[0].width, out[0].height, out[0].channels) == (
        1 + d[0] % 64,
        1 + d[1] % 64,
        1 + d[2] % 4,
    )


def test_media_metadata_arrow_matches_pandas(spark):
    """mapInArrow twin produces identical rows to the mapInPandas
    implementation (same schema, same digests)."""
    from dataflow_example_spark.functions.multimodal import (
        as_media_table,
        media_metadata,
        media_metadata_arrow,
    )
    from dataflow_example_spark.tables import load

    media = as_media_table(load(spark, "/root/testdata/sf0.001", "documents"))
    a = {tuple(r) for r in media_metadata(media).collect()}
    b = {tuple(r) for r in media_metadata_arrow(media).collect()}
    assert a == b and a
