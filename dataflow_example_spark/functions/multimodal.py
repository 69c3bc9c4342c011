"""Multimodal (image/audio/video) column handling for LLM-data pipelines
(beyond-reference; BASELINE.json north star).

Media are opaque ``binary`` payload columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` pipelines — the pattern that scales:
payloads never leave the executor, Python sees zero-copy Arrow batches,
and per-batch vectorized work amortizes interpreter cost. At 100 TB the
same functions run unchanged; partition count and
``spark.sql.files.maxPartitionBytes`` govern batch sizing.

The container has no image/audio codecs, so the *decode* step is gated:
with a real decoder installed (``pillow`` etc.) ``decode_media`` would use
it; without one it raises ``NotImplementedError`` unless
``allow_fake=True`` selects the deterministic fake decoder (md5-derived
dimensions) that keeps the Spark-side plumbing — schema, batching, UDF
signatures — fully testable and oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

METADATA_SCHEMA = "doc_id bigint, media_type string, n_bytes bigint, payload_md5 string"
FRAMES_SCHEMA = "doc_id bigint, frame_idx bigint, frame_md5 string"
DECODE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, channels int"
)


def as_media_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> a media table: opaque binary payload + typed metadata.

    Deterministic synthesis (the driver testdata has no binary column):
    payload = UTF-8 bytes of the text; media_type cycles by doc_id % 3.
    Everything downstream treats ``payload`` as opaque bytes, exactly as it
    would treat real JPEG/PCM/MP4 payloads.
    """
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    # a NULL text has no payload to synthesize — no media row (the same
    # header/empty NULL-and-drop contract as the traffic parse); the
    # worker functions below additionally drop NULL payloads defensively
    docs = docs.filter(F.col(text_col).isNotNull())
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes")
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Per-payload metadata via Arrow-batched ``mapInPandas``: byte length
    and content digest computed executor-side, payload never collected."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # NULL payloads: no media
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        compute, METADATA_SCHEMA
    )


def sample_frames(media: DataFrame, modulo: int = 5) -> DataFrame:
    """Frame sampling (the video path): fan each payload out to
    ``n_bytes % modulo + 1`` deterministic frames, one row per frame, with
    a per-frame digest. ``mapInPandas`` is a row-multiplying (UDTF-shaped)
    transform here — output rows need not align 1:1 with input rows."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payloads: no frames
                    continue
                data = bytes(payload)
                for i in range(len(data) % modulo + 1):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(data + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return media.select("doc_id", "payload").mapInPandas(frames, FRAMES_SCHEMA)


def decode_media(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode payloads to (width, height, channels).

    With a real codec library present this is where it would plug in; the
    container ships none, so without ``allow_fake=True`` this raises
    ``NotImplementedError``. The fake decoder derives dimensions from the
    payload digest — deterministic, engine-portable, and exercises the
    identical Spark plumbing a real decoder would use.
    """
    try:  # real decoder path (not available in this container)
        import PIL.Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False

    if not have_codec and not allow_fake:
        raise NotImplementedError(
            "no codec library available; pass allow_fake=True for the "
            "deterministic fake decoder"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # NULL payloads: no decode
            digests = pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b)).digest()
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": digests.map(lambda d: 1 + d[0] % 64).astype("int32"),
                    "height": digests.map(lambda d: 1 + d[1] % 64).astype("int32"),
                    "channels": digests.map(lambda d: 1 + d[2] % 4).astype("int32"),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        decode, DECODE_SCHEMA
    )


def media_metadata_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` twin of ``media_metadata``: operates on raw
    ``pyarrow.RecordBatch`` objects — no pandas conversion layer, which
    matters for binary payload columns (pandas boxes each payload into a
    Python bytes object; Arrow keeps them in one contiguous buffer until
    the digest loop needs them). Same output schema and values as the
    pandas twin (asserted in tests); prefer this form when batches are
    dominated by large binaries.
    """
    import pyarrow as pa

    def compute(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.column("payload").null_count:  # NULL payloads: drop
                batch = batch.filter(batch.column("payload").is_valid())
            payloads = batch.column("payload")
            md5s = [
                hashlib.md5(p.as_py()).hexdigest() for p in payloads
            ]
            n_bytes = [len(p.as_py()) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("media_type"),
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(md5s, type=pa.string()),
                ],
                names=["doc_id", "media_type", "n_bytes", "payload_md5"],
            )

    return media.select("doc_id", "media_type", "payload").mapInArrow(
        compute, METADATA_SCHEMA
    )


FEATURES_SCHEMA = "doc_id bigint, media_type string, feature array<double>"
FEATURE_DIM = 8


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction plumbing: payload -> fixed-dim embedding vector
    via Arrow-batched ``mapInPandas``. A real model (CLIP/wav2vec/...)
    drops into the same batch loop with identical schema and partitioning;
    here the deterministic stand-in derives dimension j from md5 byte j
    (engine-portable, oracle-checkable).
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # NULL payloads: no features
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": digests.map(
                        lambda d: [d[j] / 255.0 for j in range(FEATURE_DIM)]
                    ),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        feats, FEATURES_SCHEMA
    )
