"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted by actor-pool ``map_batches``
stages.

The image/audio libraries are not in this container, so the actual
pixel/sample decode is STUBBED (clearly marked: ``RealImageDecoder``
raises NotImplementedError without PIL) behind a deterministic fake
container format — but the Ray-side plumbing is real and tested:
binary column through the object store, small batch sizes for wide
rows, actor-pool stage with per-actor setup, typed metadata output.

Fake container format (deterministic, synthesizable from any text):
    b"FAKEIMG" + width:uint16le + height:uint16le + payload bytes
"""

from __future__ import annotations

import struct


import pyarrow as pa

import ray.data as rd

MAGIC = b"FAKEIMG"
HEADER_LEN = len(MAGIC) + 4  # magic + 2x uint16


def encode_fake_media(width: int, height: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack("<HH", width, height) + payload


def media_from_documents(sf_dir: str) -> rd.Dataset:
    """Synthesize a media table from `documents`: media_id = doc_id,
    payload = the utf-8 text bytes inside the fake container, width and
    height deterministic functions of doc_id (SQL-reproducible)."""
    from .io import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        blobs = [
            encode_fake_media(320 + (i % 16) * 8, 240 + (i % 9) * 8, t.encode("utf-8"))
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(blobs, pa.binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage: parses the container header into typed
    metadata. Setup (codec table) happens once per actor; real decoders
    would load codec libraries here."""

    def __init__(self):
        self.magic = MAGIC

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, n_bytes = [], [], [], []
        for mid, blob in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            assert blob[: len(self.magic)] == self.magic, "bad media container"
            w, h = struct.unpack("<HH", blob[len(self.magic) : HEADER_LEN])
            ids.append(mid)
            widths.append(w)
            heights.append(h)
            n_bytes.append(len(blob))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
            }
        )


class Resizer:
    """Deterministic fake 'resize': halves the declared dimensions and
    truncates the payload proportionally — stands in for a vectorized
    pixel op; the plumbing (binary in/binary out, actor pool, small
    batches) is the real part."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch.column("payload").to_pylist():
            w, h = struct.unpack("<HH", blob[len(MAGIC) : HEADER_LEN])
            body = blob[HEADER_LEN:]
            out.append(encode_fake_media(w // 2, h // 2, body[: max(1, len(body) // 2)]))
        return batch.set_column(
            batch.schema.get_field_index("payload"), "payload", pa.array(out, pa.binary())
        )


class RealImageDecoder:  # pragma: no cover - import-gated stub
    """The real decode stage (requires PIL — not in this container)."""

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "PIL not available in this sandbox. Plumbing when present: "
                "__init__ holds Image module; __call__ decodes each payload "
                "with Image.open(BytesIO(b)), emits (media_id, width, height, "
                "mode) — batch_size must stay small (wide binary rows)."
            ) from exc


def media_metadata(sf_dir: str) -> rd.Dataset:
    """media_from_documents → MediaDecoder actor pool → typed metadata.
    Small batch_size: binary rows are wide (SURVEY.md §4.2 memory note)."""
    return media_from_documents(sf_dir).map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=2
    )


MEDIA_METADATA_SQL = """
SELECT doc_id AS media_id,
       cast(320 + (doc_id % 16) * 8 AS INTEGER) AS width,
       cast(240 + (doc_id % 9) * 8 AS INTEGER) AS height,
       11 + strlen(text) AS n_bytes
FROM documents
"""


# ----------------------------------------- feature extraction (image)


class MediaFeaturizer:
    """Actor-pool feature-extract stage: vectorized numpy pass over the
    payload BODY bytes (the real compute shape of an embedding/feature
    model stage — one array op per batch, no per-byte Python). Output
    features are integer byte statistics so the stage is SQL-checkable
    over the ASCII source text (byte == char)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids, nb, nd, sb, mx = [], [], [], [], []
        for mid, blob in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            body = np.frombuffer(blob, dtype=np.uint8)[HEADER_LEN:]
            ids.append(mid)
            nb.append(int(body.size))
            nd.append(int(np.unique(body).size))
            sb.append(int(body.sum()))
            mx.append(int(body.max()) if body.size else 0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "n_distinct_bytes": pa.array(nd, pa.int64()),
                "sum_bytes": pa.array(sb, pa.int64()),
                "max_byte": pa.array(mx, pa.int64()),
            }
        )


def media_features(sf_dir: str) -> rd.Dataset:
    """media_from_documents → MediaFeaturizer actor pool (small batches
    — wide binary rows)."""
    return media_from_documents(sf_dir).map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=64, concurrency=2
    )


# DuckDB mirror: payload body == utf-8 text bytes, corpus is ASCII so
# byte stats == char stats ((?s). matches newlines too)
MEDIA_FEATURES_SQL = """
WITH ch AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '(?s).'), c -> ascii(c)) AS codes
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(len(codes) AS BIGINT) AS n_bytes,
       CAST(len(list_distinct(codes)) AS BIGINT) AS n_distinct_bytes,
       CAST(list_sum(codes) AS BIGINT) AS sum_bytes,
       CAST(list_max(codes) AS BIGINT) AS max_byte
FROM ch
"""


# -------------------------------------------- frame sampling (video)

VID_MAGIC = b"FAKEVID"
VID_HEADER_LEN = len(VID_MAGIC) + 2  # magic + n_frames:uint16le


def encode_fake_video(frames: list[bytes]) -> bytes:
    """Deterministic fake video container: frame i is the byte-slice
    body[i::n_frames] of the source — lengths are SQL-derivable."""
    import struct as _struct

    return (
        VID_MAGIC
        + _struct.pack("<H", len(frames))
        + b"".join(_struct.pack("<I", len(f)) + f for f in frames)
    )


def video_from_documents(sf_dir: str) -> rd.Dataset:
    """Synthesize a video table: n_frames = 8 + doc_id % 9 (8..16,
    always < the 44-char corpus floor so every frame is non-empty);
    frame i carries the text bytes at positions ≡ i (mod n_frames)."""
    from .io import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        blobs = []
        for i, t in zip(ids, texts):
            n = 8 + i % 9
            body = t.encode("utf-8")
            blobs.append(encode_fake_video([body[k::n] for k in range(n)]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["video"] * len(ids), pa.string()),
                "payload": pa.array(blobs, pa.binary()),
            }
        )

    return docs.map_batches(make, batch_format="pyarrow")


class FrameSampler:
    """Actor-pool frame-sample stage: parse the container, emit every
    ``stride``-th frame as its own row (media_id, frame_idx,
    n_frame_bytes). The real-codec analogue (keyframe extraction via
    pyav/ffmpeg) would load the codec once per actor here; the
    container walk and the row fan-out are the real plumbing."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct as _struct

        ids, fidx, fbytes = [], [], []
        for mid, blob in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            assert blob[: len(VID_MAGIC)] == VID_MAGIC, "bad video container"
            (n_frames,) = _struct.unpack("<H", blob[len(VID_MAGIC) : VID_HEADER_LEN])
            pos = VID_HEADER_LEN
            for k in range(n_frames):
                (ln,) = _struct.unpack("<I", blob[pos : pos + 4])
                pos += 4 + ln
                if k % self.stride == 0:
                    ids.append(mid)
                    fidx.append(k)
                    fbytes.append(ln)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "n_frame_bytes": pa.array(fbytes, pa.int64()),
            }
        )


def frame_sample(sf_dir: str, stride: int = 4) -> rd.Dataset:
    """video_from_documents → FrameSampler actor pool, sorted output."""
    return (
        video_from_documents(sf_dir)
        .map_batches(
            FrameSampler,
            fn_constructor_kwargs={"stride": stride},
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        .sort(["media_id", "frame_idx"])
    )


# frame k of doc d holds bytes at positions ≡ k (mod n): count =
# floor((L - k - 1) / n) + 1 for k < L (always true: L ≥ 44 > 16 ≥ n)
FRAME_SAMPLE_SQL = """
WITH v AS (
  SELECT doc_id, strlen(text) AS L, 8 + doc_id % 9 AS n FROM documents
)
SELECT doc_id AS media_id,
       CAST(k AS INTEGER) AS frame_idx,
       CAST((L - k - 1) // n + 1 AS BIGINT) AS n_frame_bytes
FROM v, LATERAL unnest(generate_series(0, n - 1, 4)) AS t(k)
ORDER BY media_id, frame_idx
"""
