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
