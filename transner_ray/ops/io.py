"""Input sizing shared by the ops layer.

Ray's default read parallelism is CPU-derived (~2× cores), which
shreds a few-MB parquet table into dozens of sub-MB blocks; every
downstream sort/groupby/union then pays per-block task dispatch that
dwarfs the actual compute on this class of host (measured:
minhash_dedup at sf0.1 dropped 12 s → 2.3 s purely from right-sizing
the read). ``read_parquet_sized`` caps the block count proportionally
to FILE SIZE for small inputs (16 base blocks + ~1 per 16 MiB) and
leaves large inputs to Ray's own byte-targeted splitting — at 100 TB
nothing changes, block count keeps scaling with the data.
"""

from __future__ import annotations

import os

import ray.data as rd

_TARGET_BLOCK_BYTES = 16 * 1024 * 1024
_SMALL_INPUT_BYTES = 512 * 1024 * 1024
_MIN_BLOCKS = 16  # keep map-stage parallelism for compute-heavy ops


def cache_dir_for(base: str, *source_paths: str) -> str:
    """Deterministic /tmp cache directory for artifacts derived from
    ``source_paths``: keyed by a hash of the ABSOLUTE paths, never a
    basename — two corpora whose directories share a basename (e.g.
    ``a/sf0.01`` and ``b/sf0.01``) must not collide on one cache.
    Staleness is the CALLER's job via ``source_fingerprint`` EQUALITY
    (mtime *ordering* wrongly reuses a cache against an
    mtime-preserving copy or an older-mtime regeneration)."""
    import hashlib

    key = "\x00".join(os.path.abspath(p) for p in source_paths)
    return os.path.join(base, hashlib.sha1(key.encode("utf-8")).hexdigest()[:16])


def source_fingerprint(path: str) -> list:
    """[abspath, size, mtime_ns] content fingerprint of a cache's
    source file — stored in the cache and compared for EQUALITY on
    reuse (the ``state.checkpoint.fingerprint_files`` convention)."""
    st = os.stat(path)
    return [os.path.abspath(path), st.st_size, st.st_mtime_ns]


def cache_is_fresh(marker_path: str, fingerprint: list) -> bool:
    """True iff ``marker_path`` exists and records exactly
    ``fingerprint`` (written by ``write_cache_marker``)."""
    import json

    try:
        with open(marker_path) as f:
            return json.load(f).get("source") == fingerprint
    except (OSError, ValueError):
        return False


def write_cache_marker(marker_path: str, fingerprint: list, extra: dict | None = None) -> None:
    """Atomically publish a cache completeness marker carrying the
    source fingerprint (written LAST, after the cached artifact —
    per-file publishes are atomic but the artifact SET is not)."""
    import json

    payload = {"source": fingerprint, **(extra or {})}
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, marker_path)


def parquet_num_rows(path: str) -> int | None:
    """Row count from the parquet FOOTER only (no data read, no Ray
    execution) — the cheap input-size probe the scaled-fan-out helpers
    use (``ops/agg.scaled_num_buckets``). Accepts a single file; returns
    None when the footer is unreadable so callers fall back to their
    floor fan-out."""
    import pyarrow.parquet as pq

    try:
        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def read_parquet_sized(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Measured sweep at sf0.1 (32 cpus): 64 blocks → minhash 12-15 s
    (shuffle dispatch bound); 8 blocks → events_sliding 9-13 s (map
    parallelism starved); 16 blocks → both fast (2.3 s / 4.8 s)."""
    try:
        size = os.path.getsize(path)
    except OSError:
        size = None
    if size is not None and size < _SMALL_INPUT_BYTES:
        nb = int(size // _TARGET_BLOCK_BYTES + _MIN_BLOCKS)
        return rd.read_parquet(path, columns=columns, override_num_blocks=nb)
    return rd.read_parquet(path, columns=columns)
