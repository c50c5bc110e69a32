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
