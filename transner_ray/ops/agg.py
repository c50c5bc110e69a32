"""Partitioned hash-aggregate helper shared by the ops layer.

Ray's sort-based ``groupby().aggregate()`` combines per key in Python
(measured in this repo: 82 s for 458k distinct keys vs ~2 s for the
bucketed reduce), so every HIGH-CARDINALITY grouped reduction routes
through ``bucketed_group_reduce``: rows get a deterministic
``hash(key) % num_buckets`` column, the shuffle exchanges
``num_buckets`` coarse partitions, and ONE vectorized pandas call per
bucket reduces every key in it — Python cost O(buckets), not O(keys).
Low-cardinality groupbys (a handful of flags/segments/priorities) keep
the plain aggregate, where its per-key cost is irrelevant.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

import ray.data as rd

from .dedup import _mix64

NUM_AGG_BUCKETS = 64  # the FLOOR fan-out, not a cap — see scaled_num_buckets

# Target input rows per reduce bucket: a bucket reduce materializes one
# pandas DataFrame of everything hashed into it, so ~256k short rows
# keeps a task in the tens of MB even when the reduce input is the raw
# table (sessionization) rather than combiner partials.
ROWS_PER_BUCKET = 1 << 18
MAX_BUCKETS = 1 << 17  # beyond ~131k reduce tasks, let buckets grow instead


def scaled_num_buckets(
    n_rows: int | None,
    floor: int = NUM_AGG_BUCKETS,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    cap: int = MAX_BUCKETS,
) -> int:
    """Reduce-phase fan-out derived from INPUT SIZE (the
    read_parquet_sized pattern applied to the shuffle side): buckets
    grow linearly with the data above ``floor × rows_per_bucket`` rows,
    so at 10^9+ keys the reduce is thousands of bounded tasks instead
    of 64 tasks each materializing 1/64 of the corpus. ``n_rows`` is
    normally a parquet FOOTER count (ops/io.parquet_num_rows — no data
    read); None falls back to the floor. Deterministic for a given
    input, and every bucketed reduce is bucket-count-invariant (keys
    never split across buckets), so results don't depend on the knob —
    pinned by the invariance tests."""
    if not n_rows or n_rows <= 0:
        return floor
    return int(min(cap, max(floor, n_rows // rows_per_bucket)))


def hash_str_col(col: pd.Series) -> np.ndarray:
    """Deterministic uint64 hash of a string column (fixed-key
    siphash via pandas — stable across processes and runs)."""
    return pd.util.hash_pandas_object(col, index=False).to_numpy()


def hash_int_col(col: pd.Series) -> np.ndarray:
    a = col.to_numpy()
    if a.dtype.kind == "M":  # datetime64 → ns ticks
        a = a.view("int64")
    return _mix64(a.astype(np.uint64))


def driver_exclusive_scan(
    ds: rd.Dataset, bucket_col: str, value_col: str | None = None
):
    """The distributed-prefix-scan protocol shared by sequence packing
    and epoch-shuffle ranking: per-BLOCK partial sums per bucket (one
    short row per (block, bucket) — the driver never sees data rows),
    a driver-side exclusive cumsum over sorted bucket ids, and one
    ``ray.put`` of the (bucket_ids, base_offsets) lookup arrays.
    ``value_col=None`` scans row COUNTS. Requires ``bucket_col`` to be
    a contiguous-range key (bucket order == global order). Returns an
    object ref; readers do ``buckets, offs = ray.get(ref)`` and
    ``base = offs[np.searchsorted(buckets, b)]``."""
    import ray

    if value_col is None:

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(bucket_col).size()
            return pd.DataFrame({bucket_col: g.index.to_numpy(), "_v": g.to_numpy()})

    else:

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(bucket_col, as_index=False)[value_col].sum()
            return g.rename(columns={value_col: "_v"})

    parts = ds.map_batches(partials, batch_format="pandas", batch_size=None).to_pandas()
    sums = parts.groupby(bucket_col)["_v"].sum().sort_index()
    bases = sums.cumsum().shift(fill_value=0)
    return ray.put((bases.index.to_numpy(np.int64), bases.to_numpy(np.int64)))


def bucketed_group_reduce(
    ds: rd.Dataset,
    key_hash: Callable[[pd.DataFrame], np.ndarray],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
    input_rows: int | None = None,
) -> rd.Dataset:
    """``reduce_fn`` sees all rows of every key whose hash lands in
    one bucket (keys are never split across buckets) and must perform
    the in-pandas groupby itself — one call per bucket. Callers pass
    ``input_rows`` (the upstream table's row count, from the parquet
    footer) so the fan-out scales with the data; an explicit
    ``num_buckets`` overrides."""
    if num_buckets is None:
        num_buckets = scaled_num_buckets(input_rows)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = (key_hash(df) % np.uint64(num_buckets)).astype("int32")
        return df

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return reduce_fn(g.drop(columns=["_b"]))

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(reduce, batch_format="pandas")
    )
