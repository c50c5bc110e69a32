"""Custom join operators Ray Data lacks: as-of join and range join.

These are the two time-series joins every event-log pipeline needs
(reference has no analogue — beyond-reference coverage like
``ops/pack.py`` / ``ops/traindata.py``).

Scale design / partitioning assumptions:

* ``asof_join`` — the canonical distributed shape: hash-partition BOTH
  sides by the equi-key (one bucketed shuffle, fan-out scaled with the
  input), then one vectorized ``pd.merge_asof`` per bucket. Keys never
  split across buckets, so the per-bucket merge is exact and the result
  is bucket-count-invariant. ASSUMPTION: a single key's rows (both
  sides) fit in one task — the same contract as every hash
  `groupby`. A pathologically hot key would need time-range
  sub-partitioning with the right side's boundary row replicated into
  the next time slice (each slice needs the last right-row at or
  before its start); documented here as the skew path, not needed at
  the tested scales.
* ``range_join_windows`` — broadcast range join: the interval side of a
  range join is small in every real instance of this workload
  (calendar/promo/maintenance windows — thousands of rows, not
  billions), so it is a module-level constant closed over by the batch
  UDF (for a dynamic interval table: ``ray.put`` once, read per task —
  the gazetteer pattern, ``stages/detect.py``). The event side
  streams; per batch, one vectorized containment mask per window. No
  shuffle at all. An interval side too big to broadcast would need an
  interval-tree actor pool or a sort-merge band join — out of scope
  until an instance needs it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from .agg import _mix64, scaled_num_buckets


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
    num_buckets: int | None = None,
    input_rows: int | None = None,
) -> rd.Dataset:
    """Distributed backward as-of join: for every left row, attach the
    single right row with the greatest ``right_on <= left_on`` for the
    same key (``left_by = right_by``); ties on ``right_on`` broken by
    the greatest ``tiebreak`` value (deterministic — plain ``ASOF
    JOIN`` engines leave ties unspecified). Left rows with no match
    are dropped (inner semantics, mirrors the SQL oracle).

    Dataflow: tag each side, align schemas, union, ONE bucketed
    shuffle on ``hash(key) % num_buckets``, and a single
    ``pd.merge_asof`` (sorted C merge, not a cross product) per
    bucket. Output columns: ``by``, ``t`` (the left event time), then
    ``left_cols`` and ``right_cols``. Integer payload columns ride the
    union as NULLABLE Int64 (never through float64 — values above
    2**53 would silently lose bits); floats stay float64; other dtypes
    pass through unchanged. ``tiebreak`` must be one of
    ``right_cols``. Matched rows are selected by an explicit
    ``_m`` indicator column, NOT by null-ness of ``tiebreak`` — a
    matched right row whose tiebreak value is legitimately NULL is
    kept.
    """
    nb = num_buckets or scaled_num_buckets(input_rows)

    # payload dtypes from the Arrow schemas (metadata-only on parquet
    # reads): the union needs BOTH taggers to emit identical dtypes
    # for every column, including the all-null other-side columns.
    def _ride_dtype(schema, col: str) -> str | None:
        # ray Schema wraps either an Arrow schema or a PandasBlockSchema
        # (pandas-born datasets) — .names/.types covers both
        import pyarrow as pa

        t = schema.types[schema.names.index(col)]
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                return "Int64"
            if pa.types.is_floating(t):
                return "float64"
            return None  # keep as-is (strings/datetimes); NA rides object
        try:
            dt = np.dtype(t)
        except TypeError:
            return None
        if np.issubdtype(dt, np.integer):
            return "Int64"
        if np.issubdtype(dt, np.floating):
            return "float64"
        return None

    ldt = {c: _ride_dtype(left.schema(), c) for c in left_cols}
    rdt = {c: _ride_dtype(right.schema(), c) for c in right_cols}

    def make_tagger(
        by: str, on: str, mine: list[str], theirs: list[str], side: int,
        mine_dt: dict, theirs_dt: dict,
    ):
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"by": df[by].astype("int64"), "t": df[on]})
            for c in mine:
                out[c] = df[c].astype(mine_dt[c]) if mine_dt[c] else df[c]
            for c in theirs:
                dt = theirs_dt[c]
                out[c] = pd.Series(
                    pd.NA if dt == "Int64" else np.nan,
                    index=df.index,
                    dtype=dt or "object",
                )
            out["_side"] = np.int8(side)
            return out

        return tag

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = (
            _mix64(df["by"].to_numpy().astype(np.uint64)) % np.uint64(nb)
        ).astype("int32")
        return df

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_b"])
        lhs = g[g["_side"] == 0][["by", "t"] + left_cols]
        rhs = g[g["_side"] == 1][["by", "t"] + right_cols]
        lhs = lhs.sort_values("t", kind="stable")
        # ascending tiebreak within equal t: merge_asof takes the LAST
        # qualifying row, i.e. the max tiebreak — deterministic
        rhs = rhs.sort_values(["t", tiebreak], kind="stable")
        # explicit match indicator: rows without an as-of match have
        # _m = NA after the merge (a matched row always has _m = 1,
        # even if its tiebreak value is NULL)
        rhs = rhs.assign(_m=np.int8(1))
        out = pd.merge_asof(lhs, rhs, on="t", by="by", direction="backward")
        return out[out["_m"].notna()].drop(columns=["_m"])

    u = left.map_batches(
        make_tagger(left_by, left_on, left_cols, right_cols, 0, ldt, rdt),
        batch_format="pandas",
    ).union(
        right.map_batches(
            make_tagger(right_by, right_on, right_cols, left_cols, 1, rdt, ldt),
            batch_format="pandas",
        )
    )
    return (
        u.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(join_bucket, batch_format="pandas")
    )


# --------------------------------------------- last order before event


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    from .io import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _rows(sf_dir: str, table: str) -> int | None:
    from .io import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/{table}.parquet")


def last_order_before_event(sf_dir: str) -> rd.Dataset:
    """For every event, the most recent order the user placed at or
    before the event timestamp (order-date ties → max orderkey) —
    (event_id, user_id, ts, last_orderkey, last_totalprice), sorted by
    event_id. The driver-gate instance of :func:`asof_join`."""

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["by"].astype("int64"),
                "ts": df["t"],
                "last_orderkey": df["o_orderkey"].astype("int64"),
                "last_totalprice": df["o_totalprice"].astype("float64"),
            }
        )

    joined = asof_join(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]),
        left_by="user_id",
        right_by="o_custkey",
        left_on="ts",
        right_on="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        input_rows=_rows(sf_dir, "events"),
    )
    return joined.map_batches(finish, batch_format="pandas").sort("event_id")


ASOF_LAST_ORDER_SQL = """
WITH m AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts,
       o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
FROM m WHERE rn = 1
ORDER BY event_id
"""


# ------------------------------------------------- range join (windows)

# deterministic promo-window calendar: stride 56 h, width 80 h → every
# window overlaps its successor by 24 h, so containment is genuinely
# one-to-many in both directions (an event can land in 2 windows)
WINDOW_ORIGIN = "2024-01-01"
WINDOW_STRIDE_H = 56
WINDOW_WIDTH_H = 80
N_WINDOWS = 13  # covers the 30-day event range


def _windows() -> list[tuple[int, np.datetime64, np.datetime64]]:
    origin = np.datetime64(WINDOW_ORIGIN)
    out = []
    for w in range(N_WINDOWS):
        start = origin + np.timedelta64(w * WINDOW_STRIDE_H, "h")
        out.append((w, start, start + np.timedelta64(WINDOW_WIDTH_H, "h")))
    return out


def range_join_windows(sf_dir: str) -> rd.Dataset:
    """(event_id, window_id) for every event whose timestamp falls in
    ``[w_start, w_end)`` of a promo window — overlapping windows emit
    multiple rows per event. Broadcast range join: the tiny interval
    table lives in the UDF closure; the event side streams with one
    vectorized mask per window per batch."""
    windows = _windows()

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy()
        eid = df["event_id"].to_numpy().astype("int64")
        ids, wids = [], []
        for w, start, end in windows:
            m = (ts >= start) & (ts < end)
            ids.append(eid[m])
            wids.append(np.full(int(m.sum()), w, dtype="int64"))
        return pd.DataFrame(
            {"event_id": np.concatenate(ids), "window_id": np.concatenate(wids)}
        )

    return (
        _read(sf_dir, "events", ["event_id", "ts"])
        .map_batches(assign, batch_format="pandas")
        .sort(["event_id", "window_id"])
    )


RANGE_JOIN_WINDOWS_SQL = f"""
WITH w AS (
  SELECT i AS window_id,
         TIMESTAMP '{WINDOW_ORIGIN}'
           + to_hours(i * {WINDOW_STRIDE_H}) AS w_start,
         TIMESTAMP '{WINDOW_ORIGIN}'
           + to_hours(i * {WINDOW_STRIDE_H} + {WINDOW_WIDTH_H}) AS w_end
  FROM unnest(generate_series(0, {N_WINDOWS - 1})) AS t(i)
)
SELECT e.event_id, w.window_id
FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
ORDER BY e.event_id, w.window_id
"""
