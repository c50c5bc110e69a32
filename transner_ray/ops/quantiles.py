"""Distributed exact quantiles.

Two scale regimes, two algorithms:

* ``int_metric_quantiles`` — value-histogram quantiles for INTEGER
  metrics (token counts, lengths, session sizes): per-batch value
  counts → one bucketed shuffle of (value, cnt) partials → per-bucket
  sum → the driver sees only the DISTINCT-VALUE histogram (bounded by
  the metric's range, not the row count), sorts it, cumsums, and reads
  the quantile positions off it. Exact at any corpus size with zero
  row shuffling — the shuffle carries one short row per distinct value
  per batch.
* ``group_value_quantiles`` — per-GROUP quantiles of a continuous
  column: hash-partition by group, one sort per group task. Exact, but
  a group's rows must fit one task (the hash-groupby contract this
  repo states everywhere); the scale path for a continuous column
  whose single group exceeds a task is a mergeable sketch (t-digest /
  KLL, approximate) or iterative selection — not needed for the
  low-cardinality group keys this instance serves.

Quantile definition matches DuckDB ``quantile_disc``:
``sorted[max(0, ceil(p*n) - 1)]`` (verified empirically; lower
discrete quantile), so the SQL oracles compare exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray.data as rd

from .agg import bucketed_group_reduce, hash_int_col, hash_str_col

QUANTILE_PS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _disc_positions(ps: tuple[float, ...], n: int) -> np.ndarray:
    return np.array([max(0, math.ceil(p * n) - 1) for p in ps], dtype=np.int64)


def int_metric_quantiles(
    metric: rd.Dataset,
    value_col: str,
    ps: tuple[float, ...] = QUANTILE_PS,
    input_rows: int | None = None,
) -> pd.DataFrame:
    """Exact discrete quantiles of an integer column via the
    distinct-value histogram. Returns (p, value) — tiny, driver-side."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(value_col).size()
        return pd.DataFrame(
            {"value": g.index.to_numpy(np.int64), "cnt": g.to_numpy().astype("int64")}
        )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("value", as_index=False)["cnt"].sum()
        return t

    hist = (
        bucketed_group_reduce(
            metric.map_batches(partial, batch_format="pandas"),
            lambda df: hash_int_col(df["value"]),
            reduce,
            input_rows=input_rows,
        )
        .to_pandas()  # one row per DISTINCT metric value — bounded by range
        .sort_values("value")
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    pos = _disc_positions(ps, n)
    idx = np.searchsorted(cum, pos + 1)  # first value whose cum count covers pos
    return pd.DataFrame(
        {
            "p": np.array(ps, dtype=np.float64),
            "value": hist["value"].to_numpy(np.int64)[idx],
        }
    )


def token_count_quantiles(sf_dir: str) -> pd.DataFrame:
    """Driver-gate instance: corpus-wide quantiles of per-doc token
    count (the ``token_counts`` metric)."""
    from .io import parquet_num_rows
    from .textstats import token_counts

    return int_metric_quantiles(
        token_counts(sf_dir),
        "n_tokens",
        input_rows=parquet_num_rows(f"{sf_dir}/documents.parquet"),
    )


def _ps_sql_list() -> str:
    return "[" + ", ".join(str(p) for p in QUANTILE_PS) + "]"


TOKEN_COUNT_QUANTILES_SQL = f"""
WITH tc AS (
  SELECT length(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents
), q AS (
  SELECT unnest({_ps_sql_list()}) AS p,
         unnest(quantile_disc(n_tokens, {_ps_sql_list()})) AS value
  FROM tc
)
SELECT p, CAST(value AS BIGINT) AS value FROM q
"""


def group_value_quantiles(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...] = QUANTILE_PS,
    input_rows: int | None = None,
) -> rd.Dataset:
    """Per-group exact discrete quantiles of a continuous column.
    One bucketed shuffle by group key; each reduce task sorts its
    groups' values once and reads all requested quantiles off the
    sorted array."""
    ps_arr = np.array(ps, dtype=np.float64)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for key, sub in g.groupby(group_col, sort=False):
            v = np.sort(sub[value_col].to_numpy(np.float64))
            pos = _disc_positions(ps, len(v))
            outs.append(
                pd.DataFrame({group_col: key, "p": ps_arr, "value": v[pos]})
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        ds,
        lambda df: hash_str_col(df[group_col]),
        reduce,
        input_rows=input_rows,
    )


def event_value_quantiles(sf_dir: str) -> rd.Dataset:
    """Driver-gate instance: quantiles of ``events.value`` per
    event_type (5 group keys — the low-cardinality regime the
    hash-partition algorithm is for)."""
    from .io import parquet_num_rows, read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return group_value_quantiles(
        ds,
        "event_type",
        "value",
        input_rows=parquet_num_rows(f"{sf_dir}/events.parquet"),
    )


EVENT_VALUE_QUANTILES_SQL = f"""
SELECT event_type, unnest({_ps_sql_list()}) AS p,
       unnest(quantile_disc(value, {_ps_sql_list()})) AS value
FROM events
GROUP BY event_type
"""


# ------------------------------- approximate continuous quantiles

APPROX_Q_BINS = 4096


def approx_value_quantiles(
    sf_dir: str,
    table: str = "events",
    value_col: str = "value",
    ps: tuple[float, ...] = QUANTILE_PS,
    n_bins: int = APPROX_Q_BINS,
) -> pd.DataFrame:
    """Mergeable-histogram quantiles for a CONTINUOUS column — the
    scale path the exact per-group sort cannot take when one group
    outgrows a task. Two shuffle-free streaming passes:

    1. range pass — per-block (min, max, count) partials, driver
       takes the global envelope (short rows only).
    2. histogram pass — per-block equi-width bin counts over the
       global range travel as ONE int64 vector per block; the driver
       merge is elementwise ``+`` (associative/commutative ⇒ result
       is identical at any block split or task order).

    The answer is the upper edge of the bin containing the quantile
    position, so the DETERMINISTIC error contract is
    ``|q̂ - q| ≤ (max - min) / n_bins`` — pytest pins both the bound
    vs the exact quantile and the block-split invariance. Rows-only
    at the driver gate (SQL has no histogram sketch); the exact
    sibling gates (`token_count_quantiles`, `event_value_quantiles`)
    cover the definition."""
    from .io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=[value_col])
    return histogram_quantiles(ds, value_col, ps=ps, n_bins=n_bins)


def histogram_quantiles(
    ds: rd.Dataset,
    value_col: str,
    ps: tuple[float, ...] = QUANTILE_PS,
    n_bins: int = APPROX_Q_BINS,
) -> pd.DataFrame:
    """Dataset-level core of :func:`approx_value_quantiles` (split out
    so the block-split invariance is testable on arbitrary inputs)."""

    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        if not len(v):  # empty block (post-filter / over-partitioned)
            return pd.DataFrame({"lo": [], "hi": [], "n": []})
        return pd.DataFrame(
            {"lo": [v.min()], "hi": [v.max()], "n": [len(v)]}
        )

    env = ds.map_batches(
        range_partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    lo, hi, n = float(env["lo"].min()), float(env["hi"].max()), int(env["n"].sum())
    if hi <= lo:
        return pd.DataFrame({"p": np.array(ps), "value": np.full(len(ps), lo)})
    width = (hi - lo) / n_bins

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(np.float64)
        idx = np.minimum(((v - lo) / width).astype(np.int64), n_bins - 1)
        counts = np.bincount(idx, minlength=n_bins).astype(np.int64)
        return pd.DataFrame({"bin": np.arange(n_bins, dtype=np.int64), "cnt": counts})

    # stream-fold block histograms elementwise: driver memory is one
    # n_bins vector, not blocks × n_bins partial rows
    hist = np.zeros(n_bins, dtype=np.int64)
    for t in ds.map_batches(hist_partial, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        np.add.at(hist, t["bin"].to_numpy(), t["cnt"].to_numpy())
    cum = np.cumsum(hist)
    pos = _disc_positions(ps, n)
    bins = np.searchsorted(cum, pos + 1)
    return pd.DataFrame(
        {
            "p": np.array(ps, dtype=np.float64),
            "value": lo + (bins + 1) * width,  # upper bin edge
        }
    )
