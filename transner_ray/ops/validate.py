"""Data-quality expectations: declarative row constraints checked in
one streaming pass per table, reported as per-rule violation counts.

The pre-training "expectations" gate every ingest pipeline runs before
committing a crawl drop: each rule is a vectorized predicate evaluated
per batch; a block contributes one short partial row per rule, and the
driver sums blocks × rules integers. Zero shuffle, zero row movement —
violating ROW EXTRACTION (for triage) is the same pass with the
predicate as a filter, deliberately not materialized here so the
health check stays O(rules) at any corpus size.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

import ray.data as rd

# (rule_name, table, columns, batch predicate → bool ndarray)
_RULES: list[tuple[str, str, list[str], Callable[[pd.DataFrame], np.ndarray]]] = [
    (
        "events_value_negative",
        "events",
        ["value"],
        lambda df: (df["value"].to_numpy() < 0.0),
    ),
    (
        "events_value_outlier",
        "events",
        ["value"],
        lambda df: (df["value"].to_numpy() > 300.0),
    ),
    (
        "events_user_null",
        "events",
        ["user_id"],
        lambda df: df["user_id"].isna().to_numpy(),
    ),
    (
        "docs_empty_text",
        "documents",
        ["text"],
        lambda df: (df["text"].str.len().to_numpy() == 0),
    ),
    (
        "docs_nchars_mismatch",
        "documents",
        ["text", "n_chars"],
        lambda df: (df["text"].str.len().to_numpy() != df["n_chars"].to_numpy()),
    ),
]


def quality_checks(sf_dir: str) -> pd.DataFrame:
    """(rule, violations) — one row per declared rule, exact counts.
    One streaming pass per involved table; all of a table's rules
    share that single pass."""
    from .io import read_parquet_sized

    by_table: dict[str, list[tuple[str, Callable]]] = {}
    cols: dict[str, set] = {}
    for name, table, columns, pred in _RULES:
        by_table.setdefault(table, []).append((name, pred))
        cols.setdefault(table, set()).update(columns)

    totals: dict[str, int] = {}
    for table, rules in by_table.items():
        ds = read_parquet_sized(
            f"{sf_dir}/{table}.parquet", columns=sorted(cols[table])
        )

        def partial(df: pd.DataFrame, rules=rules) -> pd.DataFrame:
            return pd.DataFrame(
                {name: [int(pred(df).sum())] for name, pred in rules}
            )

        parts = ds.map_batches(
            partial, batch_format="pandas", batch_size=None
        ).to_pandas()  # one short row per block
        for name, _ in rules:
            totals[name] = int(parts[name].sum())

    names = sorted(totals)
    return pd.DataFrame(
        {
            "rule": pd.Series(names, dtype="object"),
            "violations": pd.Series([totals[n] for n in names], dtype="int64"),
        }
    )


QUALITY_CHECKS_SQL = """
SELECT rule, CAST(v AS BIGINT) AS violations FROM (
  SELECT 'events_value_negative' AS rule,
         count(*) FILTER (value < 0.0) AS v FROM events
  UNION ALL
  SELECT 'events_value_outlier', count(*) FILTER (value > 300.0) FROM events
  UNION ALL
  SELECT 'events_user_null', count(*) FILTER (user_id IS NULL) FROM events
  UNION ALL
  SELECT 'docs_empty_text', count(*) FILTER (length(text) = 0) FROM documents
  UNION ALL
  SELECT 'docs_nchars_mismatch',
         count(*) FILTER (length(text) != n_chars) FROM documents
)
ORDER BY rule
"""
