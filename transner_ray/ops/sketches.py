"""Mergeable sketches over the corpus: HyperLogLog distinct counting.

``approx_distinct_tokens`` estimates the corpus vocabulary size (the
number a tokenizer-budget decision needs) without the heavy-hitter
aggregation's shuffle: each block folds its words into a 2^p-register
HLL (Flajolet et al. 2007), registers travel as ONE binary blob per
block, and the driver merge is an elementwise ``np.maximum`` — max is
associative, commutative and idempotent, so the estimate is
BIT-IDENTICAL at any block split, task order or cluster size, and
retries/speculative re-execution cannot double-count (the property
that makes sketches the right tool on an unreliable cluster).

Zero shuffles: the only data movement is 2^p bytes per block to the
driver. Standard error ≈ 1.04/√(2^p) — 1.6 % at the default p=12 for
4 KiB per block.

Gate: rows-only at the driver (no SQL computes an HLL); pytest pins
(a) exact equality against a sequential same-arithmetic oracle and
(b) accuracy against DuckDB's exact COUNT(DISTINCT) within the
published error bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .dedup import _batch_word_hashes, _docs_rows, _read_docs

HLL_P = 12  # 4096 registers, ~1.6 % standard error


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (6-step doubling search —
    float log2 would lose precision above 2^53)."""
    bl = np.zeros(v.shape, dtype=np.uint8)
    v = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bl[big] += np.uint8(shift)
        v[big] >>= np.uint64(shift)
    bl[v > 0] += np.uint8(1)
    return bl


def _hll_fold(hashes: np.ndarray, regs: np.ndarray, p: int) -> None:
    """Fold uint64 hashes into the 2^p uint8 registers in place."""
    if hashes.size == 0:
        return
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    low = hashes & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = (np.uint8(64 - p) - _bit_length_u64(low) + np.uint8(1)).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    """Flajolet et al. 2007 estimator with the small-range (linear
    counting) correction; large-range correction is unnecessary with
    64-bit hashes."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct_tokens(sf_dir: str, p: int = HLL_P) -> pd.DataFrame:
    """One row: (approx_distinct BIGINT) — the HLL vocabulary-size
    estimate over the lowercased whitespace words of ``documents``."""

    def block_regs(t: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for h in _batch_word_hashes(t.column("text").to_pylist()):
            _hll_fold(h, regs, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    parts = _read_docs(sf_dir, ["text"]).map_batches(
        block_regs, batch_format="pyarrow", batch_size=None
    )
    for t in parts.iter_batches(batch_format="pyarrow"):
        for blob in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return pd.DataFrame({"approx_distinct": pd.Series([round(_hll_estimate(merged, p))], dtype="int64")})


def hll_oracle(sf_dir: str, p: int = HLL_P) -> pd.DataFrame:
    """Sequential same-arithmetic oracle: one pass, one register set —
    must equal the distributed merge EXACTLY (max is order-free)."""
    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    regs = np.zeros(1 << p, dtype=np.uint8)
    for h in _batch_word_hashes(texts):
        _hll_fold(h, regs, p)
    return pd.DataFrame({"approx_distinct": pd.Series([round(_hll_estimate(regs, p))], dtype="int64")})
