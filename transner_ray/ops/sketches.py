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


# ------------------------------------------ Misra-Gries heavy hitters

HH_CAPACITY = 64  # MG capacity m: guarantees every term with count > N/m


def _mg_fold(summary: dict[str, int], terms, counts, m: int) -> None:
    """Merge one batch's exact (term, count) summary into the running
    Misra-Gries summary IN PLACE, then shrink back to ≤ m counters by
    subtracting the (m+1)-th largest count from every counter and
    dropping the non-positive ones (Agarwal et al., "Mergeable
    Summaries", PODS'12 — the shrink preserves the MG guarantee:
    underestimates by at most N/m in total)."""
    for t, c in zip(terms, counts):
        summary[t] = summary.get(t, 0) + int(c)
    if len(summary) > m:
        vals = sorted(summary.values(), reverse=True)
        cut = vals[m]  # (m+1)-th largest
        for t in [t for t, c in summary.items() if c - cut <= 0]:
            del summary[t]
        for t in summary:
            summary[t] -= cut


def _mg_batch_summary(texts, m: int) -> pd.DataFrame:
    """One map task's MG partial: exact value_counts of the batch
    folded into a FRESH capacity-m summary — ≤ m (term, residual-count)
    rows leave the task. MG summaries are mergeable (Agarwal et al.,
    PODS'12): the driver folding these partials is equivalent (same
    superset guarantee, error ≤ N/(m+1)) to folding the raw counts,
    but ships ≤ m rows per block instead of the block's whole
    vocabulary — the driver stops being a serial bandwidth bottleneck
    at corpus scale."""
    from .indexing import _WORD_RE

    words: list[str] = []
    for t in texts:
        words.extend(_WORD_RE.findall(t.lower()))
    s = pd.Series(words, dtype="object").value_counts()
    summ: dict[str, int] = {}
    _mg_fold(summ, s.index.to_numpy(), s.to_numpy(), m)
    terms = sorted(summ)
    return pd.DataFrame(
        {
            "term": pd.Series(terms, dtype="object"),
            "cnt": pd.Series([summ[t] for t in terms], dtype="int64"),
        }
    )


def heavy_hitter_terms(sf_dir: str, m: int = HH_CAPACITY) -> pd.DataFrame:
    """EXACT frequent-items: every term whose corpus count strictly
    exceeds N_tokens/m, with its exact count — found WITHOUT shuffling
    token counts (contrast ``traindata.vocab_topk``, which exchanges
    the full per-batch vocabulary):

    1. sketch pass — each map task folds its batch into a capacity-m
       Misra-Gries partial (``_mg_batch_summary``, ≤ m rows per block
       to the driver), and the driver merges the partials into one
       summary of ≤ m counters. Mergeability (Agarwal et al. PODS'12)
       keeps the MG guarantee: the surviving ≤ m terms are a SUPERSET
       of every term with count > N/m.
    2. verify pass — the ≤ m candidates broadcast into a second
       streaming aggregate that produces their EXACT counts plus the
       total token count; filter ``cnt * m > N``.

    Exactness of the final output is what makes the op SQL-checkable
    (HAVING count(*) * m > total); the sketch only bounds the
    candidate set. Both passes are shuffle-free."""
    docs = _read_docs(sf_dir, ["text"])

    def batch_counts(df: pd.DataFrame) -> pd.DataFrame:
        return _mg_batch_summary(df["text"], m)

    summary: dict[str, int] = {}
    for t in docs.map_batches(batch_counts, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        _mg_fold(summary, t["term"].to_numpy(), t["cnt"].to_numpy(), m)
    cand = frozenset(summary)

    import ray

    cand_ref = ray.put(cand)

    def exact_counts(df: pd.DataFrame) -> pd.DataFrame:
        from .indexing import _WORD_RE

        cset = ray.get(cand_ref)
        total = 0
        hits: dict[str, int] = {}
        for t in df["text"]:
            ws = _WORD_RE.findall(t.lower())
            total += len(ws)
            for w in ws:
                if w in cset:
                    hits[w] = hits.get(w, 0) + 1
        # one sentinel row carries the batch's token total; candidate
        # hit rows carry counts (≤ m of them)
        terms = ["\x00"] + sorted(hits)
        return pd.DataFrame(
            {
                "term": pd.Series(terms, dtype="object"),
                "cnt": pd.Series([0] + [hits[t] for t in terms[1:]], dtype="int64"),
                "total": pd.Series([total] + [0] * len(hits), dtype="int64"),
            }
        )

    # stream-fold the ≤ (m+1)-row block partials: driver memory stays
    # O(m) instead of O(blocks × m) (at 10^6 blocks a to_pandas here
    # would be the only unbounded driver structure in the op)
    n_total = 0
    counts: dict[str, int] = {}
    for t in docs.map_batches(exact_counts, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        n_total += int(t["total"].sum())
        for term, c in zip(t["term"], t["cnt"]):
            if term != "\x00":
                counts[term] = counts.get(term, 0) + int(c)
    agg = pd.DataFrame(
        {"term": list(counts), "cnt": pd.Series(list(counts.values()), dtype="int64")}
    )
    out = agg[agg["cnt"].to_numpy() * m > n_total] if len(agg) else agg
    return (
        out.sort_values(["cnt", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )


def heavy_hitters_sql(m: int = HH_CAPACITY) -> str:
    return f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term FROM documents
), n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM tok)
SELECT term, CAST(count(*) AS BIGINT) AS cnt
FROM tok CROSS JOIN n
GROUP BY term, n.c
HAVING count(*) * {m} > n.c
ORDER BY cnt DESC, term ASC
"""
