"""Corpus indexing ops: inverted index, TF-IDF term weighting, exact
vocabulary size.

Beyond-reference coverage (the reference has no retrieval/indexing
code) — these are the IR-side primitives a training-data pipeline
needs next to dedup and curation: a posting-list index for
lookup/decontamination, TF-IDF weights for relevance filtering, and
the exact-distinct sibling of the HLL sketch (``ops/sketches.py``).

Scale design — everything rides the two word-shaped shuffles:

* Stage A (narrow): one row per DISTINCT (doc, word) with its in-doc
  term frequency. A document is a single input row, so per-doc tf is
  complete within whatever batch holds it — no cross-batch combine
  needed. Volume = the corpus's distinct (doc, word) pairs, already a
  large constant factor below raw tokens.
* Shuffle 1 (by word): the bucketed hash-aggregate
  (``ops/agg.bucketed_group_reduce``, fan-out scaled with input).
  Because stage-A rows are per-doc-distinct, a word's document
  frequency is just its row count in the bucket — df and the per-word
  reduce (postings / idf attach) come out of ONE shuffle, no join.
* Shuffle 2 (by doc, TF-IDF only): regroup the idf-carrying rows to
  pick each document's top-k terms. Output is k rows per doc.
* Stopword pruning bounds the hot keys: a web-scale stopword's
  posting list is O(corpus) and would concentrate in one reduce task,
  so ``inverted_index`` takes ``max_df_frac`` and drops terms above
  it (standard IR practice); the df-only row for a pruned term is
  still emitted so the pruning is observable downstream.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data as rd

from .agg import bucketed_group_reduce, hash_str_col

_WORD_RE = re.compile(r"[a-z]+")

# knobs for the driver-gate entries (small, deterministic)
INDEX_MIN_DF = 2
TFIDF_TOP_K = 3


def _read_docs(sf_dir: str) -> rd.Dataset:
    from .io import read_parquet_sized

    return read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _docs_rows(sf_dir: str) -> int | None:
    from .io import parquet_num_rows

    return parquet_num_rows(f"{sf_dir}/documents.parquet")


def doc_term_freqs(df: pd.DataFrame) -> pd.DataFrame:
    """Stage A batch fn: distinct (doc_id, term, tf) rows. Tokens are
    the ``vocab_topk`` words ([a-z]+ runs of the lowercased text) so
    every indexing op shares one tokenizer with ``ops/traindata``."""
    doc_ids: list[np.ndarray] = []
    terms: list[list[str]] = []
    for doc_id, text in zip(df["doc_id"].to_numpy(), df["text"]):
        ws = _WORD_RE.findall(text.lower())
        terms.append(ws)
        doc_ids.append(np.full(len(ws), doc_id, dtype=np.int64))
    if not terms or not any(len(t) for t in terms):
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="str"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
    flat = pd.DataFrame(
        {
            "doc_id": np.concatenate(doc_ids),
            "term": [w for ws in terms for w in ws],
        }
    )
    g = flat.groupby(["doc_id", "term"], sort=False).size()
    idx = g.index.to_frame(index=False)
    return pd.DataFrame(
        {
            "doc_id": idx["doc_id"].to_numpy(np.int64),
            "term": idx["term"].to_numpy(),
            "tf": g.to_numpy().astype("int64"),
        }
    )


def _doc_term_dataset(sf_dir: str) -> rd.Dataset:
    return _read_docs(sf_dir).map_batches(doc_term_freqs, batch_format="pandas")


# ------------------------------------------------------ inverted index

def inverted_index(
    sf_dir: str,
    min_df: int = INDEX_MIN_DF,
    max_df_frac: float | None = None,
) -> rd.Dataset:
    """Posting-list index: one row per term with its document
    frequency and the sorted doc_id posting list. Terms below
    ``min_df`` are dropped (hapax noise); terms above
    ``max_df_frac * N`` keep their df row but get an EMPTY posting
    list (stopword pruning — the df stays observable, the O(corpus)
    list never materializes)."""
    n_docs = _docs_rows(sf_dir)
    df_cap = (
        int(max_df_frac * n_docs) if (max_df_frac is not None and n_docs) else None
    )

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"])
        counts = g.groupby("term", sort=True)["doc_id"].agg(["count", list])
        counts = counts[counts["count"] >= min_df]
        out = pd.DataFrame(
            {
                "term": counts.index.to_numpy(),
                "df": counts["count"].to_numpy().astype("int64"),
                "postings": counts["list"].to_numpy(),
            }
        )
        if df_cap is not None:
            hot = out["df"].to_numpy() > df_cap
            if hot.any():
                out.loc[hot, "postings"] = out.loc[hot, "postings"].map(lambda _: [])
        return out

    return bucketed_group_reduce(
        _doc_term_dataset(sf_dir),
        lambda df: hash_str_col(df["term"]),
        reduce,
        input_rows=_docs_rows(sf_dir),
    )


INVERTED_INDEX_SQL = f"""
SELECT term, CAST(count(*) AS BIGINT) AS df,
       list(doc_id ORDER BY doc_id) AS postings
FROM (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
)
GROUP BY term
HAVING count(*) >= {INDEX_MIN_DF}
"""


# ------------------------------------------------------------- TF-IDF

def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K) -> rd.Dataset:
    """Per-document top-k terms by TF-IDF (tf × ln(N/df)), ties broken
    by term asc. Shuffle 1 (by term) attaches each term's global df to
    its (doc, term, tf) rows; shuffle 2 (by doc) ranks in-doc. The
    score column is float64 — the gate's round(6) absorbs libm ulp
    differences vs the SQL oracle, and selection flips would need two
    terms' scores within ~1 ulp straddling the k boundary (validated
    clean at all three test tiers)."""
    n_docs = _docs_rows(sf_dir)
    if not n_docs:
        n_docs = int(_read_docs(sf_dir).count())

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term")["term"].transform("size").astype("int64")
        return g

    with_df = bucketed_group_reduce(
        _doc_term_dataset(sf_dir),
        lambda df: hash_str_col(df["term"]),
        attach_df,
        input_rows=_docs_rows(sf_dir),
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["tfidf"] = g["tf"].to_numpy(np.float64) * np.log(
            float(n_docs) / g["df"].to_numpy(np.float64)
        )
        g = g.sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        return g.groupby("doc_id", sort=False).head(k)

    from .dedup import _mix64

    return bucketed_group_reduce(
        with_df,
        lambda df: _mix64(df["doc_id"].to_numpy(np.uint64)),
        topk,
        input_rows=_docs_rows(sf_dir),
    )


TFIDF_SQL = f"""
WITH n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), dt AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
    FROM documents
  )
  GROUP BY doc_id, term
), d AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY term
), scored AS (
  SELECT dt.doc_id, dt.term, dt.tf, d.df,
         dt.tf * ln(n.n_docs / d.df) AS tfidf,
         row_number() OVER (
           PARTITION BY dt.doc_id
           ORDER BY dt.tf * ln(n.n_docs / d.df) DESC, dt.term ASC
         ) AS rn
  FROM dt JOIN d USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rn <= {TFIDF_TOP_K}
"""


# ------------------------------------------------- exact distinct terms

def distinct_terms(sf_dir: str) -> pd.DataFrame:
    """Exact corpus vocabulary size — the ground-truth sibling of the
    HLL sketch (``ops/sketches.approx_distinct_tokens``): per-batch
    unique terms, one bucketed shuffle of the uniques, per-bucket
    nunique, driver sums ``num_buckets`` short rows."""

    def batch_uniques(df: pd.DataFrame) -> pd.DataFrame:
        seen: set[str] = set()
        for t in df["text"]:
            seen.update(_WORD_RE.findall(t.lower()))
        return pd.DataFrame({"term": pd.Series(sorted(seen), dtype="object")})

    uniq = _read_docs(sf_dir).map_batches(batch_uniques, batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g["term"].nunique())]})

    per_bucket = bucketed_group_reduce(
        uniq,
        lambda df: hash_str_col(df["term"]),
        reduce,
        input_rows=_docs_rows(sf_dir),
    ).to_pandas()
    return pd.DataFrame({"n_terms": [int(per_bucket["n"].sum())]})


DISTINCT_TERMS_SQL = """
SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms
FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
)
"""
