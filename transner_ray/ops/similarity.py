"""Similarity search over the `embeddings` table.

* ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul
  against a BROADCAST query matrix, per-batch partial top-k, tiny final
  sort on the merged partials. The baseline (and the verifier for the
  approximate variant).
* ``ivf_topk``: IVF-style scale path — k-means centroids fit on a
  seeded driver-side sample, per-batch assignment, search restricted to
  the ``nprobe`` nearest centroid lists. Approximate; recall vs brute
  force asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd


def _read_emb(sf_dir: str) -> rd.Dataset:
    from .io import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_vector(sf_dir: str, query_vec_id: int = 0) -> np.ndarray:
    """One row into driver memory, not the table: the predicate pushes
    down to parquet row-group/page statistics, so only the row groups
    whose vec_id range covers the query id are decoded — at 100 TB of
    embeddings the driver reads a few MB, never the corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", query_vec_id)],
    )
    if t.num_rows == 0:
        raise KeyError(f"vec_id {query_vec_id} not found")
    v = np.asarray(t.column("embedding")[0].as_py(), dtype=np.float64)
    return v / np.linalg.norm(v)


def brute_force_topk(sf_dir: str, k: int = 10, query_vec_id: int = 0) -> pd.DataFrame:
    """Exact top-k by cosine to the embedding of ``query_vec_id``
    (excluded from results). Returns (rank, vec_id, cosine)."""
    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
        sims = (vecs @ qv) / norms
        ids = df["vec_id"].to_numpy()
        keep = ids != query_vec_id
        sims, ids = sims[keep], ids[keep]
        # lexicographic (-cosine, vec_id) partial top-k: an exact cosine
        # tie spanning the k-th boundary must keep the LOWER vec_id, to
        # match the final merge and the SQL oracle's (DESC, vec_id) order
        top = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[top], "cosine": sims[top]})

    parts = (
        _read_emb(sf_dir).map_batches(partial_topk, batch_format="pandas").to_pandas()
    )
    parts = parts.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    parts = parts.reset_index(drop=True)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
            "vec_id": parts["vec_id"].astype("int64"),
            "cosine": parts["cosine"].round(4),
        }
    )


def brute_force_topk_sql(k: int = 10, query_vec_id: int = 0) -> str:
    return f"""
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank, vec_id, round(cosine, 4) AS cosine
FROM (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding, q.embedding) AS cosine
  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) q
  WHERE e.vec_id != {query_vec_id}
)
ORDER BY cosine DESC, vec_id LIMIT {k}
"""


def ivf_topk(
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2048,
) -> pd.DataFrame:
    """IVF approximate top-k: centroids from seeded k-means (5 Lloyd
    iterations on the first ``sample_rows`` vectors, deterministic
    init), per-batch nearest-centroid assignment, search only the
    ``nprobe`` lists closest to the query."""
    import pyarrow.parquet as pq

    # Streaming sample: iterate record batches and stop at sample_rows —
    # only the first row group(s) are ever decoded, not the whole
    # column (the driver-side fit must stay O(sample), not O(corpus))
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    chunks: list[np.ndarray] = []
    got = 0
    for rb in pf.iter_batches(batch_size=sample_rows, columns=["embedding"]):
        vals = rb.column("embedding").to_pylist()[: sample_rows - got]
        chunks.extend(np.asarray(v, dtype=np.float64) for v in vals)
        got += len(vals)
        if got >= sample_rows:
            break
    X = np.stack(chunks)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cents = X[:n_centroids].copy()
    for _ in range(5):
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    q = _query_vector(sf_dir, query_vec_id)
    probe = set(np.argsort(-(cents @ q))[:nprobe].tolist())
    cents_ref = ray.put(cents)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        qv = ray.get(q_ref)
        pr = ray.get(probe_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(vecs @ c.T, axis=1)
        ids = df["vec_id"].to_numpy()
        mask = np.isin(assign, list(pr)) & (ids != query_vec_id)
        sims = vecs[mask] @ qv
        ids = ids[mask]
        top = np.lexsort((ids, -sims))[:k]  # tie-break on vec_id, as above
        return pd.DataFrame({"vec_id": ids[top], "cosine": sims[top]})

    parts = _read_emb(sf_dir).map_batches(partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    parts = parts.reset_index(drop=True)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
            "vec_id": parts["vec_id"].astype("int64"),
            "cosine": parts["cosine"].round(4),
        }
    )
