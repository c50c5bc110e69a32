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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

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


# ------------------------------------------------ distributed k-means

KMEANS_K = 10  # the synthetic corpus carries 10 planted label clusters
KMEANS_ITERS = 5
_QSCALE = np.int64(1) << 20  # fixed-point lanes for order-free sums


def _emb_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list<float> column —
    zero-copy flatten of the child values (``.flatten()`` honors
    slices/offsets), never a per-row ``to_pylist`` materialization
    (measured orders-of-magnitude cheaper; this runs once per batch
    per Lloyd iteration over the whole table)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    assert flat.size % n == 0, "ragged embedding column"
    return flat.reshape(n, -1)


def _kmeans_assign(X: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid per row; ties resolve to the LOWEST centroid
    index (np.argmin) — deterministic."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is rank-constant
    d = -2.0 * (X @ cents.T) + (cents * cents).sum(axis=1)
    return np.argmin(d, axis=1)


def kmeans_embeddings(
    sf_dir: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    checkpoint_dir: str | None = None,
) -> "rd.Dataset":
    """(vec_id, cluster): Lloyd's k-means FIT distributed over the
    embedding table — the clustering counterpart to ivf_topk's
    driver-sample centroids (sampling is fine for IVF routing; corpus
    bucketing/mixture analysis wants the fit over ALL vectors).

    Scale + determinism design:

    * every iteration is one streaming ``map_batches`` pass emitting
      per-block PARTIALS: (cluster, count, Σvec) with the vector sum
      QUANTIZED to int64 fixed-point (×2²⁰) and serialized to a binary
      blob (lists don't survive Arrow blocks efficiently). Integer
      addition is associative+commutative, so the driver totals and
      every centroid are BIT-IDENTICAL regardless of block split, task
      order or cluster size (the float path would drift with summation
      order); assignments from identical centroids are deterministic
      up to exact distance ties (measure-zero for real embeddings —
      1-ulp BLAS rounding can differ across batch shapes).
      Per-block partial magnitude ≤ 2³⁸ (256k rows × 2²⁰ × |x|≤1);
      int64 driver totals overflow only beyond ~2⁴³ rows per cluster —
      a 100 TB run splits the sum into hi/lo lanes, same dataflow.
    * driver state is O(blocks × k × d) short rows per iteration,
      reduced to k × d floats; centroids broadcast back via the task
      closure (k·d·8 bytes — trivial).
    * init = the k lowest-vec_id vectors (parquet predicate pushdown
      reads only their row groups), the ivf_topk convention.
    * an empty cluster keeps its previous centroid (Lloyd's standard
      fallback, deterministic).

    Gate: rows-only at the driver (no SQL for iterative float fits);
    pytest pins exact equality against a sequential oracle running the
    SAME quantized arithmetic, plus planted-label agreement."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # init = the k LOWEST-vec_id vectors. Fast path: 0-based contiguous
    # ids mean `vec_id < k` (predicate pushdown) returns exactly k rows.
    # Fallback for sparse/shifted ids: scan ONLY the slim vec_id column
    # for the k-th smallest id, then a filtered read — the oracle's
    # sort-then-head semantics either way.
    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).sort_by("vec_id")
    if init.num_rows < k:
        ids = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        ids = np.sort(ids.column("vec_id").to_numpy())
        if ids.size < k:
            raise ValueError(f"need {k} init vectors, corpus has {ids.size}")
        init = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<=", int(ids[k - 1]))],
        ).sort_by("vec_id")
    cents = _emb_matrix(init.column("embedding"))[:k].copy()
    d = cents.shape[1]

    # The iterated dataset is NEVER pinned in the object store across
    # Lloyd passes (a full-corpus materialize() held for `iters`
    # rounds is the 100 TB spill bomb): each pass re-plans a fresh
    # streaming read and releases its blocks as the partials fold.
    # The source here is already pruned parquet, so the default
    # re-reads IT per pass; ``checkpoint_dir`` opts into writing the
    # pruned columns once (atomic publish, run_partitioned pattern)
    # and iterating over the checkpoint instead — for callers whose
    # embedding dataset is a derived projection/filter of a wider
    # table that would otherwise recompute every iteration.
    if checkpoint_dir is not None:
        import shutil

        tmp = checkpoint_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        _read_emb(sf_dir).write_parquet(tmp)
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
        os.replace(tmp, checkpoint_dir)

        def emb_ds() -> "rd.Dataset":
            return rd.read_parquet(checkpoint_dir, columns=["vec_id", "embedding"])

    else:

        def emb_ds() -> "rd.Dataset":
            return _read_emb(sf_dir)

    def make_partials(cents_now: np.ndarray):
        def partials(t: pa.Table) -> pa.Table:
            X = _emb_matrix(t.column("embedding"))
            a = _kmeans_assign(X, cents_now)
            Q = np.rint(X * _QSCALE).astype(np.int64)
            clusters, counts, blobs = [], [], []
            for c in np.unique(a):
                m = a == c
                clusters.append(int(c))
                counts.append(int(m.sum()))
                blobs.append(Q[m].sum(axis=0).tobytes())
            return pa.table(
                {
                    "cluster": pa.array(clusters, pa.int32()),
                    "n": pa.array(counts, pa.int64()),
                    "qsum": pa.array(blobs, pa.binary()),
                }
            )

        return partials

    for _ in range(iters):
        parts = emb_ds().map_batches(
            make_partials(cents), batch_format="pyarrow", batch_size=None
        ).to_pandas()  # blocks × ≤k short rows
        new = cents.copy()
        for c, grp in parts.groupby("cluster"):
            total = np.zeros(d, dtype=np.int64)
            for blob in grp["qsum"]:
                total += np.frombuffer(blob, dtype=np.int64)
            n = int(grp["n"].sum())
            if n:
                new[int(c)] = total.astype(np.float64) / (float(_QSCALE) * n)
        cents = new

    final_cents = cents

    def assign_batch(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t.column("embedding"))
        a = _kmeans_assign(X, final_cents)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return emb_ds().map_batches(assign_batch, batch_format="pyarrow").sort("vec_id")


def kmeans_oracle(sf_dir: str, k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """Sequential same-arithmetic oracle (single numpy pass, quantized
    sums) — exact-equality reference for the distributed fit."""
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by("vec_id")
    ids = t.column("vec_id").to_numpy()
    X = _emb_matrix(t.column("embedding"))
    cents = X[:k].copy()
    Q = np.rint(X * _QSCALE).astype(np.int64)
    for _ in range(iters):
        a = _kmeans_assign(X, cents)
        new = cents.copy()
        for c in range(k):
            m = a == c
            n = int(m.sum())
            if n:
                new[c] = Q[m].sum(axis=0).astype(np.float64) / (float(_QSCALE) * n)
        cents = new
    a = _kmeans_assign(X, cents)
    return pd.DataFrame({"vec_id": ids, "cluster": a.astype("int64")})


# ------------------------------------------------ persisted IVF index

def _fit_ivf_centroids(
    sf_dir: str, n_centroids: int = 16, sample_rows: int = 2048
) -> np.ndarray:
    """Deterministic seeded Lloyd fit on a streamed head sample — the
    shared centroid trainer of ivf_topk and build_ivf_index (driver
    cost O(sample), never O(corpus))."""
    import pyarrow.parquet as pq

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
    return cents


def build_ivf_index(
    sf_dir: str, index_dir: str, n_centroids: int = 16
) -> dict:
    """Build-once IVF index: centroids.parquet + the corpus written as
    LIST-PARTITIONED parquet (hive partition column ``list_id``), so a
    query's nprobe pruning happens AT THE READ — only the probed
    partitions' row groups leave storage, the 'prune at the read'
    principle applied to similarity search. One streaming pass to
    assign + write; atomic directory rename so readers never see a
    half-built index."""
    import shutil

    import pyarrow.parquet as pq

    cents = _fit_ivf_centroids(sf_dir, n_centroids)
    cents_ref = ray.put(cents)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        df = df[["vec_id", "embedding"]].copy()
        df["list_id"] = np.argmax(vecs @ c.T, axis=1).astype("int32")
        return df

    _read_emb(sf_dir).map_batches(assign, batch_format="pandas").write_parquet(
        os.path.join(tmp, "lists"), partition_cols=["list_id"]
    )
    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(range(len(cents)), pa.int32()),
                "centroid": pa.array([list(map(float, c)) for c in cents]),
            }
        ),
        os.path.join(tmp, "centroids.parquet"),
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.replace(tmp, index_dir)
    return {"index_dir": index_dir, "n_centroids": len(cents)}


def ivf_index_topk(
    index_dir: str,
    sf_dir: str,
    k: int = 10,
    query_vec_id: int = 0,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Query a persisted IVF index: read centroids (tiny), pick the
    nprobe closest lists, read ONLY those partition directories, score
    per batch with block-local top-k. ``nprobe = n_centroids`` probes
    everything → provably equal to brute force (the SQL-gated mode)."""
    import pyarrow.parquet as pq

    cents_tbl = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = np.stack([np.asarray(c, dtype=np.float64) for c in cents_tbl["centroid"].to_pylist()])
    q = _query_vector(sf_dir, query_vec_id)
    probe = np.argsort(-(cents @ q))[:nprobe]
    import glob as _glob

    # expand partition dirs to FILE lists (rd.read_parquet rejects a
    # list of directories); an empty list has no dir at all
    files = [
        f
        for p in probe
        for f in sorted(
            _glob.glob(
                os.path.join(index_dir, "lists", f"list_id={int(p)}", "*.parquet")
            )
        )
    ]
    q_ref = ray.put(q)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = df["vec_id"].to_numpy()
        mask = ids != query_vec_id
        sims = vecs[mask] @ qv
        ids = ids[mask]
        top = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[top], "cosine": sims[top]})

    import ray.data as _rd

    parts = (
        _rd.read_parquet(files, columns=["vec_id", "embedding"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
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


def ann_ivf_index(sf_dir: str) -> pd.DataFrame:
    """Driver-gate entry: build (or reuse) the persisted index under
    /tmp, query in EXACT mode (nprobe = all lists ≡ brute force →
    shares its SQL oracle). Approximate-nprobe recall is pytest-gated.

    Cache keyed by a hash of the absolute source path, reused only on
    source-fingerprint EQUALITY (see ``io.cache_dir_for``); the marker
    is written after the build so an interrupted build rebuilds."""
    from .io import (
        cache_dir_for,
        cache_is_fresh,
        source_fingerprint,
        write_cache_marker,
    )

    src = f"{sf_dir}/embeddings.parquet"
    index_dir = cache_dir_for("/tmp/transner_ray_ivf", src)
    marker = os.path.join(index_dir, "source.json")
    fp = source_fingerprint(src)
    if not cache_is_fresh(marker, fp):
        build_ivf_index(sf_dir, index_dir)
        write_cache_marker(marker, fp)
    return ivf_index_topk(index_dir, sf_dir, nprobe=16)


def append_to_ivf_index(new_vecs: rd.Dataset, index_dir: str) -> dict:
    """Accept new embeddings into a persisted IVF index — the ANN
    sibling of ``dedup.append_to_exact_index``: assign each vector to
    the FROZEN centroids (centroid drift is a rebuild decision, made
    offline) and append per-list parquet files under the existing
    ``list_id=K/`` partition directories. O(shard) writes, no index
    rewrite; readers glob the partition dirs so appends are picked up
    immediately. Appended files are cast to the schema of the existing
    list files (embedding element type must match for the pruned read).

    ``new_vecs``: Dataset with ``vec_id`` (int64) + ``embedding``
    (list<float>) columns."""
    import glob as _glob
    import uuid

    import pyarrow.parquet as pq

    cents_tbl = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = np.stack(
        [np.asarray(c, dtype=np.float64) for c in cents_tbl["centroid"].to_pylist()]
    )
    existing = _glob.glob(os.path.join(index_dir, "lists", "list_id=*", "*.parquet"))
    tmpl_schema = pq.read_schema(existing[0]) if existing else None
    cents_ref = ray.put(cents)
    stamp = uuid.uuid4().hex[:12]

    def write_files(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        normed = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        lids = np.argmax(normed @ c.T, axis=1)
        ids = df["vec_id"].to_numpy().astype("int64")
        for lid in np.unique(lids):
            m = lids == lid
            tbl = pa.table(
                {
                    "vec_id": pa.array(ids[m], pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs[m]]),
                }
            )
            if tmpl_schema is not None:
                tbl = tbl.cast(
                    pa.schema([tmpl_schema.field(n) for n in tbl.column_names])
                )
            d = os.path.join(index_dir, "lists", f"list_id={int(lid)}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(
                d, f"append-{stamp}-{uuid.uuid4().hex[:8]}.parquet"
            )
            pq.write_table(tbl, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pd.DataFrame({"n": [len(df)]})

    n = int(
        sum(
            b["n"].sum()
            for b in new_vecs.map_batches(write_files, batch_format="pandas")
            .iter_batches(batch_format="pandas")
        )
    )
    return {"appended": n}


def filtered_topk(
    sf_dir: str, k: int = 10, query_vec_id: int = 0, label: int = 1
) -> pd.DataFrame:
    """Metadata-FILTERED exact vector search: top-k by cosine among
    embeddings whose ``label`` matches — the filtered-ANN shape every
    retrieval stack needs (tenant / language / source filters). The
    predicate is pushed TO THE READ (parquet row-group stats on the
    label column), so non-matching row groups never leave storage —
    'prune at the read' applied to vector search; the rest is the
    brute-force partial-top-k merge (blocks × k short rows to the
    driver)."""
    q = _query_vector(sf_dir, query_vec_id)
    q_ref = ray.put(q)

    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=(pads.field("label") == label),
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        df = df[(df["label"] == label) & (df["vec_id"] != query_vec_id)]
        if not len(df):
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norms = np.maximum(np.linalg.norm(vecs, axis=1), 1e-12)
        sims = (vecs @ qv) / norms
        ids = df["vec_id"].to_numpy()
        top = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[top], "cosine": sims[top]})

    parts = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    parts = parts.reset_index(drop=True)
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(parts) + 1, dtype=np.int64),
            "vec_id": parts["vec_id"].astype("int64"),
            "cosine": parts["cosine"].round(4),
        }
    )


def filtered_topk_sql(k: int = 10, query_vec_id: int = 0, label: int = 1) -> str:
    return f"""
SELECT row_number() OVER (ORDER BY cosine DESC, vec_id) AS rank, vec_id, round(cosine, 4) AS cosine
FROM (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding, q.embedding) AS cosine
  FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) q
  WHERE e.vec_id != {query_vec_id} AND e.label = {label}
)
ORDER BY cosine DESC, vec_id LIMIT {k}
"""
