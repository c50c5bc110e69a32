"""Distributed connected components over a near-dup pair graph.

The dedup suite (ops/dedup.py) emits verified PAIRS (doc_a, doc_b);
a curation pipeline needs CLUSTERS — "these 40 documents are all the
same article" — so it can keep one canonical doc per component. The
reference engine has no graph step at all (its dedup is per-key
last-wins, tools/*: see SURVEY.md §2.5 J3); this operator is part of
the beyond-reference training-data suite.

Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC'14) — the published O(log² n)-round,
constant-memory-per-reducer answer, vs. plain min-label propagation
whose round count is the graph DIAMETER (a 10⁶-doc near-dup chain
would need 10⁶ shuffles; here it needs ~20):

* large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u});
  each edge is processed from its SMALLER endpoint's group, so no edge
  is lost and every emitted edge strictly decreases its larger end.
* small-star(u): orient edges (hi=u, lo=v); connect u and every
  smaller neighbor to m = min(N_lo(u)).
* fixpoint: the edge set is a union of stars centered at each
  component's min node.

Every round is TWO bucketed shuffles (large star, small star) through
the partitioned hash-aggregate pattern — one vectorized pandas call
per bucket, fan-out scaled with the edge count. Each star reduce
``drop_duplicates``s its group input, so duplicate edges re-emitted
by many groups (cliques) are culled one shuffle later instead of
compounding; a standalone distinct pass per round was measured 1.5×
slower end-to-end on this dispatch-bound host for zero extra recall.
Convergence is detected by an order-insensitive (count,
sum-of-hashes mod 2^64) signature over consecutive small-star outputs
(NOT xor — a multiset's repeated elements self-cancel under xor, see
``_signature``):
multiset-equal outputs mean the next round's input equals the last
round's, so the iteration is constant from there on — and the only
fixpoints of the star operators are unions of stars (SoCC'14,
Lemma 1), exact up to 2⁻⁶⁴ hash collisions.

Iterative Ray Data caveat: each round MUST ``materialize()`` — a lazy
Dataset re-executes its whole lineage per downstream use, turning
O(log n) rounds into O(log² n) recomputation.

Partitioning assumption (documented per the operator contract): one
node's full neighbor list must fit in one reduce task. Star
contraction itself keeps degrees shrinking toward star graphs, whose
high-degree centers are exactly the rows the vectorized groupby-min
handles without per-key Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .agg import hash_int_col, scaled_num_buckets
from .dedup import _mix64

# CC floor fan-out: CC inputs are PAIR tables (orders of magnitude
# smaller than the corpus) and every round pays 2 shuffles, so the
# small-input floor stays low; scaled_num_buckets raises it with the
# edge count.
CC_FLOOR_BUCKETS = 16
MAX_ROUNDS = 64  # >> the O(log² n) bound for any terrestrial graph

# Size switch (the repo-wide sub-exact-max pattern, cf.
# dedup.CAND_IDS_EXACT_MAX): a distinct edge list at or under this
# count (~16 MB of int64 pairs) is union-found on the driver in one
# pass instead of paying O(log n) shuffle rounds — near-dup pair
# graphs are orders of magnitude smaller than their corpus, so at
# sandbox scale this is every input; above it the star rounds run.
CC_EXACT_MAX = 1 << 20

_EDGES_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_EMPTY_EDGES = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
)


def _edges_table(a, b) -> pa.Table:
    return pa.table(
        {
            "a": pa.array(np.asarray(a, dtype=np.int64)),
            "b": pa.array(np.asarray(b, dtype=np.int64)),
        },
        schema=_EDGES_SCHEMA,
    )


def _bucketed(ds: rd.Dataset, key: str, num_buckets: int, reduce_fn) -> rd.Dataset:
    """bucketed_group_reduce specialised to int64 edge endpoints (the
    generic helper is pandas-in/pandas-out; edges stay Arrow here)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["_b"] = (hash_int_col(df[key]) % np.uint64(num_buckets)).astype("int32")
        return df

    def reduce(g: pd.DataFrame) -> pa.Table:
        out = reduce_fn(g.drop(columns=["_b"]))
        return out if out is not None else _EMPTY_EDGES

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(reduce, batch_format="pandas")
    )


def _symmetrize(batch: pa.Table) -> pa.Table:
    a = batch.column("a").to_numpy(zero_copy_only=False)
    b = batch.column("b").to_numpy(zero_copy_only=False)
    return _edges_table(np.concatenate([a, b]), np.concatenate([b, a]))


def _large_star_bucket(df: pd.DataFrame) -> pa.Table:
    """Group = all (u → neighbor) rows of the nodes hashed here.
    Emit (v, m) for v > u, m = min(N(u) ∪ {u}) — vectorized. The
    leading drop_duplicates culls edges re-emitted by several groups
    of the PREVIOUS round (duplicates never change a min; they only
    inflate the next shuffle)."""
    df = df.drop_duplicates()
    m_per_u = df.groupby("a")["b"].min()
    m_per_u = np.minimum(m_per_u, m_per_u.index)
    m = df["a"].map(m_per_u).to_numpy()
    u = df["a"].to_numpy()
    v = df["b"].to_numpy()
    keep = v > u
    return _edges_table(v[keep], m[keep])


def _small_star_bucket(df: pd.DataFrame) -> pa.Table:
    """Group = (hi=u → lo=v) rows. Emit (u, m) and (v, m) for
    v ∈ N_lo(u) \\ {m}, m = min(N_lo(u))."""
    df = df.drop_duplicates()
    m_per_u = df.groupby("a")["b"].min()
    m = df["a"].map(m_per_u).to_numpy()
    v = df["b"].to_numpy()
    keep = v != m
    return _edges_table(
        np.concatenate([m_per_u.index.to_numpy(), v[keep]]),
        np.concatenate([m_per_u.to_numpy(), m[keep]]),
    )


def _orient(batch: pa.Table) -> pa.Table:
    """Canonical (hi, lo) orientation, self-loops dropped."""
    a = batch.column("a").to_numpy(zero_copy_only=False)
    b = batch.column("b").to_numpy(zero_copy_only=False)
    keep = a != b
    a, b = a[keep], b[keep]
    return _edges_table(np.maximum(a, b), np.minimum(a, b))


_U64 = 1 << 64


def _signature(edges: rd.Dataset) -> tuple[int, int]:
    """(count, SUM of edge hashes mod 2⁶⁴) of an edge dataset:
    order-insensitive AND multiplicity-sensitive, one tiny row per
    block to the driver. Must be a modular SUM, never an XOR: star
    outputs are MULTISETS (the same (v, m) edge can be re-emitted by
    several groups), and XOR self-cancels even multiplicities — two
    different multisets could collide with no hash collision at all.
    With the sum, equal signatures mean equal multisets up to a
    genuine ~2⁻⁶⁴ collision."""

    def partial(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _mix64(_mix64(a) ^ np.uint64(0x9E3779B97F4A7C15) ^ b)
        # numpy uint64 addition wraps mod 2^64 — exactly the modular sum
        s = int(np.add.reduce(h)) if len(h) else 0
        return pa.table(
            {"n": pa.array([len(a)], pa.int64()), "s": pa.array([s], pa.uint64())}
        )

    n, s = 0, 0
    for t in edges.map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        n += int(pa.compute.sum(t["n"]).as_py() or 0)
        for v in t["s"].to_pylist():
            s = (s + v) % _U64
    return n, s


def _driver_unionfind(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Single-pass union-find (path-halving + union-by-min) over a
    small edge array — the sub-CC_EXACT_MAX fast path."""
    codes, uniq = pd.factorize(np.concatenate([a, b]))
    ca, cb = codes[: len(a)], codes[len(a) :]
    parent = np.arange(len(uniq), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(ca, cb):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min NODE ID so roots stay canonical
            if uniq[rx] <= uniq[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(uniq))], dtype=np.int64)
    order = np.argsort(uniq, kind="stable")
    return pa.table(
        {
            "node": pa.array(uniq[order].astype(np.int64)),
            "component": pa.array(uniq[roots[order]].astype(np.int64)),
        }
    )


def connected_components(
    pairs: rd.Dataset,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    n_pairs: int | None = None,
    max_rounds: int = MAX_ROUNDS,
    num_buckets: int | None = None,
    force_distributed: bool = False,
) -> rd.Dataset:
    """(node, component) for every node appearing in ``pairs``;
    component = the MINIMUM node id of its connected component (the
    deterministic canonical-keeper convention shared with
    exact_dedup's min-doc_id keeper). Results are bucket-count
    invariant (pinned by test) — ``num_buckets`` only sets the reduce
    fan-out. Edge lists ≤ CC_EXACT_MAX take the driver union-find
    fast path unless ``force_distributed`` (tests and the SQL gate
    force the star rounds)."""
    if num_buckets is None:
        num_buckets = scaled_num_buckets(n_pairs, floor=CC_FLOOR_BUCKETS)

    def project(batch: pa.Table) -> pa.Table:
        return _edges_table(
            batch.column(col_a).to_numpy(zero_copy_only=False),
            batch.column(col_b).to_numpy(zero_copy_only=False),
        )

    def dedup_block(batch: pa.Table) -> pa.Table:
        # per-BLOCK dedup of the raw pair input (no shuffle): the
        # cross-block duplicates that survive are culled inside the
        # first star reduce
        df = pd.DataFrame(
            {"a": batch.column("a").to_numpy(), "b": batch.column("b").to_numpy()}
        ).drop_duplicates()
        return _edges_table(df["a"].to_numpy(), df["b"].to_numpy())

    edges = (
        pairs.map_batches(project, batch_format="pyarrow")
        .map_batches(_orient, batch_format="pyarrow")
        .map_batches(dedup_block, batch_format="pyarrow")
        .materialize()
    )
    n_edges = edges.count()  # metadata on the materialized dataset — no scan
    if n_edges == 0:
        # no edges at all (e.g. a pair generator found nothing at this
        # scale): return an empty typed mapping rather than routing
        # schema-less empty blocks through the star rounds
        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())}
            )
        )
    if not force_distributed and n_edges <= CC_EXACT_MAX:
        df = edges.to_pandas()  # bounded: ≤ CC_EXACT_MAX rows by the switch
        return rd.from_arrow(
            _driver_unionfind(df["a"].to_numpy(), df["b"].to_numpy())
        )

    prev: tuple[int, int] | None = None
    for _ in range(max_rounds):
        large = _bucketed(
            edges.map_batches(_symmetrize, batch_format="pyarrow"),
            "a",
            num_buckets,
            _large_star_bucket,
        )
        # large-star output is already (hi, lo)-oriented with no
        # self-loops: every emitted edge is (v, m) with v > u ≥ m — no
        # _orient pass needed between the stars
        edges = _bucketed(
            large,
            "a",
            num_buckets,
            _small_star_bucket,
        ).materialize()
        sig = _signature(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    # fixpoint edge set = stars (leaf → center). mapping: leaf a → b,
    # center b → b; bucketed distinct by node.
    def to_mapping(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return _edges_table(np.concatenate([a, b]), np.concatenate([b, b]))

    def mapping_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("a", as_index=False)["b"].min()
        return pa.table(
            {
                "node": pa.array(g["a"].to_numpy(), pa.int64()),
                "component": pa.array(g["b"].to_numpy(), pa.int64()),
            }
        )

    return _bucketed(
        edges.map_batches(to_mapping, batch_format="pyarrow"),
        "a",
        num_buckets,
        mapping_bucket,
    )


def _parquet_col_max(path: str, col: str) -> int:
    """Column max from parquet row-group FOOTER statistics — no data
    read (the parquet_num_rows pattern). Files written without column
    statistics fall back to a single-column scan (degrade gracefully,
    like parquet_num_rows, instead of AttributeError on a None
    statistics object)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(col)
    maxes = []
    for i in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(i).column(idx).statistics
        if st is None or not st.has_min_max:
            maxes = None
            break
        maxes.append(st.max)
    if maxes:
        return max(maxes)
    import pyarrow.compute as pc

    out = pc.max(f.read(columns=[col]).column(col)).as_py()
    if out is None:
        # zero row groups / all-null column: pc.max yields null, and
        # returning None would surface downstream as a cryptic
        # TypeError (e.g. doc_chain_components' `max_id + 1`)
        raise ValueError(f"{path}: column {col!r} has no rows to take a max over")
    return out


# ------------------------------------------------------ query entries


def neardup_clusters(sf_dir: str, jaccard_threshold: float = 0.5) -> rd.Dataset:
    """MinHash-LSH near-dup pairs → connected components: one
    (node, component) row per document that has at least one verified
    near-duplicate. Rows-only at the driver gate (sketch upstream);
    value-checked by the union-find pytest oracle."""
    from . import dedup

    pairs = dedup.minhash_dedup(sf_dir, jaccard_threshold=jaccard_threshold)
    return connected_components(
        pairs, n_pairs=dedup._docs_rows(sf_dir)
    ).sort("node")


def doc_chain_components(sf_dir: str, replicas: int = 1) -> rd.Dataset:
    """SQL-checked gate for the star-contraction machinery: a
    deterministic PATH graph over doc_id — edges (d, d+1) within each
    decade — whose components are the decades (component =
    d - d % 10). Paths are the adversarial case for star contraction
    (maximum diameter per edge count): the gate forces multiple
    large/small-star rounds before the fixpoint, and the closed form
    keeps the oracle recursion-free.

    ``replicas`` (bench knob, VERDICT r3 #7 — the SQL gate stays at 1):
    tiles the path graph R times across disjoint id ranges
    (node = r·span + d). Diameter — hence the star-round COUNT — is
    unchanged, but every round carries R× the rows, so per-round
    compute dominates this host's fixed per-round dispatch and the
    bench row measures the engine, not Ray's scheduler floor
    (BASELINE.md "CC bench amortization")."""
    from .dedup import _docs_rows, _read_docs

    docs = _read_docs(sf_dir, ["doc_id"])
    max_id = _parquet_col_max(f"{sf_dir}/documents.parquet", "doc_id")
    span = max_id + 1

    def chain_edges(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # last doc of each decade opens no edge, and neither does the
        # corpus's last doc (guards the phantom (max_id, max_id+1)
        # edge when the corpus size is not a multiple of 10). The
        # closed-form oracle additionally assumes contiguous doc_ids —
        # true for the synthetic corpus and asserted by the gate.
        keep = (d % 10 != 9) & (d < max_id)
        d = d[keep]
        if replicas > 1:
            offs = np.arange(replicas, dtype=np.int64) * np.int64(span)
            d = (d[None, :] + offs[:, None]).ravel()
        return pa.table(
            {
                "doc_a": pa.array(d, pa.int64()),
                "doc_b": pa.array(d + 1, pa.int64()),
            }
        )

    pairs = docs.map_batches(chain_edges, batch_format="pyarrow")
    n_docs = _docs_rows(sf_dir)
    # force_distributed: driving the star rounds IS this gate's purpose
    return connected_components(
        pairs,
        n_pairs=(n_docs or 0) * replicas or None,
        force_distributed=True,
    ).sort("node")


DOC_CHAIN_COMPONENTS_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS node,
           CAST(doc_id - (doc_id % 10) AS BIGINT) AS component
    FROM documents
    -- connected_components reports nodes that appear in a pair; a
    -- corpus whose LAST doc opens a fresh decade leaves that doc
    -- edgeless (singleton decade) and absent from the engine output
    WHERE NOT (doc_id % 10 = 0 AND doc_id = (SELECT max(doc_id) FROM documents))
    ORDER BY node
"""
