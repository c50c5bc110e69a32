"""Stages L/C/G — entity linking, canonicalization, graph materialize.

* ``link_triples_batch``: stateless map; alias table is tiny (SURVEY.md
  §2.4 J-new) and captured in the task closure — a broadcast semi-join,
  never a shuffle join.
* canonicalization + edge weighting are the two wide (shuffle) steps.
  Both are SALTED-two-phase in the combiner sense: a vectorized
  per-batch PARTIAL aggregate first collapses each block to its
  distinct keys (the Zipf head entity contributes ≤1 row per block
  instead of one row per occurrence), then the small partials go
  through a PARTITIONED HASH-AGGREGATE: rows carry a
  ``crc32(key) % NUM_AGG_BUCKETS`` bucket column, ``groupby('bucket')``
  shuffles once into ~64 coarse partitions, and each bucket is reduced
  by ONE vectorized pandas call (never one Python call per key — at
  millions of distinct edges that is the difference between a
  shuffle-bound and a Python-bound wide phase). Skew defusal
  (SURVEY.md §4.2): the combiner collapses the Zipf head to ≤1 row per
  block, and hash-bucketing spreads keys uniformly over reducers.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..kg import build_alias_table, link_entity

LINKED_TRIPLES_FIELDS = [
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_type", pa.string()),
    ("obj_type", pa.string()),
    ("confidence", pa.float64()),
    ("url", pa.string()),
    ("sent_idx", pa.int32()),
    ("subj_id", pa.string()),
    ("obj_id", pa.string()),
]
LINKED_TRIPLES = pa.schema(LINKED_TRIPLES_FIELDS)

_ALIASES = build_alias_table()
_LINK_CACHE: dict[tuple[str, str | None], str] = {}


def _link_cached(surface: str, mtype: str | None) -> str:
    """Per-worker memo of surface→entity_id: surfaces are Zipfian, so
    the punctuation-separation normalization runs once per distinct
    surface instead of once per triple endpoint."""
    key = (surface, mtype)
    eid = _LINK_CACHE.get(key)
    if eid is None:
        eid = link_entity(surface, mtype, _ALIASES)
        if len(_LINK_CACHE) < 1_000_000:  # bound worker memory
            _LINK_CACHE[key] = eid
    return eid


def link_triples_batch(batch: pa.Table) -> pa.Table:
    subj_ids = [
        _link_cached(s, t)
        for s, t in zip(batch.column("subj").to_pylist(), batch.column("subj_type").to_pylist())
    ]
    obj_ids = [
        _link_cached(o, t)
        for o, t in zip(batch.column("obj").to_pylist(), batch.column("obj_type").to_pylist())
    ]
    out = batch.append_column("subj_id", pa.array(subj_ids, pa.string()))
    out = out.append_column("obj_id", pa.array(obj_ids, pa.string()))
    return out


# ---------------------------------------------------------------- entities

NUM_AGG_BUCKETS = 64  # floor fan-out; run_partitioned scales it with the
# triple count via ops/agg.scaled_num_buckets (make_entity_partials /
# make_edge_partials below)

ENTITY_PARTIALS = pa.schema(
    [
        ("bucket", pa.int32()),
        ("entity_id", pa.string()),
        ("surface", pa.string()),
        ("type", pa.string()),
        ("n", pa.int64()),
    ]
)


def _bucket(key: str, num_buckets: int = NUM_AGG_BUCKETS) -> int:
    """Deterministic hash bucket for the partitioned hash-aggregate
    (never Python ``hash`` — it is salted per process)."""
    return zlib.crc32(key.encode("utf-8")) % num_buckets


def make_entity_partials(num_buckets: int = NUM_AGG_BUCKETS):
    """Partial combiner factory: linked triples → per-block (entity_id,
    surface, type) counts over BOTH endpoints, one row per distinct key
    per block, bucketed by hash(entity_id) for the partitioned
    hash-aggregate reduce. ``num_buckets`` is the reduce fan-out —
    scaled with the triple count by run_partitioned, floor 64."""

    def entity_partials_batch(batch: pa.Table) -> pa.Table:
        # vectorized combiner: this is the hot path of the wide phase
        # (every triple endpoint flows through it), so the per-block
        # collapse is ONE pandas groupby — never a Python loop over
        # rows. Only the post-groupby UNIQUE keys see Python (crc32
        # bucketing), and those are ≤ distinct-entities-per-block.
        import pandas as pd

        sub = batch.select(["subj_id", "subj", "subj_type"]).rename_columns(
            ["entity_id", "surface", "type"]
        )
        obj = batch.select(["obj_id", "obj", "obj_type"]).rename_columns(
            ["entity_id", "surface", "type"]
        )
        objdf = obj.to_pandas()
        # obj side: None type → "" (objects may be untyped values);
        # subj side keeps None as-is (groupby dropna=False preserves it)
        objdf["type"] = objdf["type"].fillna("")
        df = pd.concat([sub.to_pandas(), objdf], ignore_index=True)
        g = (
            df.groupby(["entity_id", "surface", "type"], sort=False, dropna=False)
            .size()
            .reset_index(name="n")
        )
        bmap = {
            u: _bucket(u, num_buckets) for u in pd.unique(g["entity_id"])
        }
        return pa.table(
            {
                "bucket": pa.array(
                    g["entity_id"].map(bmap).to_numpy(dtype="int32"), pa.int32()
                ),
                "entity_id": pa.array(g["entity_id"], pa.string()),
                "surface": pa.array(g["surface"], pa.string()),
                "type": pa.array(g["type"], pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype="int64"), pa.int64()),
            },
            schema=ENTITY_PARTIALS,
        )

    return entity_partials_batch


entity_partials_batch = make_entity_partials()


def reduce_entity_bucket(df) -> pa.Table:
    """VECTORIZED reduce of one hash bucket of entity partials (one
    Python call per bucket, pandas kernels inside — never one call per
    entity). Canonical surface = max (total count, surface) — matching
    the oracle's ``max((count, surface))`` tie-break."""
    import pandas as pd

    surf = (
        df.groupby(["entity_id", "surface"], as_index=False)["n"].sum()
        .sort_values(["entity_id", "n", "surface"])
    )
    canonical = surf.groupby("entity_id").tail(1).set_index("entity_id")["surface"]
    aliases = (
        surf.sort_values(["entity_id", "surface"])
        .groupby("entity_id")["surface"]
        .agg(list)
    )
    support = surf.groupby("entity_id")["n"].sum()
    typ = (
        df.groupby(["entity_id", "type"], as_index=False)["n"].sum()
        .sort_values(["entity_id", "n", "type"])
    )
    etype = typ.groupby("entity_id").tail(1).set_index("entity_id")["type"]
    out = pd.DataFrame(
        {
            "entity_id": canonical.index,
            "canonical": canonical.values,
            "type": etype.reindex(canonical.index).values,
            "aliases": aliases.reindex(canonical.index).values,
            "support": support.reindex(canonical.index).astype("int64").values,
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


MAX_EDGE_SOURCES = 8

EDGE_PARTIALS = pa.schema(
    [
        ("bucket", pa.int32()),
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("weight", pa.int64()),
        ("source", pa.string()),
    ]
)


def make_edge_partials(num_buckets: int = NUM_AGG_BUCKETS):
    """Partial combiner factory: linked triples → per-block edge
    weights with a capped provenance sample, one row per (edge, sampled
    source). ``num_buckets`` scaled as in make_entity_partials.

    Cap-after-sort determinism: the union of per-block sorted-first-K
    source samples, sorted and re-capped in the reduce, equals the
    global sorted-first-K (any url in the global first K has at most
    K-1 smaller urls in its own block) — oracle-identical."""

    def edge_partials_batch(batch: pa.Table) -> pa.Table:
        # vectorized combiner (the triple-shaped hot path): weight per
        # edge = one groupby.size; the capped source sample = one
        # drop_duplicates + stable sort + per-edge cumcount — no
        # Python loop over rows, crc32 only over unique subj_ids.
        import numpy as np
        import pandas as pd

        df = batch.select(["subj_id", "pred", "obj_id", "url"]).to_pandas()
        keys = ["subj_id", "pred", "obj_id"]
        w = df.groupby(keys, sort=False, dropna=False).size().rename("w")
        dd = df.drop_duplicates(keys + ["url"]).sort_values(
            keys + ["url"], kind="mergesort"
        )
        rank = dd.groupby(keys, sort=False, dropna=False).cumcount()
        keep = (rank < MAX_EDGE_SOURCES).to_numpy()
        dd = dd[keep]
        first = rank.to_numpy()[keep] == 0
        dd = dd.join(w, on=keys)
        # carry the edge weight on the first (url-sorted) source row
        # only, so the reduce can sum without double counting
        weights = np.where(first, dd["w"].to_numpy(), 0).astype("int64")
        bmap = {
            u: _bucket(u, num_buckets) for u in pd.unique(dd["subj_id"])
        }
        return pa.table(
            {
                "bucket": pa.array(
                    dd["subj_id"].map(bmap).to_numpy(dtype="int32"), pa.int32()
                ),
                "subj_id": pa.array(dd["subj_id"], pa.string()),
                "pred": pa.array(dd["pred"], pa.string()),
                "obj_id": pa.array(dd["obj_id"], pa.string()),
                "weight": pa.array(weights, pa.int64()),
                "source": pa.array(dd["url"], pa.string()),
            },
            schema=EDGE_PARTIALS,
        )

    return edge_partials_batch


edge_partials_batch = make_edge_partials()


def reduce_edge_bucket(df) -> pa.Table:
    """VECTORIZED reduce of one hash bucket of edge partials: weight =
    sum, sources = sorted distinct first MAX_EDGE_SOURCES. One Python
    call per bucket; pandas kernels inside."""
    import pandas as pd

    keys = ["subj_id", "pred", "obj_id"]
    w = df.groupby(keys, as_index=False)["weight"].sum()
    src = (
        df[keys + ["source"]]
        .drop_duplicates()
        .sort_values(keys + ["source"])
        .groupby(keys)
        .head(MAX_EDGE_SOURCES)
        .groupby(keys)["source"]
        .agg(list)
        .rename("sources")
        .reset_index()
    )
    out = w.merge(src, on=keys)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


