"""Stages L/C/G — entity linking, canonicalization, graph materialize.

* ``link_triples_batch``: stateless map; alias table is tiny (SURVEY.md
  §2.4 J-new) and captured in the task closure — a broadcast semi-join,
  never a shuffle join.
* canonicalization + edge weighting are the two wide (shuffle) steps.
  Both are SALTED-two-phase in the combiner sense: a vectorized
  per-batch PARTIAL aggregate first collapses each block to its
  distinct keys (the Zipf head entity contributes ≤1 row per block
  instead of one row per occurrence), then the small partials go
  through ``groupby().map_groups``. This is the skew defusal
  (SURVEY.md §4.2): shuffle volume is O(distinct keys × blocks), not
  O(rows).
"""

from __future__ import annotations

from collections import Counter

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


def link_triples_batch(batch: pa.Table) -> pa.Table:
    subj_ids = [
        link_entity(s, t, _ALIASES)
        for s, t in zip(batch.column("subj").to_pylist(), batch.column("subj_type").to_pylist())
    ]
    obj_ids = [
        link_entity(o, t, _ALIASES)
        for o, t in zip(batch.column("obj").to_pylist(), batch.column("obj_type").to_pylist())
    ]
    out = batch.append_column("subj_id", pa.array(subj_ids, pa.string()))
    out = out.append_column("obj_id", pa.array(obj_ids, pa.string()))
    return out


# ---------------------------------------------------------------- entities

ENTITY_PARTIALS = pa.schema(
    [
        ("entity_id", pa.string()),
        ("surface", pa.string()),
        ("type", pa.string()),
        ("n", pa.int64()),
    ]
)


def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Partial combiner: linked triples → (entity_id, surface, type, n)
    counts over BOTH endpoints, one row per distinct key per block."""
    counts: Counter = Counter()
    cols = [
        batch.column(c).to_pylist()
        for c in ("subj_id", "subj", "subj_type", "obj_id", "obj", "obj_type")
    ]
    for sid, s, st, oid, o, ot in zip(*cols):
        counts[(sid, s, st)] += 1
        counts[(oid, o, ot or "")] += 1
    keys = list(counts)
    return pa.table(
        {
            "entity_id": pa.array([k[0] for k in keys], pa.string()),
            "surface": pa.array([k[1] for k in keys], pa.string()),
            "type": pa.array([k[2] for k in keys], pa.string()),
            "n": pa.array([counts[k] for k in keys], pa.int64()),
        },
        schema=ENTITY_PARTIALS,
    )


def reduce_entity_group(group) -> pa.Table:
    """Final reduce per entity_id group (pandas in via map_groups):
    canonical surface = max total count (tie → lexicographically last,
    matching the oracle's ``max((count, surface))``), aliases = sorted
    distinct surfaces, support = total occurrences."""
    surf = Counter()
    typ = Counter()
    for s, t, n in zip(group["surface"], group["type"], group["n"]):
        surf[s] += int(n)
        typ[t] += int(n)
    canonical = max(surf.items(), key=lambda kv: (kv[1], kv[0]))[0]
    etype = max(typ.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return pa.table(
        {
            "entity_id": pa.array([group["entity_id"].iloc[0]], pa.string()),
            "canonical": pa.array([canonical], pa.string()),
            "type": pa.array([etype], pa.string()),
            "aliases": pa.array([sorted(surf)], pa.list_(pa.string())),
            "support": pa.array([int(sum(surf.values()))], pa.int64()),
        }
    )


# ------------------------------------------------------------------- edges

MAX_EDGE_SOURCES = 8

EDGE_PARTIALS = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred", pa.string()),
        ("obj_id", pa.string()),
        ("weight", pa.int64()),
        ("sources", pa.list_(pa.string())),
    ]
)


def edge_partials_batch(batch: pa.Table) -> pa.Table:
    """Partial combiner: linked triples → per-block edge weights with a
    capped provenance sample (sources)."""
    weight: Counter = Counter()
    sources: dict[tuple, set] = {}
    for sid, p, oid, url in zip(
        batch.column("subj_id").to_pylist(),
        batch.column("pred").to_pylist(),
        batch.column("obj_id").to_pylist(),
        batch.column("url").to_pylist(),
    ):
        k = (sid, p, oid)
        weight[k] += 1
        sources.setdefault(k, set()).add(url)
    # cap AFTER sorting: the union of per-block sorted-first-K samples,
    # sorted and re-capped, equals the global sorted-first-K (any url in
    # the global first K has at most K-1 smaller urls in its own block),
    # so the merged cap is deterministic and oracle-identical.
    keys = list(weight)
    return pa.table(
        {
            "subj_id": pa.array([k[0] for k in keys], pa.string()),
            "pred": pa.array([k[1] for k in keys], pa.string()),
            "obj_id": pa.array([k[2] for k in keys], pa.string()),
            "weight": pa.array([weight[k] for k in keys], pa.int64()),
            "sources": pa.array(
                [sorted(sources[k])[:MAX_EDGE_SOURCES] for k in keys], pa.list_(pa.string())
            ),
        },
        schema=EDGE_PARTIALS,
    )


def reduce_edge_group(group) -> pa.Table:
    """Final reduce per (subj_id, pred, obj_id): sum weights, merge the
    capped source samples (sorted union, first MAX_EDGE_SOURCES — the
    oracle computes the same deterministic cap)."""
    merged: set = set()
    for lst in group["sources"]:
        merged.update(lst)
    return pa.table(
        {
            "subj_id": pa.array([group["subj_id"].iloc[0]], pa.string()),
            "pred": pa.array([group["pred"].iloc[0]], pa.string()),
            "obj_id": pa.array([group["obj_id"].iloc[0]], pa.string()),
            "weight": pa.array([int(group["weight"].sum())], pa.int64()),
            "sources": pa.array([sorted(merged)[:MAX_EDGE_SOURCES]], pa.list_(pa.string())),
        }
    )
