"""Sequence packing for training data: concatenate documents in
doc_id order and cut the token stream into fixed-budget chunks — the
"concat-and-chunk" step every LLM pre-training pipeline runs between
curation and tokenized-shard writing.

Each document is assigned ``chunk_id = cum_tokens_before // budget``
and ``chunk_offset = cum_tokens_before % budget`` (the position of its
first token inside its chunk; a doc spanning a boundary belongs to the
chunk its first token falls in — downstream shard writers split the
tail). Tokens are whitespace tokens (the ``token_counts`` semantics),
so the assignment is SQL-checkable with one window cumsum.

Scale design — this is a **distributed prefix scan**, the one shape a
plain groupby cannot express:

1. pass 1 (`map_batches`): per-doc token counts + a RANGE bucket
   ``doc_id // range_width`` (contiguous id ranges, so bucket order ==
   id order). ``range_width`` is derived from the corpus row count so
   the driver-side scan state stays ≤ ``MAX_SCAN_BUCKETS`` numbers
   (assumes doc ids are dense-ish, as crawl/corpus ids are; a 10^12-doc
   run would add one more scan level, same pattern).
2. per-bucket token sums are combined per BLOCK (a combiner — the
   driver sees one short row per (block, bucket), never per doc),
   collected, and exclusive-scanned on the driver: O(buckets) driver
   memory and compute.
3. pass 2 (`groupby(bucket).map_groups`): each bucket's rows sort by
   doc_id, a vectorized cumsum adds the broadcast bucket offset, and
   chunk ids fall out — one pandas call per bucket (the partitioned
   hash-aggregate pattern; buckets are contiguous id ranges so no
   cross-bucket dependency remains after the offset broadcast).

The (doc_id, n_tokens) projection is materialized once and shared by
the scan and the assignment pass (16 bytes/row; a resumable 100 TB run
would checkpoint it to parquet instead — the run_partitioned pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

CHUNK_TOKENS = 2048  # default packing budget (tokens per chunk)
MAX_SCAN_BUCKETS = 1 << 17  # driver scan state cap (numbers, not rows)
MIN_RANGE_WIDTH = 4096  # doc ids per scan bucket, floor


def _range_width(n_rows: int | None) -> int:
    if not n_rows or n_rows <= 0:
        return MIN_RANGE_WIDTH
    return int(max(MIN_RANGE_WIDTH, -(-n_rows // MAX_SCAN_BUCKETS)))


def pack_chunks(
    sf_dir: str, chunk_tokens: int = CHUNK_TOKENS, range_width: int | None = None
) -> rd.Dataset:
    """(doc_id, n_tokens, chunk_id, chunk_offset) for every document,
    packing the doc_id-ordered token stream into ``chunk_tokens``-token
    chunks. See module docstring for the scan dataflow.

    ``range_width`` overrides the derived scan-bucket width (tests use
    a tiny width to force the multi-bucket prefix-scan path that a
    small corpus would otherwise never exercise)."""
    from .io import parquet_num_rows, read_parquet_sized

    width = range_width or _range_width(
        parquet_num_rows(f"{sf_dir}/documents.parquet")
    )

    def toks_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
            }
        )
        out["bucket"] = (out["doc_id"] // width).astype("int64")
        return out

    toks = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(toks_batch, batch_format="pandas")
    return pack_token_stream(toks, chunk_tokens)


def pack_token_stream(toks: rd.Dataset, chunk_tokens: int = CHUNK_TOKENS) -> rd.Dataset:
    """The distributed prefix scan over an arbitrary (doc_id,
    n_tokens, bucket) stream — shared by ``pack_chunks`` (whole
    corpus) and ``traindata.prepare_training_data`` (curated
    survivors). ``bucket`` must be a CONTIGUOUS-RANGE key
    (``doc_id // width``) so bucket order equals id order."""
    from .agg import driver_exclusive_scan

    toks = toks.materialize()
    # driver-side exclusive scan over per-bucket token sums (O(buckets))
    off_ref = driver_exclusive_scan(toks, "bucket", "n_tokens")

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        buckets, offs = ray.get(off_ref)
        base = int(offs[np.searchsorted(buckets, int(g["bucket"].iloc[0]))])
        g = g.sort_values("doc_id")
        cum_before = base + g["n_tokens"].cumsum() - g["n_tokens"]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "chunk_id": (cum_before // chunk_tokens).astype("int64"),
                "chunk_offset": (cum_before % chunk_tokens).astype("int64"),
            }
        )

    return toks.groupby("bucket").map_groups(assign, batch_format="pandas").sort("doc_id")


PACK_CHUNKS_SQL = f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_before // {CHUNK_TOKENS} AS BIGINT) AS chunk_id,
       CAST(cum_before % {CHUNK_TOKENS} AS BIGINT) AS chunk_offset
FROM (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM (
    SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tokens
    FROM documents
  )
)
ORDER BY doc_id
"""
